"""Point-sharded multi-chip bundle adjustment (shard_map).

The observation-sharded path (mesh.py) replicates points, so every
point-block reduction becomes a dense (Np, 3, 3) psum per CG matvec —
fine on ICI for mid-size scenes, but the collective grows with the
scene. This module shards POINTS and their observations together:

  * points are split into contiguous ranges (observations are sorted by
    point, so each device owns a contiguous slice of both);
  * ranges are chosen to balance the observation count per device;
  * inside `shard_map`, all point-block math (Hpp, its inverse, point
    gradients, back-substitution) is device-local — ZERO communication;
  * only the camera/group reductions and cost scalars cross the mesh:
    O(Nc * 36 + Ng * P^2) bytes per matvec, independent of the number
    of points/observations. That is the communication profile that
    scales to DCN (multi-host) for Piccadilly/Trafalgar-class scenes
    (ref performance.rst large-scale table, SURVEY.md §6).

The LM loop itself runs replicated inside shard_map: every device
psums the same cost scalars, so lambda adaptation and accept/reject
decisions are bit-identical across devices.

ref equivalent: none — the reference's Ceres BA is single-process
(SURVEY.md §2.11); this is the TPU-native scaling mechanism.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..sfm.ba import BAOptions, BAProblem, BASummary
from ..sfm.ba.bundle_adjustment import bundle_adjust
from ..utils import next_bucket

__all__ = ["partition_problem_by_point", "point_sharded_bundle_adjust"]


def partition_problem_by_point(prob: BAProblem, n_dev: int,
                               pallas_block: int = 0):
    """Split a (point-sorted, valid-only) BAProblem into n_dev shards.

    Returns (shards dict of stacked arrays with leading D*{M_loc,
    Np_loc}, meta) where meta carries the per-shard point ranges for
    reassembly. Padding observations are masked; padding points carry
    point_mask=False.

    pallas_block > 0 additionally attaches per-shard fused-matvec plan
    arrays (pmv_*, see pallas_matvec.MatvecPlan) with a uniform point
    window across shards, so each device can run the Pallas
    Schur-matvec kernels on its local observation slice under
    shard_map (BAOptions.pallas_matvec + axis_name).
    """
    obs_pt = np.asarray(prob.obs_pt)
    M = obs_pt.shape[0]
    Np = prob.points.shape[0]
    assert np.all(np.diff(obs_pt) >= 0), "observations must be point-sorted"

    counts = np.bincount(obs_pt, minlength=Np)
    cum = np.cumsum(counts)
    targets = (np.arange(1, n_dev) * M) / n_dev
    bounds = np.searchsorted(cum, targets, side="left") + 1
    bounds = np.clip(bounds, 1, Np)
    pt_start = np.concatenate([[0], bounds, [Np]]).astype(np.int64)
    # enforce monotone boundaries (degenerate tiny problems)
    pt_start = np.maximum.accumulate(pt_start)
    obs_start = np.concatenate(
        [[0], cum[pt_start[1:-1] - 1], [M]]).astype(np.int64)

    M_loc = next_bucket(int(np.max(np.diff(obs_start))), 64)
    Np_loc = next_bucket(int(np.max(np.diff(pt_start))), 16)
    if pallas_block:
        M_loc = next_bucket(M_loc, pallas_block)

    D = n_dev
    dtype = np.asarray(prob.points).dtype
    obs_cam = np.zeros((D, M_loc), np.int32)
    obs_group = np.zeros((D, M_loc), np.int32)
    obs_pt_loc = np.zeros((D, M_loc), np.int32)
    obs_pix = np.zeros((D, M_loc, 2), dtype)
    obs_mask = np.zeros((D, M_loc), bool)
    points = np.zeros((D, Np_loc, 3), dtype)
    point_mask = np.zeros((D, Np_loc), bool)

    src_mask = np.asarray(prob.obs_mask)
    src_pmask = (np.asarray(prob.point_mask)
                 if prob.point_mask is not None else np.ones(Np, bool))
    for d in range(D):
        o0, o1 = obs_start[d], obs_start[d + 1]
        p0, p1 = pt_start[d], pt_start[d + 1]
        m = o1 - o0
        n = p1 - p0
        obs_cam[d, :m] = np.asarray(prob.obs_cam)[o0:o1]
        obs_group[d, :m] = np.asarray(prob.obs_group)[o0:o1]
        obs_pt_loc[d, :m] = obs_pt[o0:o1] - p0
        # padding obs target the shard's LAST REAL local point (masked
        # jacobians make the target irrelevant) so the Pallas point
        # window stays tight on point-imbalanced shards; Np_loc - 1
        # would inflate W (and per-tile VMEM) toward Np_loc - n.
        obs_pt_loc[d, m:] = max(int(n) - 1, 0)
        obs_pix[d, :m] = np.asarray(prob.obs_pix)[o0:o1]
        obs_mask[d, :m] = src_mask[o0:o1]
        points[d, :n] = np.asarray(prob.points)[p0:p1]
        point_mask[d, :n] = src_pmask[p0:p1]

    shards = dict(
        obs_cam=obs_cam.reshape(-1),
        obs_group=obs_group.reshape(-1),
        obs_pt=obs_pt_loc.reshape(-1),
        obs_pix=obs_pix.reshape(D * M_loc, 2),
        obs_mask=obs_mask.reshape(-1),
        points=points.reshape(D * Np_loc, 3),
        point_mask=point_mask.reshape(-1),
    )
    if pallas_block:
        from ..sfm.ba.pallas_matvec import MatvecPlan
        Nc = prob.extrinsics.shape[0]
        # two-pass: per-shard natural windows first, then rebuild with
        # the max so every device's kernel shapes agree under shard_map
        plans = [MatvecPlan(obs_cam[d], obs_pt_loc[d], Nc, Np_loc,
                            block=pallas_block) for d in range(D)]
        W = max(p.W for p in plans)
        plans = [MatvecPlan(obs_cam[d], obs_pt_loc[d], Nc, Np_loc,
                            block=pallas_block, force_window=W)
                 for d in range(D)]
        G = plans[0].G
        shards["pmv_cam_tiles"] = np.concatenate(
            [p.cam_tiles for p in plans]).astype(np.int32)
        shards["pmv_lpt_tiles"] = np.concatenate(
            [p.local_pt for p in plans]).astype(np.int32)
        shards["pmv_p0"] = np.concatenate(
            [p.tile_p0 for p in plans]).astype(np.int32)
        shards["pmv_window"] = np.zeros((W,), np.int8)
    meta = dict(pt_start=pt_start, Np_loc=Np_loc, n_dev=D)
    return shards, meta


def point_sharded_bundle_adjust(
        prob: BAProblem, opts: BAOptions, mesh: Mesh,
        axis_name="obs") -> Tuple[BAProblem, BASummary]:
    """Bundle adjust with points+observations sharded over `mesh`.

    prob must be point-sorted (pad_ba_problem(sort_by_point=True) or
    natural track order). Cameras/intrinsics are replicated; the
    returned problem has the same global layout as the input.

    Multi-host: pass a 2D mesh (e.g. axes ('dcn', 'ici') with hosts on
    the slow DCN axis) and axis_name=('dcn', 'ici') — points shard over
    the product and the camera/cost psums become hierarchical (XLA
    reduces over ICI within a host-slice first, then once over DCN;
    per-matvec traffic stays O(Nc*36 + Ng*P^2) independent of scene
    size, which is what makes Piccadilly/Trafalgar-class scenes
    [SURVEY.md §6] viable across hosts).
    """
    n_dev = mesh.devices.size
    use_pallas = (opts.pallas_matvec and
                  prob.intrinsics.shape[0] == 1)
    shards, meta = partition_problem_by_point(
        prob, n_dev, pallas_block=1024 if use_pallas else 0)
    run_opts = dataclasses.replace(opts, axis_name=axis_name,
                                   point_indices_sorted=True)

    cam_mask = (prob.cam_mask if prob.cam_mask is not None
                else jnp.ones(prob.extrinsics.shape[0], bool))

    def local_ba(extr, intr, cmask, obs_cam, obs_group, obs_pt, obs_pix,
                 obs_mask, points, point_mask, *pmv):
        local = BAProblem(
            extrinsics=extr, intrinsics=intr, points=points,
            obs_cam=obs_cam, obs_group=obs_group, obs_pt=obs_pt,
            obs_pix=obs_pix, obs_mask=obs_mask,
            cam_mask=cmask, point_mask=point_mask)
        if pmv:
            # per-shard fused-matvec plan: each device runs the Pallas
            # Schur-matvec on its local observation slice; camera-side
            # outputs psum over the mesh (bundle_adjustment.py)
            local = local._replace(
                pmv_cam_tiles=pmv[0], pmv_lpt_tiles=pmv[1],
                pmv_p0=pmv[2], pmv_window=pmv[3])
        out, summary = bundle_adjust(local, run_opts)
        return out.extrinsics, out.intrinsics, out.points, summary

    rep = P()
    sh = P(axis_name)
    in_specs = [rep, rep, rep, sh, sh, sh, sh, sh, sh, sh]
    args = [prob.extrinsics, prob.intrinsics, cam_mask,
            jnp.asarray(shards["obs_cam"]),
            jnp.asarray(shards["obs_group"]),
            jnp.asarray(shards["obs_pt"]),
            jnp.asarray(shards["obs_pix"]),
            jnp.asarray(shards["obs_mask"]),
            jnp.asarray(shards["points"]),
            jnp.asarray(shards["point_mask"])]
    if use_pallas and "pmv_cam_tiles" in shards:
        in_specs += [sh, sh, sh, rep]
        args += [jnp.asarray(shards["pmv_cam_tiles"]),
                 jnp.asarray(shards["pmv_lpt_tiles"]),
                 jnp.asarray(shards["pmv_p0"]),
                 jnp.asarray(shards["pmv_window"])]
    f = jax.jit(jax.shard_map(
        local_ba, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(rep, rep, sh, rep),
        check_vma=False))
    extr, intr, points_out, summary = f(*args)

    # reassemble the global point array from the per-shard ranges
    pt_start, Np_loc, D = (meta["pt_start"], meta["Np_loc"],
                           meta["n_dev"])
    pts = np.asarray(points_out).reshape(D, Np_loc, 3)
    merged = np.asarray(prob.points).copy()
    for d in range(D):
        p0, p1 = pt_start[d], pt_start[d + 1]
        merged[p0:p1] = pts[d, :p1 - p0]
    out_prob = prob._replace(extrinsics=extr, intrinsics=intr,
                             points=jnp.asarray(merged))
    return out_prob, summary
