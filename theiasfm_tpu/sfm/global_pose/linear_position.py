"""Triplet-based linear position estimation (Jiang, Cui, Tan ICCV'13).

ref: src/theia/sfm/global_pose_estimation/linear_position_estimator.{h,cc}
and compute_triplet_baseline_ratios.{h,cc}.

TPU-native shape: the reference walks triplets on a thread pool,
triangulates common tracks one by one, accumulates a sparse A^T A in a
hash map and calls Spectra's shift-invert eigensolver.  Here every stage
is batched fixed-shape JAX:

- baseline ratios = vmapped midpoint triangulation over a (T, K) padded
  [triplet x common-track] grid, masked median over K;
- each triplet yields nine 3x3 constraint blocks (three "assume pair
  perfect" rows x three views); the Gram matrix A^T A is never formed
  for the large path -- its matvec is gather + einsum + segment_sum over
  the (T, 3) view-index table, which is exactly the BA Schur pattern;
- smallest eigenvector: dense eigh for small systems, else CG-based
  inverse power iteration on the matrix-free operator (replacing the
  Spectra SymEigsShiftSolver, linear_position_estimator.cc:199-206).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...math import rotation as rot
from ...math.graph import extract_triplets


@dataclasses.dataclass(frozen=True)
class LinearPositionOptions:
    """ref: LinearPositionEstimator::Options
    (linear_position_estimator.h:63-73)."""
    max_power_iterations: int = 100
    eigensolver_threshold: float = 1e-8
    cg_iterations: int = 100
    max_tracks_per_triplet: int = 64
    # below this many free coordinates, form the dense Gram matrix + eigh
    dense_threshold: int = 1536
    min_triangulation_angle_degrees: float = 2.0


# ---------------------------------------------------------------------------
# baseline ratios


def _midpoint_depths(p2, d1, d2, min_angle_deg):
    """Depth of the midpoint-triangulated point from each camera.

    Rays: origin 0 along d1, origin p2 along d2 (all unit). Returns
    (depth1, depth2, valid). ref: GetTriangulatedPointDepths
    (compute_triplet_baseline_ratios.cc:55-87).
    """
    b = jnp.sum(d1 * d2, axis=-1)
    denom = jnp.maximum(1.0 - b * b, 1e-12)
    wd1 = jnp.sum(p2 * d1, axis=-1)
    wd2 = jnp.sum(p2 * d2, axis=-1)
    s = (wd1 - wd2 * b) / denom
    t = s * b - wd2
    X = 0.5 * (s[..., None] * d1 + p2 + t[..., None] * d2)
    depth1 = jnp.linalg.norm(X, axis=-1)
    depth2 = jnp.linalg.norm(X - p2, axis=-1)
    cos_max = jnp.cos(jnp.deg2rad(min_angle_deg))
    valid = (jnp.abs(b) < cos_max) & (s > 0) & (t > 0)
    return depth1, depth2, valid


def _masked_median(vals, valid):
    """Median over the valid entries of the last axis (reference uses
    nth_element at n_valid/2 over the compacted list)."""
    big = jnp.asarray(jnp.inf, vals.dtype)
    v = jnp.where(valid, vals, big)
    v = jnp.sort(v, axis=-1)
    n = jnp.sum(valid, axis=-1)
    idx = jnp.clip(n // 2, 0, vals.shape[-1] - 1)
    return jnp.take_along_axis(v, idx[..., None], axis=-1)[..., 0]


@partial(jax.jit, static_argnames=("min_angle_deg",))
def compute_triplet_baseline_ratios(R01, R02, R12, p01, p02, p12,
                                    f0, f1, f2, mask,
                                    min_angle_deg: float = 2.0):
    """Relative baseline lengths (b01=1, b02, b12) for a batch of view
    triplets from the depths of midpoint-triangulated common tracks.

    R??/p?? are relative rotations (T,3,3) / unit relative positions
    (T,3) of the second camera in the first camera's frame; f? are unit
    bearing vectors (T,K,3) in each camera's frame; mask (T,K) marks
    real (non-padded) tracks. Returns (baselines (T,3), valid (T,)).
    ref: ComputeTripletBaselineRatios
    (compute_triplet_baseline_ratios.cc:91-156).
    """
    def pair(p, R, fa, fb):
        db = jnp.einsum("tji,tkj->tki", R, fb)  # R^T fb
        return _midpoint_depths(p[:, None, :], fa, db, min_angle_deg)

    d0_01, d1_01, v01 = pair(p01, R01, f0, f1)
    d0_02, d2_02, v02 = pair(p02, R02, f0, f2)
    d1_12, d2_12, v12 = pair(p12, R12, f1, f2)
    ok = mask & v01 & v02 & v12
    # same physical depth: d0_01 * b01 = d0_02 * b02  =>  b02 = d0_01/d0_02
    r02 = d0_01 / jnp.maximum(d0_02, 1e-12)
    r12 = d1_01 / jnp.maximum(d1_12, 1e-12)
    b02 = _masked_median(r02, ok)
    b12 = _masked_median(r12, ok)
    valid = jnp.sum(ok, axis=-1) > 0
    ones = jnp.ones_like(b02)
    baselines = jnp.stack([ones, jnp.where(valid, b02, ones),
                           jnp.where(valid, b12, ones)], axis=-1)
    return baselines, valid


# ---------------------------------------------------------------------------
# constraint blocks


def _rotation_between(a, b):
    """Minimal rotation R with R a = b (unit vectors), batched; the
    Eigen::Quaterniond::FromTwoVectors of the reference
    (linear_position_estimator.cc:357-360)."""
    c = jnp.cross(a, b)
    d = jnp.sum(a * b, axis=-1)
    K = rot.skew(c)
    s2 = jnp.sum(c * c, axis=-1)
    fac = jnp.where(s2 > 1e-14, (1.0 - d) / jnp.maximum(s2, 1e-30), 0.5)
    R = (jnp.eye(3, dtype=a.dtype) + K
         + fac[..., None, None] * jnp.einsum("...ij,...jk->...ik", K, K))
    # antiparallel fallback: rotation by pi about any axis orthogonal to a
    helper = jnp.where(jnp.abs(a[..., :1]) < 0.9,
                       jnp.broadcast_to(
                           jnp.array([1.0, 0.0, 0.0], a.dtype), a.shape),
                       jnp.broadcast_to(
                           jnp.array([0.0, 1.0, 0.0], a.dtype), a.shape))
    v = jnp.cross(a, helper)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    R_pi = 2.0 * v[..., :, None] * v[..., None, :] - jnp.eye(3, dtype=a.dtype)
    anti = (d < -1.0 + 1e-8)[..., None, None]
    return jnp.where(anti, R_pi, R)


@jax.jit
def _triplet_constraint_blocks(t01, t02, t12, baselines, w):
    """Per-triplet constraint rows of the linear system A.

    t?? (T,3): world-frame unit directions c_j - c_i; baselines (T,3);
    w (T,): per-triplet weight. Returns (T, 3, 3, 3, 3) =
    [constraint, view-slot, 3x3 block].
    ref: AddTripletConstraintToSparseMatrix
    (linear_position_estimator.cc:363-422).
    """
    r012 = _rotation_between(t12, -t01)
    r201 = _rotation_between(t01, t02)
    r120 = _rotation_between(-t02, -t12)
    s012 = baselines[:, 0] / baselines[:, 2]
    s201 = baselines[:, 1] / baselines[:, 0]
    s120 = baselines[:, 2] / baselines[:, 1]
    eye = jnp.eye(3, dtype=t01.dtype)

    def m(s):
        return s[:, None, None]

    r012T = jnp.swapaxes(r012, -1, -2)
    r201T = jnp.swapaxes(r201, -1, -2)
    r120T = jnp.swapaxes(r120, -1, -2)
    # assume t01 perfect, solve for c2
    c0 = jnp.stack([-m(s201) * r201 + r012T / m(s012) + eye,
                    m(s201) * r201 - r012T / m(s012) + eye,
                    jnp.broadcast_to(-2.0 * eye, r012.shape)], axis=1)
    # assume t02 perfect, solve for c1
    c1 = jnp.stack([-r201T / m(s201) + m(s120) * r120 + eye,
                    jnp.broadcast_to(-2.0 * eye, r012.shape),
                    r201T / m(s201) - m(s120) * r120 + eye], axis=1)
    # assume t12 perfect, solve for c0
    c2 = jnp.stack([jnp.broadcast_to(-2.0 * eye, r012.shape),
                    -m(s012) * r012 + r120T / m(s120) + eye,
                    m(s012) * r012 - r120T / m(s120) + eye], axis=1)
    blocks = jnp.stack([c0, c1, c2], axis=1)  # (T, constraint, view, 3, 3)
    return blocks * w[:, None, None, None, None]


def _make_matvec(blocks, tri_idx, num_views):
    """Matrix-free y = P A^T A P x with camera 0 pinned (P zeros its
    coords and the identity is restored there so the operator stays
    positive definite)."""
    flat_idx = tri_idx.reshape(-1)  # (T*3,)

    def matvec(x):
        x0 = x
        x = x.at[0].set(0.0)
        xg = x[tri_idx]                              # (T, 3, 3)
        r = jnp.einsum("tcvij,tvj->tci", blocks, xg)  # rows of A x
        contrib = jnp.einsum("tcvij,tci->tvj", blocks, r)
        y = jax.ops.segment_sum(contrib.reshape(-1, 3), flat_idx,
                                num_segments=num_views)
        y = y.at[0].set(x0[0])
        return y

    return matvec


@partial(jax.jit, static_argnames=("num_views", "iters", "cg_iters", "tol"))
def _smallest_eigvec_inverse_power(blocks, tri_idx, num_views: int,
                                   iters: int, cg_iters: int, tol: float,
                                   seed: int = 0):
    """Inverse power iteration with matrix-free CG solves; replaces the
    reference's Spectra shift-invert LLT (linear_position_estimator.cc:
    199-206)."""
    matvec = _make_matvec(blocks, tri_idx, num_views)
    # tiny Tikhonov shift keeps CG happy when the smallest eig ~ 0
    mu = 1e-8

    def op(x):
        return matvec(x) + mu * x

    def cg_solve(b, x0):
        def body(_, st):
            x, r, p, rs = st
            Ap = op(p.reshape(-1, 3)).reshape(-1)
            alpha = rs / jnp.maximum(jnp.dot(p, Ap), 1e-30)
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = jnp.dot(r, r)
            p = r + (rs_new / jnp.maximum(rs, 1e-30)) * p
            return x, r, p, rs_new

        r0 = b - op(x0.reshape(-1, 3)).reshape(-1)
        st = (x0, r0, r0, jnp.dot(r0, r0))
        x, *_ = jax.lax.fori_loop(0, cg_iters, body, st)
        return x

    key = jax.random.PRNGKey(seed)
    v = jax.random.normal(key, (num_views * 3,), blocks.dtype)
    v = v.at[:3].set(0.0)
    v = v / jnp.linalg.norm(v)

    def power_body(st):
        v, _, k = st
        z = cg_solve(v, v)
        z = z.reshape(-1, 3).at[0].set(0.0).reshape(-1)
        z = z / jnp.maximum(jnp.linalg.norm(z), 1e-30)
        delta = jnp.minimum(jnp.linalg.norm(z - v), jnp.linalg.norm(z + v))
        return z, delta, k + 1

    def power_cond(st):
        _, delta, k = st
        return (k < iters) & (delta > tol)

    v, _, _ = jax.lax.while_loop(power_cond, power_body,
                                 (v, jnp.asarray(1.0, blocks.dtype), 0))
    return v.reshape(-1, 3)


@partial(jax.jit, static_argnames=("num_views",))
def _smallest_eigvec_dense(blocks, tri_idx, num_views: int):
    """Dense path: materialize the Gram matrix by pushing the identity
    through the matvec, then eigh (small systems)."""
    matvec = _make_matvec(blocks, tri_idx, num_views)
    eye = jnp.eye(num_views * 3, dtype=blocks.dtype)
    M = jax.vmap(lambda col: matvec(col.reshape(-1, 3)).reshape(-1))(eye)
    Mf = M[3:, 3:]
    _, vecs = jnp.linalg.eigh(0.5 * (Mf + Mf.T))
    sol = vecs[:, 0]
    return jnp.concatenate(
        [jnp.zeros((1, 3), blocks.dtype), sol.reshape(-1, 3)], axis=0)


@jax.jit
def _fix_sign(positions, edge_i, edge_j, t_world):
    """Flip the global sign if the majority of estimated baselines point
    against the measured relative translations.
    ref: FlipSignOfPositionsIfNecessary
    (linear_position_estimator.cc:139-153,424-448)."""
    d = positions[edge_j] - positions[edge_i]
    agree = jnp.sum(jnp.sign(jnp.sum(d * t_world, axis=-1)))
    return jnp.where(agree < 0, -positions, positions)


# ---------------------------------------------------------------------------
# host driver


def _normalized_rays_for_view(view, track_ids: Sequence[int]):
    """Unit bearing vectors in the camera frame for the given tracks."""
    from ...camera import models as cam_models
    px = np.stack([view.features[t] for t in track_ids])
    xy = np.asarray(jax.vmap(
        lambda p: cam_models.pixel_to_normalized_ray(
            view.camera.model_type, jnp.asarray(view.camera.intrinsics), p)
    )(jnp.asarray(px, jnp.float64)))
    f = np.concatenate([xy, np.ones_like(xy[:, :1])], axis=1)
    return f / np.linalg.norm(f, axis=1, keepdims=True)


def estimate_positions_linear_triplet(
        recon, vids: List[int], orientations: np.ndarray,
        edges: np.ndarray, rel_positions: np.ndarray,
        opts: LinearPositionOptions = LinearPositionOptions(),
        rel_rotations: np.ndarray = None):
    """Estimate camera positions from view triplets (LINEAR_TRIPLET).

    vids: view ids aligned with `orientations` rows; edges (E,2) indexes
    into vids; rel_positions (E,3) = TwoViewInfo.position_2. Returns
    (positions (V,3), covered_mask (V,)) -- views outside the triplet
    graph get no position (reference only fills views in the linear
    system, linear_position_estimator.cc:209-218).
    """
    V = len(vids)
    positions = np.zeros((V, 3))
    covered = np.zeros(V, dtype=bool)
    edge_map: Dict[Tuple[int, int], int] = {}
    for e, (i, j) in enumerate(np.asarray(edges)):
        edge_map[(int(i), int(j))] = e
        edge_map[(int(j), int(i))] = e
    triplets = extract_triplets([tuple(e) for e in np.asarray(edges)])
    if not triplets:
        return positions, covered

    # world-frame direction c_j - c_i for every edge
    R_i = np.asarray(rot.angle_axis_to_rotation_matrix(
        jnp.asarray(orientations)))[np.asarray(edges)[:, 0]]
    t_world = np.einsum("eji,ej->ei", R_i, np.asarray(rel_positions))
    t_world /= np.maximum(
        np.linalg.norm(t_world, axis=-1, keepdims=True), 1e-12)

    K = opts.max_tracks_per_triplet
    ray_cache: Dict[int, Dict[int, np.ndarray]] = {}

    def rays(vidx, tids):
        if vidx not in ray_cache:
            ray_cache[vidx] = {}
        cache = ray_cache[vidx]
        missing = [t for t in tids if t not in cache]
        if missing:
            f = _normalized_rays_for_view(recon.views[vids[vidx]], missing)
            for t, fv in zip(missing, f):
                cache[t] = fv
        return np.stack([cache[t] for t in tids])

    T = len(triplets)
    tri_idx = np.asarray(triplets, dtype=np.int64)
    f0 = np.zeros((T, K, 3))
    f1 = np.zeros((T, K, 3))
    f2 = np.zeros((T, K, 3))
    f0[..., 2] = f1[..., 2] = f2[..., 2] = 1.0
    mask = np.zeros((T, K), dtype=bool)
    e01 = np.array([edge_map[(a, b)] for a, b, _ in triplets])
    e02 = np.array([edge_map[(a, c)] for a, _, c in triplets])
    e12 = np.array([edge_map[(b, c)] for _, b, c in triplets])
    for ti, (a, b, c) in enumerate(triplets):
        va, vb, vc = (recon.views[vids[a]], recon.views[vids[b]],
                      recon.views[vids[c]])
        common = sorted(set(va.features) & set(vb.features)
                        & set(vc.features))
        if len(common) > K:
            sel = np.linspace(0, len(common) - 1, K).astype(int)
            common = [common[s] for s in sel]
        if not common:
            continue
        n = len(common)
        f0[ti, :n] = rays(a, common)
        f1[ti, :n] = rays(b, common)
        f2[ti, :n] = rays(c, common)
        mask[ti, :n] = True

    def rel_R(e, i_first):
        # relative rotation of edge e oriented so `i_first` is the
        # first camera: R_rel = R_second R_first^T
        ei, ej = int(edges[e][0]), int(edges[e][1])
        Ri = np.asarray(rot.angle_axis_to_rotation_matrix(
            jnp.asarray(orientations[ei])))
        Rj = np.asarray(rot.angle_axis_to_rotation_matrix(
            jnp.asarray(orientations[ej])))
        return (Rj @ Ri.T) if ei == i_first else (Ri @ Rj.T)

    def rel_p(e, i_first, other):
        # unit position of `other` in `i_first`'s camera frame
        Rf = np.asarray(rot.angle_axis_to_rotation_matrix(
            jnp.asarray(orientations[i_first])))
        d = t_world[e] if int(edges[e][0]) == i_first else -t_world[e]
        return Rf @ d

    R01 = np.stack([rel_R(e, a) for e, (a, _, _) in zip(e01, triplets)])
    R02 = np.stack([rel_R(e, a) for e, (a, _, _) in zip(e02, triplets)])
    R12 = np.stack([rel_R(e, b) for e, (_, b, _) in zip(e12, triplets)])
    p01 = np.stack([rel_p(e, a, b) for e, (a, b, _) in zip(e01, triplets)])
    p02 = np.stack([rel_p(e, a, c) for e, (a, _, c) in zip(e02, triplets)])
    p12 = np.stack([rel_p(e, b, c) for e, (_, b, c) in zip(e12, triplets)])

    baselines, valid = compute_triplet_baseline_ratios(
        jnp.asarray(R01), jnp.asarray(R02), jnp.asarray(R12),
        jnp.asarray(p01), jnp.asarray(p02), jnp.asarray(p12),
        jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(f2),
        jnp.asarray(mask), min_angle_deg=opts.min_triangulation_angle_degrees)
    baselines = np.asarray(baselines)
    valid = np.asarray(valid)
    if not valid.any():
        return positions, covered
    tri_idx = tri_idx[valid]
    baselines = baselines[valid]
    t01 = t_world[e01[valid]]
    t02 = t_world[e02[valid]]
    t12 = t_world[e12[valid]]

    # compact to the views that participate in >= 1 triplet, view 0 of
    # the compact numbering is pinned at the origin
    used = np.unique(tri_idx.reshape(-1))
    remap = -np.ones(V, dtype=np.int64)
    remap[used] = np.arange(len(used))
    tri_c = remap[tri_idx]
    counts = np.bincount(tri_c.reshape(-1), minlength=len(used))
    w = 1.0 / np.sqrt(np.minimum.reduce(
        [counts[tri_c[:, 0]], counts[tri_c[:, 1]], counts[tri_c[:, 2]]]))

    blocks = _triplet_constraint_blocks(
        jnp.asarray(t01), jnp.asarray(t02), jnp.asarray(t12),
        jnp.asarray(baselines), jnp.asarray(w))
    nu = len(used)
    if 3 * nu <= opts.dense_threshold:
        sol = _smallest_eigvec_dense(blocks, jnp.asarray(tri_c), nu)
    else:
        sol = _smallest_eigvec_inverse_power(
            blocks, jnp.asarray(tri_c), nu,
            iters=opts.max_power_iterations, cg_iters=opts.cg_iterations,
            tol=opts.eigensolver_threshold)

    # sign fix against the measured directions on covered edges
    cov_e = np.array([e for e, (i, j) in enumerate(np.asarray(edges))
                      if remap[int(i)] >= 0 and remap[int(j)] >= 0])
    sol = _fix_sign(sol,
                    jnp.asarray(remap[np.asarray(edges)[cov_e, 0]]),
                    jnp.asarray(remap[np.asarray(edges)[cov_e, 1]]),
                    jnp.asarray(t_world[cov_e]))
    sol = np.asarray(sol)
    positions[used] = sol
    covered[used] = True
    # unit mean baseline (gauge freedom; keeps downstream thresholds sane)
    if len(cov_e):
        d = positions[np.asarray(edges)[cov_e, 1]] \
            - positions[np.asarray(edges)[cov_e, 0]]
        scale = np.mean(np.linalg.norm(d, axis=-1))
        if scale > 1e-12:
            positions[used] /= scale
    return positions, covered
