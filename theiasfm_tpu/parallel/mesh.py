"""Multi-chip sharding for the bundle adjuster (and friends).

The reference's only scaling mechanism is a std::thread pool
(ref: src/theia/util/threadpool.h:61-89, SURVEY.md §2.11 — no
distributed backend exists). The TPU-native equivalent distributes the
dominant cost, bundle adjustment (60-85% of runtime, SURVEY.md §6),
across a device mesh:

  * observations (the M-axis) are sharded across devices — residuals,
    jacobian blocks and all per-observation products are embarrassingly
    parallel;
  * cameras/points/intrinsics are replicated; every segment_sum over a
    sharded observation axis becomes a partial sum + psum (XLA inserts
    the collective from the sharding annotations — the scaling-book
    recipe: pick a mesh, annotate, let XLA place collectives over ICI);
  * the PCG loop then runs on replicated small state, so no further
    communication is needed inside an iteration beyond the segment_sum
    reductions.

This is data-parallelism over the *problem* rather than a port of the
reference's thread pool, and it is exactly how the BA workload shards
to N chips with >=80%% efficiency (BASELINE.md target): compute scales
with M/N, communication is O(Nc * 6 + Np * 3) per matvec independent
of M.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sfm.ba import BAOptions, BAProblem, bundle_adjust


def make_mesh(devices=None, axis_name: str = "obs") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_ba_problem(prob: BAProblem, mesh: Mesh,
                     axis_name: str = "obs") -> BAProblem:
    """Pad the observation axis to a multiple of the mesh size and place
    observation arrays sharded / parameter arrays replicated."""
    n_dev = mesh.devices.size
    M = prob.obs_cam.shape[0]
    M_pad = ((M + n_dev - 1) // n_dev) * n_dev
    pad = M_pad - M

    def pad_obs(x, fill=0):
        if pad == 0:
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    obs_sharding = NamedSharding(mesh, P(axis_name))
    rep = NamedSharding(mesh, P())

    def place(x, sharding):
        return jax.device_put(x, sharding)

    return BAProblem(
        extrinsics=place(prob.extrinsics, rep),
        intrinsics=place(prob.intrinsics, rep),
        points=place(prob.points, rep),
        obs_cam=place(pad_obs(prob.obs_cam), obs_sharding),
        obs_group=place(pad_obs(prob.obs_group), obs_sharding),
        obs_pt=place(pad_obs(prob.obs_pt), obs_sharding),
        obs_pix=place(pad_obs(prob.obs_pix), obs_sharding),
        obs_mask=place(pad_obs(prob.obs_mask, fill=False), obs_sharding),
        cam_mask=(place(prob.cam_mask, rep)
                  if prob.cam_mask is not None else None),
        point_mask=(place(prob.point_mask, rep)
                    if prob.point_mask is not None else None),
    )


def sharded_bundle_adjust(prob: BAProblem, opts: BAOptions, mesh: Mesh,
                          axis_name: str = "obs"):
    """Bundle adjust with observations sharded over `mesh`.

    The same bundle_adjust code runs; XLA partitions the per-observation
    work by the input shardings and inserts psum collectives at the
    segment_sum reductions.
    """
    sharded = shard_ba_problem(prob, mesh, axis_name)
    fn = jax.jit(lambda p: bundle_adjust(p, opts))
    out, summary = fn(sharded)
    # un-pad observations back to the original length
    M = prob.obs_cam.shape[0]
    out = out._replace(
        obs_cam=out.obs_cam[:M], obs_group=out.obs_group[:M],
        obs_pt=out.obs_pt[:M], obs_pix=out.obs_pix[:M],
        obs_mask=out.obs_mask[:M])
    return out, summary
