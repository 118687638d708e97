"""Batched estimation (triangulation) of all unestimated tracks.

ref: src/theia/sfm/estimate_track.{h,cc} — the reference fans per-track
triangulation onto a thread pool (estimate_track.cc:172-191); here ALL
candidate tracks triangulate in one padded device call:
gather per-track observing views (padded to a views-bucket), masked
N-view DLT, then gates identical to the reference's:
sufficient triangulation angle, cheirality, reprojection error
(estimate_track.h:55-76 options).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import count_dispatch, next_bucket, pad_to
from .. import triangulation as tri
from ..reconstruction import Reconstruction
from ...utils.precision import geometry_precision


@dataclasses.dataclass(frozen=True)
class EstimateTracksOptions:
    """ref: estimate_track.h EstimateTrackOptions."""
    max_acceptable_reprojection_error_pixels: float = 5.0
    min_triangulation_angle_degrees: float = 3.0
    bundle_adjust_tracks: bool = True


@partial(jax.jit, static_argnames=("max_views",))
def _triangulate_tracks_device(Ps, origins, pixels, mask, max_views):
    """Ps (T, V, 3, 4); origins (T, V, 3); pixels (T, V, 2); mask (T, V).

    Returns X (T, 4) homogeneous, angles (T,), max reprojection err (T,),
    in_front (T,).
    """
    X = tri.triangulate_nview(Ps, pixels, mask)
    angles = tri.triangulation_angles(origins, X, mask)
    # reprojection errors
    proj = jnp.einsum("tvij,tj->tvi", Ps, X)
    depth = proj[..., 2]
    safe = jnp.where(jnp.abs(depth) < 1e-12, 1e-12, depth)
    pix = proj[..., :2] / safe[..., None]
    err = jnp.linalg.norm(pix - pixels, axis=-1)
    err = jnp.where(mask, err, 0.0)
    max_err = jnp.max(err, axis=-1)
    w = X[..., 3:]
    in_front = jnp.all((depth * jnp.sign(w[..., 0])[..., None] > 0) | ~mask,
                       axis=-1)
    return X, angles, max_err, in_front


@geometry_precision
def estimate_all_tracks(recon: Reconstruction,
                        opts: EstimateTracksOptions,
                        track_ids=None) -> int:
    """Triangulate all (or given) unestimated tracks with >= 2 estimated
    observing views. Mutates `recon`; returns #tracks estimated.
    """
    if track_ids is None:
        track_ids = [t for t, tr in recon.tracks.items()
                     if not tr.is_estimated]
    cand = []
    for t in track_ids:
        tr = recon.tracks[t]
        est_views = [v for v in tr.views if recon.views[v].is_estimated]
        if len(est_views) >= 2:
            cand.append((t, est_views))
    if not cand:
        return 0

    max_views = next_bucket(max(len(v) for _, v in cand), minimum=2)
    T = next_bucket(len(cand), minimum=8)

    Ps = np.zeros((T, max_views, 3, 4))
    origins = np.zeros((T, max_views, 3))
    pixels = np.zeros((T, max_views, 2))
    mask = np.zeros((T, max_views), dtype=bool)

    # projection matrices per view (computed once)
    P_cache = {}
    for i, (t, views) in enumerate(cand):
        for j, v in enumerate(views[:max_views]):
            cammy = recon.views[v].camera
            if v not in P_cache:
                K = np.zeros((3, 3))
                K[0, 0] = cammy.intrinsics[0]
                K[1, 1] = cammy.intrinsics[0] * cammy.intrinsics[1]
                K[0, 1] = cammy.intrinsics[2]
                K[0, 2] = cammy.intrinsics[3]
                K[1, 2] = cammy.intrinsics[4]
                K[2, 2] = 1.0
                P_cache[v] = np.asarray(tri.projection_matrix(
                    jnp.asarray(cammy.extrinsics), jnp.asarray(K)))
            Ps[i, j] = P_cache[v]
            origins[i, j] = cammy.extrinsics[:3]
            pixels[i, j] = recon.views[v].features[t]
            mask[i, j] = True

    count_dispatch("triangulate_tracks")
    X, angles, max_err, in_front = _triangulate_tracks_device(
        jnp.asarray(Ps), jnp.asarray(origins), jnp.asarray(pixels),
        jnp.asarray(mask), max_views)
    X = np.asarray(X)
    angles = np.asarray(angles)
    max_err = np.asarray(max_err)
    in_front = np.asarray(in_front)

    n_est = 0
    for i, (t, views) in enumerate(cand):
        ok = (angles[i] >= opts.min_triangulation_angle_degrees and
              max_err[i] <= opts.max_acceptable_reprojection_error_pixels
              and in_front[i] and abs(X[i, 3]) > 1e-12)
        if ok:
            tr = recon.tracks[t]
            tr.point = X[i] / X[i, 3]
            tr.is_estimated = True
            n_est += 1
    return n_est
