"""On-chip bench for the non-BA global-pipeline stages at Notre-Dame
scale: robust rotation averaging and LUD position estimation.

The reference's baseline table times these separately
(docs/source/performance.rst:94-112 — Notre Dame, 553 views: 4.91 s
rotation averaging, 43.37 s LUD position, on a 2016 CPU). This script
builds a 550-view synthetic graph with the same shape (loop scene,
~10 edges/view, 5% outlier edges, 0.3deg rotation noise — the
test_large_scale generator geometry without the track machinery),
runs both estimators warm, and reports wall seconds + accuracy.

Usage: python scripts/bench_global_stages.py [n_views] [reps]
Prints one JSON line.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_view_graph(n_views, seed=0, outlier_frac=0.05,
                     noise_deg=0.3, edges_per_view=10):
    """Loop-scene graph: edges (E,2), rel rot (E,3) aa, rel dir (E,3),
    weights (E,), gt extrinsics (V,6)."""
    import jax
    import jax.numpy as jnp

    from theiasfm_tpu.math import rotation as rot

    rng = np.random.default_rng(seed)
    extrs = np.zeros((n_views, 6))
    for v in range(n_views):
        s = v / n_views * 2 * np.pi
        c = np.array([30 * np.cos(s), 0.5 * np.sin(3 * s),
                      30 * np.sin(s)])
        z = np.array([np.cos(s), 0.0, np.sin(s)])
        x = np.cross([0, 1, 0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        extrs[v, :3] = c
        extrs[v, 3:] = np.asarray(rot.rotation_matrix_to_angle_axis(
            jnp.asarray(np.stack([x, y, z]))))
    R_all = np.asarray(rot.angle_axis_to_rotation_matrix(
        jnp.asarray(extrs[:, 3:])))

    # build all edges, then apply noise/outliers in BATCHED device
    # calls (a per-edge host loop costs thousands of tunnel round
    # trips on this runner)
    edges = [(v1, (v1 + dv) % n_views)
             for v1 in range(n_views)
             for dv in range(1, edges_per_view + 1)
             if (v1 + dv) % n_views > v1]
    edges = np.asarray(edges)
    E = len(edges)
    R_rel = np.einsum("eij,ekj->eik", R_all[edges[:, 1]],
                      R_all[edges[:, 0]])
    aa = np.asarray(jax.vmap(rot.rotation_matrix_to_angle_axis)(
        jnp.asarray(R_rel)))
    d = np.einsum("eij,ej->ei", R_all[edges[:, 0]],
                  extrs[edges[:, 1], :3] - extrs[edges[:, 0], :3])
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    naa = rng.normal(size=(E, 3))
    naa *= np.radians(noise_deg) / np.linalg.norm(naa, axis=-1,
                                                  keepdims=True)
    aa_noisy = np.asarray(jax.vmap(rot.multiply_rotations)(
        jnp.asarray(naa), jnp.asarray(aa)))
    d_noisy = d + rng.normal(scale=0.01, size=(E, 3))
    d_noisy /= np.linalg.norm(d_noisy, axis=-1, keepdims=True)

    out = rng.uniform(size=E) < outlier_frac
    aa_out = rng.normal(size=(E, 3))
    d_out = rng.normal(size=(E, 3))
    d_out /= np.linalg.norm(d_out, axis=-1, keepdims=True)
    rel_rot = np.where(out[:, None], aa_out, aa_noisy)
    rel_dir = np.where(out[:, None], d_out, d_noisy)
    weights = np.full(E, 100.0)
    return edges, rel_rot, rel_dir, weights, extrs


def main():
    n_views = int(sys.argv[1]) if len(sys.argv) > 1 else 550
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax.numpy as jnp

    from theiasfm_tpu.math import rotation as rot
    from theiasfm_tpu.sfm.global_pose import (
        estimate_positions_lud, orientations_from_mst,
        robust_rotation_averaging)

    edges, rel_rot, rel_dir, weights, gt = build_view_graph(n_views)

    # --- rotation averaging (MST init + L1-IRLS refine) ------------
    def run_rotation():
        init = orientations_from_mst(n_views, edges, rel_rot, weights)
        return robust_rotation_averaging(init, edges, rel_rot)

    orient = run_rotation()   # warmup (compile)
    t_rot = []
    for _ in range(reps):
        t0 = time.perf_counter()
        orient = run_rotation()
        t_rot.append(time.perf_counter() - t0)

    # accuracy: global-gauge-aligned rotation error
    R_est = np.asarray(rot.angle_axis_to_rotation_matrix(
        jnp.asarray(orient)))
    R_gt = np.asarray(rot.angle_axis_to_rotation_matrix(
        jnp.asarray(gt[:, 3:])))
    # align with the first camera's gauge
    G = R_gt[0].T @ R_est[0]
    errs = []
    for v in range(n_views):
        dR = R_est[v] @ G.T @ R_gt[v].T
        c = np.clip((np.trace(dR) - 1) / 2, -1, 1)
        errs.append(np.degrees(np.arccos(c)))
    rot_err_med = float(np.median(errs))

    # --- LUD position estimation -----------------------------------
    def run_position():
        return estimate_positions_lud(orient, edges, rel_dir, weights)

    pos = run_position()      # warmup
    t_pos = []
    for _ in range(reps):
        t0 = time.perf_counter()
        pos = run_position()
        t_pos.append(time.perf_counter() - t0)

    # accuracy: similarity-aligned position error relative to the
    # scene diameter (gauge: scale+rotation+translation free)
    from theiasfm_tpu.sfm.transformation import align_point_clouds
    out = align_point_clouds(jnp.asarray(pos), jnp.asarray(gt[:, :3]))
    s, R, t = (np.asarray(x) for x in out)
    aligned = s * pos @ R.T + t
    perr = np.linalg.norm(aligned - gt[:, :3], axis=1)
    diam = np.linalg.norm(gt[:, :3].max(0) - gt[:, :3].min(0))

    print(json.dumps({
        "ok": True, "n_views": n_views, "n_edges": int(len(edges)),
        "rotation_s": round(min(t_rot), 3),
        "rotation_err_median_deg": round(rot_err_med, 4),
        "position_s": round(min(t_pos), 3),
        "position_err_median_frac_diam": round(
            float(np.median(perr)) / diam, 6),
        "ref_notredame_rotation_s": 4.91,
        "ref_notredame_position_s": 43.37,
    }))


if __name__ == "__main__":
    main()
