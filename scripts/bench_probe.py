"""One bench attempt in an isolated process (used by bench.py / bisect).

Usage: python scripts/bench_probe.py <n_cams> <n_pts> <solver> <n_iters> [reps]
Prints one JSON line on success.
"""
import json
import sys
import time


def main():
    n_cams = int(sys.argv[1])
    n_pts = int(sys.argv[2])
    solver = sys.argv[3]
    n_iters = int(sys.argv[4])
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3

    import jax

    sys.path.insert(0, ".")
    from __graft_entry__ import _make_problem
    import jax.numpy as jnp
    from theiasfm_tpu.sfm.ba import BAOptions, bundle_adjust
    from theiasfm_tpu.sfm.ba.bundle_adjustment import (
        add_cam_pair_tables, add_point_obs_map)

    prob = _make_problem(n_cams=n_cams, n_pts=n_pts, obs_per_pt=4,
                         dtype=jnp.float32)
    prob = add_point_obs_map(prob)
    if solver == "dense_schur":
        prob = add_cam_pair_tables(prob)

    opts = BAOptions(max_iterations=n_iters,
                     loss="huber", loss_scale=2.0,
                     function_tolerance=0.0,
                     point_indices_sorted=True,
                     linear_solver=solver)

    run = jax.jit(lambda p: bundle_adjust(p, opts))
    t_c = time.perf_counter()
    out, summary = run(prob)
    float(summary.final_cost)
    compile_s = time.perf_counter() - t_c

    t0 = time.perf_counter()
    for _ in range(reps):
        out, summary = run(prob)
        float(summary.final_cost)
    dt = (time.perf_counter() - t0) / reps

    iters = int(summary.num_iterations)
    print(json.dumps({
        "ok": True, "n_cams": n_cams, "n_pts": n_pts, "solver": solver,
        "iters_per_sec": round(iters / dt, 3), "compile_s": round(compile_s, 1),
        "final_cost": float(summary.final_cost),
    }))


if __name__ == "__main__":
    main()
