"""Pin the matched-cost trajectory variance (round-4 verdict weak #2):
row vs transposed Pallas matvec configs on the SAME 550-cam problem,
with per-iteration cost traces (BAOptions.trace_costs), plus a
pure-XLA control. The three matvec implementations are mathematically
identical up to f32 reduction order; the traces show where (and how
much) the LM paths diverge.

Usage: python scripts/trace_probe.py [n_cams n_pts n_iters]
Prints one JSON line with the three traces.
"""
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    n_cams = int(sys.argv[1]) if len(sys.argv) > 1 else 550
    n_pts = int(sys.argv[2]) if len(sys.argv) > 2 else 140000
    n_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 30

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_problem
    from theiasfm_tpu.sfm.ba import BAOptions, bundle_adjust
    from theiasfm_tpu.sfm.ba.bundle_adjustment import (
        add_pallas_matvec_plan, add_point_obs_map, pad_obs_to_multiple)

    prob = _make_problem(n_cams=n_cams, n_pts=n_pts, obs_per_pt=4,
                         dtype=jnp.float32)
    prng = np.random.default_rng(7)
    extr = np.array(prob.extrinsics)
    extr[:, :3] += prng.normal(scale=0.05, size=(extr.shape[0], 3))
    extr[:, 3:] += prng.normal(scale=0.005, size=(extr.shape[0], 3))
    pts = np.asarray(prob.points) + prng.normal(
        scale=0.05, size=prob.points.shape)
    prob = prob._replace(extrinsics=jnp.asarray(extr),
                         points=jnp.asarray(pts))
    prob = add_point_obs_map(prob)
    prob = add_pallas_matvec_plan(pad_obs_to_multiple(prob, 1024),
                                  block=1024)

    base = BAOptions(max_iterations=n_iters, loss="huber",
                     loss_scale=2.0, function_tolerance=0.0,
                     point_indices_sorted=True, matvec_bf16=True,
                     cg_eta=0.1, linear_solver="pcg",
                     trace_costs=True)
    configs = {
        "pt": dataclasses.replace(base, pallas_matvec=True,
                                  pallas_transposed=True),
        "prow": dataclasses.replace(base, pallas_matvec=True,
                                    pallas_transposed=False),
        "xla": base,
    }
    out = {}
    for name, o in configs.items():
        _, s = jax.jit(lambda p, o=o: bundle_adjust(p, o))(prob)
        tr = np.asarray(s.cost_trace)
        out[name] = {
            "final_cost": float(s.final_cost),
            "iters": int(s.num_iterations),
            "n_rejected": int((tr < 0).sum()),
            "trace": [round(float(t), 2) for t in tr],
        }
    print(json.dumps({"ok": True, "n_cams": n_cams, **out}))


if __name__ == "__main__":
    main()
