"""One-off probe: matcher pairs/s vs pairs-per-dispatch (XLA and
Pallas paths) at production-ish padding (1024 descriptors, D=128).

The round-5 SoL note says the matcher is dispatch-bound at 28
pairs/dispatch; this measures where the knee is so pair_batch_size
can be set from data.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from theiasfm_tpu.matching.brute_force import match_descriptors_batch
    try:
        from theiasfm_tpu.matching.pallas_matcher import (
            match_descriptors_pallas_batch)
        has_pallas = True
    except Exception:
        has_pallas = False

    rng = np.random.default_rng(0)
    maxn, D = 1024, 128
    out = {}
    for P in (28, 64, 128, 256):
        d1 = rng.standard_normal((P, maxn, D)).astype(np.float32)
        d2 = rng.standard_normal((P, maxn, D)).astype(np.float32)
        d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
        d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
        m = np.ones((P, maxn), bool)
        d1j, d2j = jnp.asarray(d1), jnp.asarray(d2)
        mj = jnp.asarray(m)

        def run_xla():
            idx2, valid, _ = match_descriptors_batch(d1j, d2j, mj, mj)
            jax.block_until_ready(valid)

        run_xla()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_xla()
            ts.append(time.perf_counter() - t0)
        out[f"xla_P{P}"] = {"ms": round(min(ts) * 1e3, 1),
                            "pairs_per_sec": round(P / min(ts), 1)}

        if has_pallas:
            def run_pl():
                idx2, valid, _ = match_descriptors_pallas_batch(
                    d1j, d2j, mj, mj)
                jax.block_until_ready(valid)
            try:
                run_pl()
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    run_pl()
                    ts.append(time.perf_counter() - t0)
                out[f"pallas_P{P}"] = {
                    "ms": round(min(ts) * 1e3, 1),
                    "pairs_per_sec": round(P / min(ts), 1)}
            except Exception as e:  # VMEM etc.
                out[f"pallas_P{P}"] = {"error": str(e)[:120]}
        print(json.dumps({f"P{P}": {k: v for k, v in out.items()
                                    if k.endswith(f"P{P}")}}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
