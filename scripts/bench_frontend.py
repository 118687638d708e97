"""Per-stage front-end bench on the real chip: SIFT ms/image and
matcher pairs/s (round-3 verdict weak #3 — e2e wall time never showed
whether kernels or dispatch overhead dominate).

Stages, all warm (first call pays jit compile, then best-of-reps):
  * SIFT extraction: one vmapped batch of B same-shape images
    (the production path, reconstruction_builder.extract_and_match
    batches same-shape images into single device calls);
  * descriptor matching: one batched brute-force (or Pallas) matcher
    call over P pairs of padded descriptor sets.

Usage: python scripts/bench_frontend.py [batch] [reps]
Prints one JSON line.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax
    import jax.numpy as jnp

    from theiasfm_tpu.image import SiftOptions
    from theiasfm_tpu.image.float_image import load_gray
    from theiasfm_tpu.image.sift import extract_sift_batch
    from theiasfm_tpu.image.synth import render_synthetic_views

    tex = load_gray("/root/reference/data/image/img1.png")
    views, _ = render_synthetic_views(tex, batch,
                                      image_size=(640, 480))
    opts = SiftOptions(num_octaves=4, max_features_per_octave=512)

    def extract():
        res = extract_sift_batch(views, opts)
        # block on the last result
        jax.block_until_ready(res[-1][0])
        return res

    results = extract()                      # compile
    t_ext = []
    for _ in range(reps):
        t0 = time.perf_counter()
        results = extract()
        t_ext.append(time.perf_counter() - t0)
    sift_ms_per_image = min(t_ext) / batch * 1000.0
    n_feat = int(np.mean([int(v.sum()) for _, _, v in results]))

    # matching: all pairs of the batch in one padded device call
    from theiasfm_tpu.matching.brute_force import match_descriptors_batch
    descs = [np.asarray(d)[np.asarray(v)] for _, d, v in results]
    maxn = max(len(d) for d in descs)
    maxn = ((maxn + 127) // 128) * 128
    pairs = [(i, j) for i in range(batch) for j in range(i + 1, batch)]
    P_ = len(pairs)
    D = descs[0].shape[1]
    d1 = np.zeros((P_, maxn, D), np.float32)
    d2 = np.zeros((P_, maxn, D), np.float32)
    m1 = np.zeros((P_, maxn), bool)
    m2 = np.zeros((P_, maxn), bool)
    for k, (i, j) in enumerate(pairs):
        d1[k, :len(descs[i])] = descs[i]
        d2[k, :len(descs[j])] = descs[j]
        m1[k, :len(descs[i])] = True
        m2[k, :len(descs[j])] = True
    d1j, d2j = jnp.asarray(d1), jnp.asarray(d2)
    m1j, m2j = jnp.asarray(m1), jnp.asarray(m2)

    def match():
        idx2, valid, _ = match_descriptors_batch(d1j, d2j, m1j, m2j)
        jax.block_until_ready(valid)
        return valid

    match()                                   # compile
    t_m = []
    for _ in range(reps):
        t0 = time.perf_counter()
        match()
        t_m.append(time.perf_counter() - t0)
    pairs_per_sec = P_ / min(t_m)

    print(json.dumps({
        "ok": True, "batch": batch,
        "sift_ms_per_image": round(sift_ms_per_image, 2),
        "mean_features_per_image": n_feat,
        "match_pairs_per_sec": round(pairs_per_sec, 1),
        "n_pairs": P_, "descriptors_padded_to": maxn,
    }))


if __name__ == "__main__":
    main()
