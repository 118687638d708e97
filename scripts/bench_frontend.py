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

    # stage differential: time jitted sub-pipelines (pyramid+detect /
    # +patches / +orientation / full) to locate the SIFT hot stage
    from functools import partial as _partial

    from theiasfm_tpu.image import sift as _s

    padded, shapes = zip(*[_s._pad_and_shapes(
        np.asarray(im, np.float32), opts) for im in views])
    stack = jnp.stack([jnp.asarray(p) for p in padded])
    oshapes = shapes[0]

    def _upto(image, stage):
        S = opts.levels_per_octave
        kk = 2.0 ** (1.0 / S)
        sig_init = float(np.sqrt(max(opts.sigma0 ** 2 - 0.25, 0.01)))
        base = _s._blur(image, sig_init)
        outs = []
        for o, _hw in enumerate(oshapes):
            gauss = [base]
            sig_prev = opts.sigma0
            for s_ in range(1, S + 3):
                sig_total = opts.sigma0 * (kk ** s_)
                sig_delta = float(np.sqrt(max(
                    sig_total ** 2 - sig_prev ** 2, 1e-4)))
                gauss.append(_s._blur(gauss[-1], sig_delta))
                sig_prev = sig_total
            G = jnp.stack(gauss)
            score, y_ref, x_ref, s_ref, sl, iy, ix, valid = \
                _s._octave_keypoints(G, opts)
            if stage == "detect":
                outs.append(score)
            else:
                gx, gy = jax.vmap(_s._grad_xy)(G)
                gx = jnp.pad(gx, ((0, 0), (_s._PR, _s._PR),
                                  (_s._PR, _s._PR)), mode="edge")
                gy = jnp.pad(gy, ((0, 0), (_s._PR, _s._PR),
                                  (_s._PR, _s._PR)), mode="edge")
                pgx, pgy = _s._extract_patches(gx, gy, sl, iy, ix)
                sigma_rel = opts.sigma0 * (kk ** s_ref)
                if stage == "patches":
                    outs.append(pgx[:, 0, 0])
                elif stage == "orient":
                    outs.append(_s._keypoint_orientation(
                        pgx, pgy, sigma_rel))
                else:
                    theta = _s._keypoint_orientation(pgx, pgy,
                                                     sigma_rel)
                    outs.append(_s._descriptors(
                        pgx, pgy, y_ref - iy, x_ref - ix, sigma_rel,
                        theta)[:, 0])
            base = _s._downsample2(G[S])
        return jnp.concatenate(outs)

    stage_ms = {}
    for stage in ("detect", "patches", "orient", "full"):
        f = jax.jit(jax.vmap(_partial(_upto, stage=stage)))
        jax.block_until_ready(f(stack))       # compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(stack))
            ts.append(time.perf_counter() - t0)
        stage_ms[stage] = round(min(ts) / batch * 1000.0, 1)

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
        "sift_stage_ms_per_image": stage_ms,
    }))


if __name__ == "__main__":
    main()
