#!/usr/bin/env python
"""Estimate two-view geometry between two images.

ref: applications/compute_two_view_geometry.cc — extract features,
match, run 5-pt RANSAC, print the relative pose.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image1", required=True)
    p.add_argument("--image2", required=True)
    p.add_argument("--focal1", type=float, default=0.0,
                   help="focal length px (default 1.2*max_dim)")
    p.add_argument("--focal2", type=float, default=0.0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from theiasfm_tpu.image import SiftOptions, extract_sift, load_gray
    from theiasfm_tpu.matching import match_descriptors
    from theiasfm_tpu.sfm.pipeline import (TwoViewInfoOptions,
                                           estimate_twoview_info)

    g1 = load_gray(args.image1)
    g2 = load_gray(args.image2)
    opts = SiftOptions()
    kp1, d1, v1 = extract_sift(g1, opts)
    kp2, d2, v2 = extract_sift(g2, opts)
    print(f"features: {int(v1.sum())} / {int(v2.sum())}")

    idx2, valid, _ = match_descriptors(
        jnp.asarray(d1), jnp.asarray(d2), mask1=jnp.asarray(v1),
        mask2=jnp.asarray(v2))
    sel = np.nonzero(np.asarray(valid))[0]
    print(f"putative matches: {len(sel)}")
    if len(sel) < 10:
        print("too few matches")
        return 1

    f1 = args.focal1 or 1.2 * max(g1.shape)
    f2 = args.focal2 or 1.2 * max(g2.shape)
    pp1 = (g1.shape[1] / 2, g1.shape[0] / 2)
    pp2 = (g2.shape[1] / 2, g2.shape[0] / 2)
    info, inl = estimate_twoview_info(
        jax.random.PRNGKey(0),
        jnp.asarray(kp1[sel][:, :2]),
        jnp.asarray(kp2[np.asarray(idx2)[sel]][:, :2]),
        f1, f2, TwoViewInfoOptions(), pp1=pp1, pp2=pp2)
    print(f"verified matches: {info.num_verified_matches}")
    print(f"relative rotation (angle-axis): {info.rotation_2}")
    print(f"relative position (unit): {info.position_2}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
