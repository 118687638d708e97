#!/usr/bin/env python
"""Undistort images using a reconstruction's camera models.

ref: applications/undistort_images.cc.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reconstruction", required=True)
    p.add_argument("--input_images_directory", required=True)
    p.add_argument("--output_images_directory", required=True)
    args = p.parse_args()

    from PIL import Image

    from apps.compare_reconstructions import load_any
    from theiasfm_tpu.sfm.undistort import undistort_image

    recon = load_any(args.reconstruction)
    os.makedirs(args.output_images_directory, exist_ok=True)
    n = 0
    for view in recon.views.values():
        src = os.path.join(args.input_images_directory, view.name)
        if not os.path.exists(src):
            continue
        img = np.asarray(Image.open(src), np.float32) / 255.0
        out = undistort_image(view.camera, img)
        out8 = np.clip(out * 255.0, 0, 255).astype(np.uint8)
        Image.fromarray(out8).save(
            os.path.join(args.output_images_directory, view.name))
        n += 1
    print(f"undistorted {n} images")
    return 0


if __name__ == "__main__":
    sys.exit(main())
