#!/usr/bin/env python
"""Colorize a reconstruction's 3D points from the source images.

ref: applications/colorize_reconstruction.cc — project each track into
the views observing it and average the sampled pixel colors.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_reconstruction", required=True)
    p.add_argument("--image_directory", required=True)
    p.add_argument("--output_reconstruction", required=True)
    args = p.parse_args()

    import numpy as np
    from PIL import Image

    from apps.compare_reconstructions import load_any
    from theiasfm_tpu.io import write_reconstruction
    from theiasfm_tpu.sfm.undistort import colorize_reconstruction

    recon = load_any(args.input_reconstruction)

    def loader(name):
        path = os.path.join(args.image_directory, name)
        if not os.path.exists(path):
            return None
        return np.asarray(Image.open(path).convert("RGB"),
                          np.float32) / 255.0

    colorize_reconstruction(recon, loader)
    write_reconstruction(recon, args.output_reconstruction)
    print(f"colorized {sum(t.is_estimated for t in recon.tracks.values())} "
          f"tracks -> {args.output_reconstruction}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
