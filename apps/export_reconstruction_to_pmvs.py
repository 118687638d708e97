#!/usr/bin/env python
"""Export a reconstruction to the PMVS/CMVS input layout.

ref: applications/export_reconstruction_to_pmvs.cc — writes
visualize/ (undistorted images), txt/ (P matrices), models/ and
pmvs_options.txt.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reconstruction", required=True)
    p.add_argument("--images_directory", required=True)
    p.add_argument("--pmvs_working_directory", required=True)
    args = p.parse_args()

    from apps.compare_reconstructions import load_any
    from theiasfm_tpu.io import export_pmvs

    recon = load_any(args.reconstruction)
    n = export_pmvs(recon, args.pmvs_working_directory,
                    images_dir=args.images_directory)
    print(f"exported {n} views to {args.pmvs_working_directory}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
