#!/usr/bin/env python
"""Export a reconstruction to COLMAP cameras/images/points3D text files.

ref: applications/export_colmap_files.cc. Thin front-end over the shared converter
logic (see also apps/convert_reconstruction.py).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _load(path, lists=""):
    from theiasfm_tpu.io import (read_bundler, read_nvm,
                                 read_reconstruction,
                                 read_theia_reconstruction)
    if path.endswith(".npz"):
        return read_reconstruction(path)
    if path.endswith(".nvm"):
        return read_nvm(path)
    if lists:
        return read_bundler(lists, path)
    return read_theia_reconstruction(path)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_reconstruction_file", required=True)
    p.add_argument("--output_folder", required=True)
    a = p.parse_args()
    from theiasfm_tpu.io import write_colmap
    recon = _load(a.input_reconstruction_file)
    os.makedirs(a.output_folder, exist_ok=True)
    write_colmap(recon, a.output_folder)
    print(f"wrote COLMAP files to {a.output_folder}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
