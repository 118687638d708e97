#!/usr/bin/env python
"""Write a reconstruction's point cloud (+ cameras) as a PLY file.

ref: applications/write_reconstruction_ply_file.cc. Thin front-end over the shared converter
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
    p.add_argument("--reconstruction", required=True)
    p.add_argument("--ply_file", required=True)
    a = p.parse_args()
    from theiasfm_tpu.io import write_ply
    recon = _load(a.reconstruction)
    write_ply(recon, a.ply_file)
    print(f"wrote {a.ply_file}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
