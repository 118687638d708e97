#!/usr/bin/env python
"""Convert a Bundler bundle.out (+ lists file) to a native reconstruction.

ref: applications/convert_bundle_file.cc. Thin front-end over the shared converter
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
    p.add_argument("--lists_file", required=True)
    p.add_argument("--bundle_file", required=True)
    p.add_argument("--output_reconstruction_file", required=True)
    a = p.parse_args()
    from theiasfm_tpu.io import read_bundler, write_reconstruction
    recon = read_bundler(a.lists_file, a.bundle_file)
    write_reconstruction(recon, a.output_reconstruction_file)
    print(f"{recon.num_views()} views, {recon.num_tracks()} tracks")
    return 0


if __name__ == "__main__":
    sys.exit(main())
