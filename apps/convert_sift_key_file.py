#!/usr/bin/env python
"""Convert Lowe SIFT key files between text and binary formats.

ref: applications/convert_sift_key_file.cc.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_sift_key_file", required=True)
    p.add_argument("--output_sift_key_file", required=True)
    args = p.parse_args()

    from theiasfm_tpu.io import (read_sift_binary, read_sift_text,
                                 write_sift_binary, write_sift_text)

    src = args.input_sift_key_file
    dst = args.output_sift_key_file
    try:
        keypoints, descriptors = read_sift_binary(src)
    except Exception:
        keypoints, descriptors = read_sift_text(src)

    if dst.endswith(".bin"):
        write_sift_binary(dst, keypoints, descriptors)
    else:
        write_sift_text(dst, keypoints, descriptors)
    print(f"converted {len(keypoints)} keypoints: {src} -> {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
