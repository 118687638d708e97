#!/usr/bin/env python
"""Create a calibration JSON from EXIF metadata of images.

ref: applications/create_calibration_file_from_exif.cc.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", required=True)
    p.add_argument("--output_calibration_file", required=True)
    p.add_argument("--sensor_database", default="",
                   help="optional 'make model width_mm' database file")
    args = p.parse_args()

    from theiasfm_tpu.io import write_calibration
    from theiasfm_tpu.sfm.exif_reader import ExifReader

    reader = ExifReader(args.sensor_database or None)
    priors = {}
    for path in sorted(glob.glob(args.images)):
        name = os.path.basename(path)
        try:
            prior = reader.extract_exif_metadata(path)
        except Exception as e:
            print(f"skipping {name}: {e}", file=sys.stderr)
            continue
        priors[name] = prior
        f = prior.focal_length
        print(f"{name}: focal={f:.1f}px" if f else f"{name}: no focal")
    write_calibration(priors, args.output_calibration_file)
    print(f"wrote {len(priors)} priors")
    return 0


if __name__ == "__main__":
    sys.exit(main())
