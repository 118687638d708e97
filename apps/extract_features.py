#!/usr/bin/env python
"""Extract SIFT features from images into a features database.

ref: applications/extract_features.cc.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_images", required=True)
    p.add_argument("--features_output_directory", required=True)
    p.add_argument("--feature_density", default="NORMAL",
                   choices=["SPARSE", "NORMAL", "DENSE"])
    args = p.parse_args()

    from theiasfm_tpu.image import SiftOptions
    from theiasfm_tpu.matching import DiskFeaturesAndMatchesDatabase
    from theiasfm_tpu.sfm.feature_extractor import (FeatureExtractor,
                                                    FeatureExtractorOptions)

    density = {"SPARSE": 512, "NORMAL": 1024, "DENSE": 2048}
    fe = FeatureExtractor(FeatureExtractorOptions(
        sift=SiftOptions(
            max_features_per_octave=density[args.feature_density])))
    db = DiskFeaturesAndMatchesDatabase(args.features_output_directory)
    paths = sorted(glob.glob(args.input_images))
    n = fe.extract_to_db(paths, db)
    print(f"extracted features for {n} new images "
          f"({len(db.image_names_of_features())} total)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
