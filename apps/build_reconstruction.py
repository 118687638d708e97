#!/usr/bin/env python
"""Build a 3D reconstruction from images — flagship CLI.

ref: applications/build_reconstruction.cc (the gflags surface,
:46-260, is mirrored here with argparse; same defaults where
meaningful).

Usage:
  python apps/build_reconstruction.py --images 'photos/*.jpg' \
      --output_reconstruction out/model --reconstruction_estimator GLOBAL
"""
from __future__ import annotations

import argparse
import glob
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    # input/output (ref build_reconstruction.cc flags)
    p.add_argument("--images", required=True,
                   help="glob of input images")
    p.add_argument("--output_reconstruction", required=True)
    p.add_argument("--matches_dir", default="",
                   help="features/matches database directory "
                        "(enables resume; ref --matching_working_directory)")
    p.add_argument("--calibration_file", default="")
    # estimator
    p.add_argument("--reconstruction_estimator", default="GLOBAL",
                   choices=["GLOBAL", "INCREMENTAL", "HYBRID"])
    p.add_argument("--position_estimator", default="nonlinear",
                   choices=["nonlinear", "lud"])
    p.add_argument("--min_track_length", type=int, default=2)
    p.add_argument("--max_track_length", type=int, default=50)
    p.add_argument("--min_num_inliers_for_valid_match", type=int,
                   default=30)
    p.add_argument("--max_reprojection_error_pixels", type=float,
                   default=5.0)
    p.add_argument("--min_triangulation_angle_degrees", type=float,
                   default=3.0)
    # matching
    p.add_argument("--matching_strategy", default="brute_force",
                   choices=["brute_force", "cascade_hashing"])
    p.add_argument("--lowes_ratio", type=float, default=0.8)
    # features
    p.add_argument("--feature_density", default="NORMAL",
                   choices=["SPARSE", "NORMAL", "DENSE"])
    p.add_argument("--intrinsics_to_optimize", default="FOCAL_LENGTH",
                   choices=["NONE", "FOCAL_LENGTH", "ALL"])
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("--platform", default="",
                   help="force a jax platform (e.g. cpu) — useful when "
                        "remote-TPU compile latency dominates small jobs")
    args = p.parse_args()

    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARNING,
        format="%(levelname)s %(name)s: %(message)s")
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)


    from theiasfm_tpu.image import SiftOptions
    from theiasfm_tpu.io import read_calibration, write_reconstruction
    from theiasfm_tpu.matching import (DiskFeaturesAndMatchesDatabase,
                                       FeatureMatcherOptions,
                                       InMemoryFeaturesAndMatchesDatabase)
    from theiasfm_tpu.sfm.pipeline import GlobalOptions, IncrementalOptions
    from theiasfm_tpu.sfm.reconstruction_builder import (
        ReconstructionBuilder, ReconstructionBuilderOptions)

    density = {"SPARSE": 512, "NORMAL": 1024, "DENSE": 2048}
    sift = SiftOptions(
        max_features_per_octave=density[args.feature_density])
    intrin = {"NONE": (False,) * 10,
              "FOCAL_LENGTH": (True,) + (False,) * 9,
              "ALL": (True,) * 10}[args.intrinsics_to_optimize]

    options = ReconstructionBuilderOptions(
        reconstruction_estimator_type=args.reconstruction_estimator,
        min_track_length=args.min_track_length,
        max_track_length=args.max_track_length,
        min_num_inlier_matches=args.min_num_inliers_for_valid_match,
        sift=sift,
        matching=FeatureMatcherOptions(
            lowes_ratio=args.lowes_ratio,
            matcher=args.matching_strategy,
            min_num_feature_matches=args.min_num_inliers_for_valid_match),
        global_options=GlobalOptions(
            position_estimator=args.position_estimator,
            max_reprojection_error_pixels=args
            .max_reprojection_error_pixels,
            min_triangulation_angle_degrees=args
            .min_triangulation_angle_degrees,
            intrinsics_optimized=intrin),
        incremental_options=IncrementalOptions(
            max_reprojection_error_pixels=args
            .max_reprojection_error_pixels,
            min_triangulation_angle_degrees=args
            .min_triangulation_angle_degrees,
            intrinsics_optimized=intrin),
    )

    db = (DiskFeaturesAndMatchesDatabase(args.matches_dir)
          if args.matches_dir else InMemoryFeaturesAndMatchesDatabase())
    builder = ReconstructionBuilder(options, db)

    priors = (read_calibration(args.calibration_file)
              if args.calibration_file else {})
    paths = sorted(glob.glob(args.images))
    if not paths:
        print(f"no images match {args.images}", file=sys.stderr)
        return 1
    for path in paths:
        name = os.path.basename(path)
        builder.add_image(path, priors.get(name))

    n = builder.extract_and_match_features()
    print(f"matched {n} new verified pairs "
          f"({db.num_matches()} total in db)")

    models = builder.build_reconstruction()
    print(f"built {len(models)} model(s)")
    os.makedirs(os.path.dirname(args.output_reconstruction) or ".",
                exist_ok=True)
    for i, m in enumerate(models):
        out = f"{args.output_reconstruction}-{i}.npz"
        write_reconstruction(m, out)
        print(f"  model {i}: {len(m.estimated_views())} views, "
              f"{len(m.estimated_tracks())} tracks -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
