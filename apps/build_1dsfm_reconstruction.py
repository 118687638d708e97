#!/usr/bin/env python
"""Build a reconstruction from a 1DSfM dataset (Wilson & Snavely).

ref: applications/build_1dsfm_reconstruction.cc — load EGs/tracks/
coords, run the global pipeline, write the reconstruction.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--1dsfm_dataset_directory", dest="dataset",
                   required=True)
    p.add_argument("--output_reconstruction", required=True)
    p.add_argument("--position_estimator", default="lud",
                   choices=["nonlinear", "lud"])
    p.add_argument("-v", "--verbose", action="store_true")
    args = p.parse_args()

    import logging
    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARNING)

    from theiasfm_tpu.io import read_1dsfm, write_reconstruction
    from theiasfm_tpu.sfm.pipeline import (GlobalOptions,
                                           global_reconstruction)

    recon, graph = read_1dsfm(args.dataset)
    print(f"loaded: {recon.num_views()} views, {recon.num_tracks()} "
          f"tracks, {graph.num_edges()} epipolar edges")

    opts = GlobalOptions(position_estimator=args.position_estimator,
                         subsample_tracks_for_ba=recon.num_tracks()
                         > 200_000)
    summary = global_reconstruction(recon, graph, opts)
    print(summary)
    write_reconstruction(recon, args.output_reconstruction)
    print(f"wrote {args.output_reconstruction}")
    return 0 if summary.get("success") else 1


if __name__ == "__main__":
    sys.exit(main())
