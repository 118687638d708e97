#!/usr/bin/env python
"""Reconstruction statistics: track lengths, reprojection errors,
view/track counts.

ref: applications/compute_reconstruction_statistics.cc.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reconstruction", required=True)
    args = p.parse_args()

    from apps.compare_reconstructions import load_any
    from theiasfm_tpu.sfm.pipeline.filters import _reprojection_errors

    recon = load_any(args.reconstruction)
    est_views = recon.estimated_views()
    est_tracks = recon.estimated_tracks()
    print(f"views: {recon.num_views()} ({len(est_views)} estimated)")
    print(f"tracks: {recon.num_tracks()} ({len(est_tracks)} estimated)")

    lengths = [len(recon.tracks[t].views) for t in est_tracks]
    if lengths:
        print(f"track length: mean {np.mean(lengths):.2f}  "
              f"median {np.median(lengths):.0f}  max {np.max(lengths)}")

    obs, errors = _reprojection_errors(recon)
    if len(errors):
        finite = errors[np.isfinite(errors)]
        print(f"observations: {len(errors)}")
        print(f"reprojection error (px): median {np.median(finite):.3f} "
              f"mean {finite.mean():.3f}  max {finite.max():.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
