#!/usr/bin/env python
"""Evaluate pairwise relative-translation optimization on a 1DSfM
dataset against ground truth.

ref: applications/evaluate_relative_translation_optimization.cc — set
the ground-truth global rotations (from gt_bundle.out), run the
known-rotation pairwise translation refinement (global pipeline step 5)
on every view-graph edge, and report the angular error of the relative
translation directions before and after.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--1dsfm_dataset_directory", dest="dataset",
                   required=True)
    p.add_argument("--max_correspondences_per_pair", type=int, default=64)
    args = p.parse_args()

    import jax.numpy as jnp

    from apps.verify_1dsfm_input import _print_histogram
    from theiasfm_tpu.io import read_1dsfm, read_bundler
    from theiasfm_tpu.math import rotation as rot
    from theiasfm_tpu.sfm.pipeline.global_pipeline import (
        _refine_relative_translations)

    recon, graph = read_1dsfm(args.dataset)
    gt_recon = read_bundler(os.path.join(args.dataset, "list.txt"),
                            os.path.join(args.dataset, "gt_bundle.out"))
    gt_by_name = {v.name: v for v in gt_recon.views.values()
                  if v.is_estimated}

    # keep only edges where both endpoints have ground truth
    vids = [v for v in graph.view_ids()
            if recon.views[v].name in gt_by_name]
    vid_idx = {v: i for i, v in enumerate(vids)}
    orientations = np.stack([
        gt_by_name[recon.views[v].name].camera.extrinsics[3:6]
        for v in vids])
    # adopt gt poses on the working reconstruction for correspondences
    for v in vids:
        recon.views[v].camera.extrinsics[:] = \
            gt_by_name[recon.views[v].name].camera.extrinsics
        recon.views[v].is_estimated = True

    edges, rel_pos = [], []
    for (v1, v2), info in graph.edges().items():
        if v1 in vid_idx and v2 in vid_idx:
            edges.append((v1, v2))
            rel_pos.append(np.asarray(info.position_2, float))
    edges = np.asarray(edges, int)
    rel_pos = np.stack(rel_pos)

    def angular_errors(positions):
        errs = []
        for (v1, v2), t in zip(edges, positions):
            g1 = gt_by_name[recon.views[int(v1)].name].camera
            g2 = gt_by_name[recon.views[int(v2)].name].camera
            R1 = np.asarray(rot.angle_axis_to_rotation_matrix(
                jnp.asarray(g1.extrinsics[3:6])))
            t_gt = R1 @ (g2.extrinsics[:3] - g1.extrinsics[:3])
            n = np.linalg.norm(t_gt)
            if n < 1e-12:
                continue
            cos = float(np.dot(t / max(np.linalg.norm(t), 1e-12),
                               t_gt / n))
            errs.append(np.degrees(np.arccos(np.clip(cos, -1, 1))))
        return errs

    before = angular_errors(rel_pos)
    refined = _refine_relative_translations(
        recon, vid_idx, orientations, edges, rel_pos,
        max_corrs=args.max_correspondences_per_pair)
    after = angular_errors(refined)

    print(f"edges evaluated: {len(edges)}")
    _print_histogram("translation angular error BEFORE", before)
    _print_histogram("translation angular error AFTER", after)
    return 0


if __name__ == "__main__":
    sys.exit(main())
