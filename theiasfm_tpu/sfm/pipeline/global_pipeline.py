"""Global reconstruction pipeline.

ref: src/theia/sfm/global_reconstruction_estimator.cc:121-295 — the
10-step global SfM pipeline (SURVEY.md §3.2):
  1. filter initial view graph  2. calibrate from priors
  3. global rotation averaging (MST init + robust L1-IRLS)
  4. orientation-based edge filter  5. pairwise translation refinement
  6. 1DSfM relative-translation filter  7. position estimation
  8. structure (batched triangulation)  9. Schur-PCG BA
  10. retriangulation iterations with outlier rejection.
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...math import rotation as rot
from ..ba.bundle_adjustment import BAOptions, bundle_adjust_bucketed
from ..global_pose import (PositionEstimatorOptions, RobustRotationOptions,
                           estimate_positions_lud,
                           estimate_positions_nonlinear,
                           filter_view_pairs_from_orientation,
                           filter_view_pairs_from_relative_translation,
                           orientations_from_mst,
                           robust_rotation_averaging)
from ..reconstruction import Reconstruction
from ..view_graph import ViewGraph
from .estimate_tracks import EstimateTracksOptions, estimate_all_tracks
from .filters import (set_outlier_tracks_to_unestimated,
                      set_underconstrained_as_unestimated)
from ...utils.precision import geometry_precision

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class GlobalOptions:
    """ref: ReconstructionEstimatorOptions global subset."""
    min_num_two_view_inliers: int = 30
    # ref: FilterViewGraphCyclesByRotation before rotation averaging
    filter_cycles_by_rotation: bool = True
    cycle_max_loop_error_degrees: float = 5.0
    rotation_filtering_max_difference_degrees: float = 5.0
    # 'nonlinear' | 'lud' | 'linear_triplet'
    # (ref: GlobalPositionEstimatorType; the reference DEFAULT is
    # LEAST_UNSQUARED_DEVIATION, reconstruction_estimator_options.h:90
    # — the convex LUD has no spurious minima, unlike the chordal
    # nonlinear objective which can fold chain scenes; measured on
    # fountain-11: LUD position error 0.1-0.5% of baseline vs 3-13%
    # for the chordal GN)
    position_estimator: str = "lud"
    # 'robust_l1l2' | 'nonlinear' | 'linear'
    # (ref: GlobalRotationEstimatorType{ROBUST_L1L2, NONLINEAR, LINEAR})
    rotation_estimator: str = "robust_l1l2"
    refine_relative_translations: bool = True
    extract_maximal_rigid_subgraph: bool = False
    filter_relative_translations: bool = True
    num_retriangulation_iterations: int = 1
    max_reprojection_error_pixels: float = 5.0
    min_triangulation_angle_degrees: float = 3.0
    rotation: RobustRotationOptions = RobustRotationOptions()
    position: PositionEstimatorOptions = PositionEstimatorOptions()
    tracks: EstimateTracksOptions = EstimateTracksOptions()
    intrinsics_optimized: tuple = (False,) * 10
    # ref: subsample_tracks_for_bundle_adjustment option
    subsample_tracks_for_ba: bool = False
    track_subset_grid_cell_size: int = 100
    # ref: track_subset_selection_long_track_length_threshold,
    #      min_num_optimized_tracks_per_view
    track_subset_long_track_length_threshold: int = 10
    min_num_optimized_tracks_per_view: int = 100
    ba_loss: str = "softl1"
    ba_loss_scale_pixels: float = 2.0
    # optional f64 host polish after the final BA (off: measured no
    # effect on fountain-11; expensive at 1DSfM scale on CPU)
    final_polish_x64: bool = False


def _graph_arrays(graph: ViewGraph):
    """(edges (E,2) by view id, rel_rot (E,3), rel_pos (E,3), weights)."""
    edges, rel_rot, rel_pos, w = [], [], [], []
    for (v1, v2), info in graph.edges().items():
        edges.append((v1, v2))
        rel_rot.append(np.asarray(info.rotation_2, float))
        p = np.asarray(info.position_2, float)
        n = np.linalg.norm(p)
        rel_pos.append(p / n if n > 1e-12 else p)
        w.append(float(info.num_verified_matches))
    return (np.asarray(edges), np.asarray(rel_rot), np.asarray(rel_pos),
            np.asarray(w))


def _run_ba(recon: Reconstruction, opts: GlobalOptions, polish=False):
    track_subset = None
    if opts.subsample_tracks_for_ba:
        from .select_good_tracks import \
            select_good_tracks_for_bundle_adjustment
        track_subset = select_good_tracks_for_bundle_adjustment(
            recon,
            long_track_length_threshold=opts
            .track_subset_long_track_length_threshold,
            image_grid_cell_size_pixels=opts
            .track_subset_grid_cell_size,
            min_num_optimized_tracks_per_view=opts
            .min_num_optimized_tracks_per_view)
    prob, maps = recon.to_ba_problem(track_subset=track_subset)
    if prob.obs_pix.shape[0] == 0:
        return
    vids = maps[0]
    model_type = recon.views[vids[0]].camera.model_type
    ba_opts = BAOptions(
        model_type=int(model_type), loss=opts.ba_loss,
        loss_scale=opts.ba_loss_scale_pixels,
        max_iterations=100, cg_iterations=80,
        optimize_intrinsics=tuple(opts.intrinsics_optimized))
    out, summary = bundle_adjust_bucketed(prob, ba_opts)
    recon.update_from_ba(out, maps)
    logger.info("BA: cost %.4g -> %.4g (%d iters)",
                float(summary.initial_cost), float(summary.final_cost),
                int(summary.num_iterations))
    if polish and opts.final_polish_x64 and \
            jax.default_backend() != "cpu":
        # f64 host polish (see bundle_adjust_host_f64): recovers the
        # reference's all-double Ceres accuracy on f32-native chips
        from ..ba.bundle_adjustment import (bundle_adjust_host_f64,
                                            pad_ba_problem)
        prob2, maps2 = recon.to_ba_problem(track_subset=track_subset)
        if prob2.obs_pix.shape[0]:
            padded = pad_ba_problem(prob2)
            popts = dataclasses.replace(ba_opts, max_iterations=15,
                                        point_indices_sorted=True)
            out2, _ = bundle_adjust_host_f64(padded, popts)
            out2 = prob2._replace(
                extrinsics=out2.extrinsics[:prob2.extrinsics.shape[0]],
                intrinsics=out2.intrinsics[:prob2.intrinsics.shape[0]],
                points=out2.points[:prob2.points.shape[0]])
            recon.update_from_ba(out2, maps2)


def _refine_relative_translations(recon, vid_idx, orientations, edges,
                                  rel_pos, max_corrs: int = 64):
    """Batched step-5 refinement: common-track correspondences per edge,
    padded to (E, K), one vmapped GN on the epipolar translation
    constraint."""
    import jax

    from ...utils import next_bucket
    from ..ba.two_view import (
        optimize_relative_position_with_known_rotation)

    E = len(edges)
    K = max_corrs
    x1 = np.zeros((E, K, 2))
    x2 = np.zeros((E, K, 2))
    w = np.zeros((E, K))
    R = np.asarray(rot.angle_axis_to_rotation_matrix(
        jnp.asarray(orientations)))
    R1 = np.zeros((E, 3, 3))
    R2 = np.zeros((E, 3, 3))
    any_corr = np.zeros(E, bool)
    for e, (v1, v2) in enumerate(edges):
        v1, v2 = int(v1), int(v2)
        view1, view2 = recon.views[v1], recon.views[v2]
        cam1, cam2 = view1.camera, view2.camera
        common = [t for t in view1.features if t in view2.features]
        if len(common) < 8:
            R1[e] = np.eye(3)
            R2[e] = np.eye(3)
            continue
        if len(common) > K:
            common = common[:K]
        f1 = np.stack([view1.features[t] for t in common])
        f2 = np.stack([view2.features[t] for t in common])
        x1[e, :len(common)] = (f1 - cam1.intrinsics[3:5]) / \
            cam1.intrinsics[0]
        x2[e, :len(common)] = (f2 - cam2.intrinsics[3:5]) / \
            cam2.intrinsics[0]
        w[e, :len(common)] = 1.0
        R1[e] = R[vid_idx[v1]]
        R2[e] = R[vid_idx[v2]]
        any_corr[e] = True

    refined = np.asarray(jax.vmap(
        lambda t0, r1, r2, a, b, ww:
        optimize_relative_position_with_known_rotation(
            t0, r1, r2, a, b, ww))(
        jnp.asarray(rel_pos), jnp.asarray(R1), jnp.asarray(R2),
        jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(w)))
    out = np.where(any_corr[:, None], refined, rel_pos)
    return out


@geometry_precision
def global_reconstruction(recon: Reconstruction, graph: ViewGraph,
                          opts: GlobalOptions = GlobalOptions()) -> Dict:
    """Run the global pipeline. Mutates recon. Returns summary dict with
    per-stage timings (ref ReconstructionEstimatorSummary,
    global_reconstruction_estimator.cc:75-83)."""
    from ...utils import Timer
    timings: Dict[str, float] = {}
    total_timer = Timer()
    stage_timer = Timer()
    # 1. initial filter: min inliers + largest CC
    for (v1, v2), info in list(graph.edges().items()):
        if info.num_verified_matches < opts.min_num_two_view_inliers:
            graph.remove_edge(v1, v2)
    graph.remove_disconnected_views()
    if graph.num_views() < 3:
        return {"success": False, "reason": "view graph too small"}

    # 2b. triplet rotation-cycle consistency filter
    if opts.filter_cycles_by_rotation:
        from ..global_pose.cycle_filter import (
            filter_view_graph_cycles_by_rotation)
        n_cyc = filter_view_graph_cycles_by_rotation(
            graph, opts.cycle_max_loop_error_degrees)
        graph.remove_disconnected_views()
        logger.info("cycle filter removed %d edges", n_cyc)
        if graph.num_views() < 3:
            return {"success": False,
                    "reason": "cycle filter emptied graph"}

    # 3. rotations
    vids = graph.view_ids()
    vid_idx = {v: i for i, v in enumerate(vids)}
    edges, rel_rot, rel_pos, weights = _graph_arrays(graph)
    e_idx = np.asarray([[vid_idx[a], vid_idx[b]] for a, b in edges])
    stage_timer.reset()
    if opts.rotation_estimator == "linear":
        from ..global_pose import linear_rotation_averaging
        orientations = linear_rotation_averaging(len(vids), e_idx,
                                                 rel_rot, weights)
    else:
        init = orientations_from_mst(len(vids), e_idx, rel_rot, weights)
        if opts.rotation_estimator == "nonlinear":
            from ..global_pose import nonlinear_rotation_averaging
            orientations = nonlinear_rotation_averaging(init, e_idx,
                                                        rel_rot)
        else:  # robust_l1l2 (default)
            orientations = robust_rotation_averaging(init, e_idx,
                                                     rel_rot,
                                                     opts.rotation)
    timings["rotation_estimation_time"] = stage_timer.elapsed_seconds()

    # 4. rotation filter + re-extract largest CC
    keep = filter_view_pairs_from_orientation(
        orientations, e_idx, rel_rot,
        opts.rotation_filtering_max_difference_degrees)
    for (v1, v2), k in zip(edges, keep):
        if not k:
            graph.remove_edge(int(v1), int(v2))
    removed = graph.remove_disconnected_views()
    logger.info("rotation filter: dropped %d edges, %d views",
                int((~keep).sum()), len(removed))

    vids = graph.view_ids()
    if len(vids) < 3:
        return {"success": False, "reason": "rotation filter emptied graph"}
    orientations = orientations[[vid_idx[v] for v in vids]]
    vid_idx = {v: i for i, v in enumerate(vids)}
    edges, rel_rot, rel_pos, weights = _graph_arrays(graph)
    e_idx = np.asarray([[vid_idx[a], vid_idx[b]] for a, b in edges])

    # 5. pairwise translation refinement with known rotations
    # (ref OptimizePairwiseTranslations,
    #  global_reconstruction_estimator.cc:372-379)
    if opts.refine_relative_translations and len(edges) > 0:
        rel_pos = _refine_relative_translations(
            recon, vid_idx, orientations, edges, rel_pos)
        for (v1, v2), p in zip(edges, rel_pos):
            graph.edge(int(v1), int(v2)).position_2 = p

    # 6a. optional parallel-rigid subgraph extraction
    # (ref ExtractMaximallyParallelRigidSubgraph,
    #  global_reconstruction_estimator.cc:381-402)
    if opts.extract_maximal_rigid_subgraph and len(edges) > 3:
        from ..global_pose.rigid_subgraph import (
            extract_maximally_parallel_rigid_subgraph)
        orient_map = {v: orientations[vid_idx[v]] for v in vids}
        n_rm = extract_maximally_parallel_rigid_subgraph(orient_map, graph)
        if n_rm:
            logger.info("rigid subgraph removed %d views", n_rm)
            graph.remove_disconnected_views()
            vids2 = graph.view_ids()
            if len(vids2) < 3:
                return {"success": False,
                        "reason": "rigid subgraph emptied graph"}
            orientations = orientations[[vid_idx[v] for v in vids2]]
            vids = vids2
            vid_idx = {v: i for i, v in enumerate(vids)}
            edges, rel_rot, rel_pos, weights = _graph_arrays(graph)
            e_idx = np.asarray([[vid_idx[a], vid_idx[b]]
                                for a, b in edges])

    # 6. 1DSfM translation filter
    if opts.filter_relative_translations and len(edges) > 3:
        keep = filter_view_pairs_from_relative_translation(
            orientations, e_idx, rel_pos)
        if keep.sum() >= 3:
            for (v1, v2), k in zip(edges, keep):
                if not k:
                    graph.remove_edge(int(v1), int(v2))
            graph.remove_disconnected_views()
            vids2 = graph.view_ids()
            orientations = orientations[[vid_idx[v] for v in vids2]]
            vids = vids2
            vid_idx = {v: i for i, v in enumerate(vids)}
            edges, rel_rot, rel_pos, weights = _graph_arrays(graph)
            e_idx = np.asarray([[vid_idx[a], vid_idx[b]]
                                for a, b in edges])

    # 7. positions
    stage_timer.reset()
    pos_covered = np.ones(len(vids), dtype=bool)
    if opts.position_estimator == "linear_triplet":
        from ..global_pose.linear_position import (
            estimate_positions_linear_triplet)
        positions, pos_covered = estimate_positions_linear_triplet(
            recon, vids, orientations, e_idx, rel_pos)
        if not pos_covered.any():
            return {"success": False,
                    "reason": "no valid triplets for linear positions"}
    else:
        est = (estimate_positions_lud if opts.position_estimator == "lud"
               else estimate_positions_nonlinear)
        positions = est(orientations, e_idx, rel_pos,
                        edge_weights=weights / weights.max(),
                        opts=opts.position)
    timings["position_estimation_time"] = stage_timer.elapsed_seconds()

    # write poses into the reconstruction (linear_triplet only covers
    # views inside the triplet graph, ref
    # linear_position_estimator.cc:209-218)
    for v in vids:
        i = vid_idx[v]
        if not pos_covered[i]:
            continue
        view = recon.views[v]
        view.camera.extrinsics = np.concatenate(
            [positions[i], orientations[i]])
        view.is_estimated = True

    # 8-10: structure + BA + retriangulation loop
    stage_timer.reset()
    estimate_all_tracks(recon, opts.tracks)
    timings["triangulation_time"] = stage_timer.elapsed_seconds()
    stage_timer.reset()
    _run_ba(recon, opts,
            polish=(opts.num_retriangulation_iterations == 0))
    n_out = set_outlier_tracks_to_unestimated(
        recon, opts.max_reprojection_error_pixels,
        opts.min_triangulation_angle_degrees)
    for i in range(opts.num_retriangulation_iterations):
        set_underconstrained_as_unestimated(recon)
        estimate_all_tracks(recon, opts.tracks)
        _run_ba(recon, opts,
                polish=(i == opts.num_retriangulation_iterations - 1))
        n_out = set_outlier_tracks_to_unestimated(
            recon, opts.max_reprojection_error_pixels,
            opts.min_triangulation_angle_degrees)
    set_underconstrained_as_unestimated(recon)
    timings["bundle_adjustment_time"] = stage_timer.elapsed_seconds()
    timings["total_time"] = total_timer.elapsed_seconds()
    return {"success": True,
            "num_estimated_views": len(recon.estimated_views()),
            "num_estimated_tracks": len(recon.estimated_tracks()),
            "timings": timings}
