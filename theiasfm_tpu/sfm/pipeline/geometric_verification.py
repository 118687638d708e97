"""Full two-view match geometric verification.

ref: src/theia/sfm/two_view_match_geometric_verification.{h,cc}:53-120:
  1. EstimateTwoViewInfo (5-pt RANSAC)           [twoview.py]
  2. optional guided epipolar matching to grow the inlier set
  3. triangulate inliers, reject points with bad triangulation
  4. two-view bundle adjustment
  5. final reprojection-error filter.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...math import rotation as rot
from ..ba.two_view import bundle_adjust_two_views_angular
from ..pose.twoview_utils import (fundamental_from_essential,
                                  essential_from_rt)
from ..view_graph import TwoViewInfo
from .twoview import TwoViewInfoOptions, estimate_twoview_info


@dataclasses.dataclass(frozen=True)
class GeometricVerificationOptions:
    """ref: two_view_match_geometric_verification.h Options."""
    estimate_twoview_info: TwoViewInfoOptions = TwoViewInfoOptions()
    guided_matching: bool = False
    guided_matching_max_distance_pixels: float = 4.0
    min_num_inlier_matches: int = 30
    bundle_adjustment: bool = True
    triangulation_max_reprojection_error_pixels: float = 15.0
    min_triangulation_angle_degrees: float = 2.0
    final_max_reprojection_error_pixels: float = 4.0


def count_homography_inliers(key, pix1, pix2,
                             max_sampson_error_pixels: float,
                             image_size1=None, image_size2=None,
                             num_hypotheses: int = 256) -> int:
    """4-pt homography RANSAC over putative matches; returns the inlier
    count used to flag rotation-only / planar-degenerate pairs.

    ref: two_view_match_geometric_verification.cc:328-363
    (CountHomographyInliers) with the resolution-scaled threshold of
    reconstruction_estimator_utils.cc:95-106 (max_dim / 1024); the
    incremental estimator seeds from the pair with FEWEST homography
    inliers (incremental_reconstruction_estimator.cc:390-411).
    """
    from ..estimators import estimate_homography

    def _scale(size):
        if not size or (not size[0] and not size[1]):
            return 1.0
        return max(size[0], size[1]) / 1024.0

    thresh = (max_sampson_error_pixels * _scale(image_size1) *
              max_sampson_error_pixels * _scale(image_size2))
    from ...solvers import RansacOptions
    ropts = RansacOptions(error_thresh=float(thresh),
                          num_hypotheses=num_hypotheses)
    out = estimate_homography(key, jnp.asarray(pix1),
                              jnp.asarray(pix2), ropts)
    return int(out["num_inliers"])


import dataclasses as _dc
import functools


@functools.lru_cache(maxsize=None)
def _jitted_verify_batch(num_hypotheses: int, bundle_adjustment: bool,
                         guided: bool, lowes_ratio: float = 0.9):
    """The WHOLE per-pair verification pipeline (5-pt RANSAC +
    homography count + optional guided epipolar matching + 2-view BA +
    triangulation filter) vmapped over a padded batch of pairs — ONE
    device dispatch where the host loop paid ~7 per pair (the round-3
    e2e wall time was dispatch-bound).

    With guided=True the per-pair call also takes the FULL padded
    feature arrays (kp (N, 2) pixels, desc (N, D), fmask (N,)); the
    grown match set rides a static (maxm + N) combined buffer through
    BA and the triangulation gates (ref
    two_view_match_geometric_verification.cc guided step)."""
    from ...solvers import RansacOptions, ransac
    from ..ba.two_view import bundle_adjust_two_views_angular
    from ..estimators.twoview_estimators import _singleton_spec
    from .. import triangulation as tri
    from ...matching.guided_matcher import guided_epipolar_matching

    spec = _singleton_spec("relative_pose")
    hspec = _singleton_spec("homography")
    ropts = RansacOptions(error_thresh=1.0,
                          num_hypotheses=num_hypotheses)

    def one(k, a, b, pa, pb, m, th, hth, fo1, fo2, pp1, pp2,
            final_px, band_px, kp1=None, kp2=None, de1=None, de2=None,
            fm1=None, fm2=None):
        k1, k2 = jax.random.split(k)
        sspec = _dc.replace(
            spec, residuals=lambda E, d: spec.residuals(E, d) / th)
        E, summary = ransac(k1, sspec, {"x1": a, "x2": b}, ropts,
                            data_mask=m)
        from ..pose.twoview_utils import relative_pose_from_essential
        R, t, _ = relative_pose_from_essential(
            E, a, b, mask=summary.inliers)
        # homography inliers over the putative matches (pixel
        # space, resolution-scaled threshold — ref
        # CountHomographyInliers)
        hs = _dc.replace(
            hspec,
            residuals=lambda H, d: hspec.residuals(H, d) / hth)
        _, hsum = ransac(k2, hs, {"x1": pa, "x2": pb}, ropts,
                         data_mask=m)
        w = (summary.inliers & m).astype(a.dtype)
        aa = rot.rotation_matrix_to_angle_axis(R)

        if guided:
            # grow the match set along epipolar lines of the RANSAC
            # pose over ALL features (pre-BA pose, like the
            # single-pair path / ref guided_epipolar_matcher.cc)
            F = fundamental_from_essential(E, fo1, fo2, pp1, pp2)
            nomatch = jnp.zeros(kp1.shape[0], bool)
            gidx2, gvalid = guided_epipolar_matching(
                F, kp1, kp2, de1, de2, fm1, fm2, nomatch, nomatch,
                band_pixels=band_px, lowes_ratio=lowes_ratio)
            g1 = (kp1 - pp1) / fo1
            g2 = (kp2[gidx2] - pp2) / fo2
            a_all = jnp.concatenate([a, g1], 0)
            b_all = jnp.concatenate([b, g2], 0)
            w_all = jnp.concatenate([w, gvalid.astype(a.dtype)], 0)
        else:
            gidx2 = jnp.zeros((0,), jnp.int32)
            gvalid = jnp.zeros((0,), bool)
            a_all, b_all, w_all = a, b, w

        # 2-view BA on the (grown) inlier set — guarded like the
        # single-pair path: skip below 8 inliers (an ill-conditioned
        # refinement from fewer can still pass the final gate)
        if bundle_adjustment:
            aa_ba, t_ba = bundle_adjust_two_views_angular(
                aa, t, a_all, b_all, w_all)
            enough = jnp.sum(w_all) >= 8
            aa2 = jnp.where(enough, aa_ba, aa)
            t2 = jnp.where(enough, t_ba, t)
        else:
            aa2, t2 = aa, t
        R2 = rot.angle_axis_to_rotation_matrix(aa2)
        # triangulate + cheirality + reprojection gate
        P1 = jnp.concatenate(
            [jnp.eye(3, dtype=a.dtype),
             jnp.zeros((3, 1), a.dtype)], 1)
        P2 = jnp.concatenate([R2, t2[:, None]], 1)
        X = tri.triangulate_dlt(P1, P2, a_all, b_all)
        w4 = X[:, 3:]
        w4 = jnp.where(jnp.abs(w4) < 1e-12, 1e-12, w4)
        Xc1 = X[:, :3] / w4
        Xc2 = Xc1 @ R2.T + t2
        ok = (Xc1[:, 2] > 1e-6) & (Xc2[:, 2] > 1e-6)
        r1 = jnp.linalg.norm(
            Xc1[:, :2] / jnp.maximum(Xc1[:, 2:], 1e-9) - a_all,
            axis=1) * fo1
        r2 = jnp.linalg.norm(
            Xc2[:, :2] / jnp.maximum(Xc2[:, 2:], 1e-9) - b_all,
            axis=1) * fo2
        keep = ((w_all > 0) & ok & (r1 < final_px) & (r2 < final_px))
        return (aa2, t2, keep, jnp.sum(keep), hsum.num_inliers,
                summary.num_inliers, gidx2, gvalid)

    @jax.jit
    def run_flat(keys, x1, x2, pix1, pix2, mask, thresh, h_thresh,
                 f1, f2, pp1, pp2, final_px, band_px,
                 kp1=None, kp2=None, de1=None, de2=None,
                 fm1=None, fm2=None):
        extra = ()
        in_extra = ()
        if guided:
            extra = (kp1, kp2, de1, de2, fm1, fm2)
            in_extra = (0,) * 6
        return jax.vmap(
            lambda *a: one(*a[:12], final_px, band_px, *a[12:]),
            in_axes=(0,) * 12 + in_extra)(
            keys, x1, x2, pix1, pix2, mask, thresh, h_thresh, f1, f2,
            pp1, pp2, *extra)

    return run_flat


def verify_matches_batch(key, pix1, pix2, mask, focal1, focal2,
                         pp1, pp2, image_sizes,
                         opts: GeometricVerificationOptions = None,
                         kp1_all=None, kp2_all=None, desc1=None,
                         desc2=None, fmask1=None, fmask2=None):
    """Batched verify_matches over P pairs in ONE device dispatch.

    pix1/pix2 (P, N, 2) padded putative pixel matches; mask (P, N);
    focal1/2 (P,); pp1/pp2 (P, 2); image_sizes (P, 2, 2) as
    [[w1, h1], [w2, h2]] per pair (zeros -> unscaled threshold).

    opts.guided_matching is honored when the full padded feature
    arrays are supplied (kp1_all/kp2_all (P, N, >=2) pixel keypoints,
    desc1/desc2 (P, N, D), fmask1/fmask2 (P, N)): the grown match set
    rides the same fused dispatch (ref
    two_view_match_geometric_verification.h:53-120 step 2).
    Returns (list of TwoViewInfo or None, list of corr (Mi, 4)).
    """
    opts = opts or GeometricVerificationOptions()
    P = pix1.shape[0]
    f1 = np.asarray(focal1, float)
    f2 = np.asarray(focal2, float)
    x1 = (np.asarray(pix1) - np.asarray(pp1)[:, None]) / f1[:, None,
                                                            None]
    x2 = (np.asarray(pix2) - np.asarray(pp2)[:, None]) / f2[:, None,
                                                            None]
    ev = opts.estimate_twoview_info
    thresh = ev.max_sampson_error_pixels ** 2 / (f1 * f2)
    sizes = np.asarray(image_sizes, float)
    scale = np.where(sizes.max(axis=2) > 0,
                     sizes.max(axis=2) / 1024.0, 1.0)   # (P, 2)
    h_thresh = (ev.max_sampson_error_pixels ** 2 *
                scale[:, 0] * scale[:, 1])

    guided = bool(opts.guided_matching and kp1_all is not None
                  and desc1 is not None)
    fn = _jitted_verify_batch(ev.num_hypotheses,
                              bool(opts.bundle_adjustment), guided)
    keys = jax.random.split(key, P)
    base = (keys, jnp.asarray(x1), jnp.asarray(x2),
            jnp.asarray(np.asarray(pix1, float)),
            jnp.asarray(np.asarray(pix2, float)),
            jnp.asarray(mask), jnp.asarray(thresh),
            jnp.asarray(h_thresh), jnp.asarray(f1), jnp.asarray(f2),
            jnp.asarray(np.asarray(pp1, float)),
            jnp.asarray(np.asarray(pp2, float)),
            jnp.asarray(opts.final_max_reprojection_error_pixels),
            jnp.asarray(opts.guided_matching_max_distance_pixels))
    if guided:
        kp1_px = np.asarray(kp1_all, float)[:, :, :2]
        kp2_px = np.asarray(kp2_all, float)[:, :, :2]
        extra = (jnp.asarray(kp1_px), jnp.asarray(kp2_px),
                 jnp.asarray(desc1), jnp.asarray(desc2),
                 jnp.asarray(fmask1), jnp.asarray(fmask2))
        # the guided stage materializes (N, N) distance matrices per
        # pair: chunk the pair batch so the vmapped temporaries stay
        # ~<=1 GB (two f32 (N, N) mats + masks per pair)
        N = kp1_px.shape[1]
        chunk = max(1, int(2 ** 27 // max(N * N, 1)))
    else:
        extra = ()
        chunk = P
    outs = []
    for s in range(0, P, chunk):
        sl = slice(s, s + chunk)
        outs.append(fn(*(a[sl] if i < 12 else a
                         for i, a in enumerate(base)),
                       *(e[sl] for e in extra)))
    aa, t, keep, n_keep, n_h, n_epi, gidx2, gvalid = (
        np.concatenate([np.asarray(o[i]) for o in outs], 0)
        for i in range(8))

    from ..visibility_pyramid import visibility_score_of_inliers
    maxm = np.asarray(pix1).shape[1]
    infos, corrs = [], []
    for p in range(P):
        if int(n_keep[p]) < opts.min_num_inlier_matches:
            infos.append(None)
            corrs.append(np.zeros((0, 4)))
            continue
        R = np.asarray(rot.angle_axis_to_rotation_matrix(
            jnp.asarray(aa[p])))
        sel = keep[p][:maxm]
        c1 = np.asarray(pix1)[p][sel]
        c2 = np.asarray(pix2)[p][sel]
        if guided:
            gsel = keep[p][maxm:]
            if gsel.any():
                c1 = np.concatenate([c1, kp1_px[p][gsel]])
                c2 = np.concatenate(
                    [c2, kp2_px[p][gidx2[p][gsel]]])
        infos.append(TwoViewInfo(
            focal_length_1=float(f1[p]), focal_length_2=float(f2[p]),
            rotation_2=aa[p].astype(float),
            position_2=-R.T @ t[p],
            num_verified_matches=int(n_keep[p]),
            num_homography_inliers=int(n_h[p]),
            visibility_score=visibility_score_of_inliers(
                c1, c2, tuple(sizes[p, 0]), tuple(sizes[p, 1]))))
        corrs.append(np.concatenate([c1, c2], axis=1))
    return infos, corrs


def verify_matches(key, pix1, pix2, focal1, focal2, pp1, pp2,
                   opts: GeometricVerificationOptions = None,
                   kp1_all=None, kp2_all=None, desc1=None, desc2=None,
                   mask1=None, mask2=None,
                   image_size1=None, image_size2=None):
    """Verify putative matches between two calibrated views.

    pix1/pix2: (N, 2) putative match pixel coords. Optional kp/desc
    arrays enable guided matching over ALL features. Returns
    (TwoViewInfo or None, inlier_correspondences (M, 4)).
    """
    opts = opts or GeometricVerificationOptions()
    # 0. homography inlier count over the putative matches (computed
    # before any filtering, like the reference at
    # two_view_match_geometric_verification.cc:124)
    key, k_h = jax.random.split(key)
    num_h = count_homography_inliers(
        k_h, pix1, pix2, opts.estimate_twoview_info
        .max_sampson_error_pixels, image_size1, image_size2,
        num_hypotheses=opts.estimate_twoview_info.num_hypotheses)
    # 1. two-view estimation
    info, inliers = estimate_twoview_info(
        key, jnp.asarray(pix1), jnp.asarray(pix2), focal1, focal2,
        opts.estimate_twoview_info, pp1=pp1, pp2=pp2)
    if info.num_verified_matches < opts.min_num_inlier_matches:
        return None, np.zeros((0, 4))
    corr1 = np.asarray(pix1)[inliers]
    corr2 = np.asarray(pix2)[inliers]

    # 2. guided matching over all features
    if opts.guided_matching and desc1 is not None:
        from ...matching.guided_matcher import guided_epipolar_matching
        R = np.asarray(rot.angle_axis_to_rotation_matrix(
            jnp.asarray(info.rotation_2)))
        t = -R @ np.asarray(info.position_2)
        E = np.asarray(essential_from_rt(jnp.asarray(R), jnp.asarray(t)))
        F = np.asarray(fundamental_from_essential(
            jnp.asarray(E), focal1, focal2, jnp.asarray(pp1),
            jnp.asarray(pp2)))
        matched1 = np.zeros(len(kp1_all), bool)
        matched2 = np.zeros(len(kp2_all), bool)
        idx2, valid = guided_epipolar_matching(
            jnp.asarray(F), jnp.asarray(kp1_all[:, :2]),
            jnp.asarray(kp2_all[:, :2]), jnp.asarray(desc1),
            jnp.asarray(desc2),
            jnp.ones(len(kp1_all), bool) if mask1 is None
            else jnp.asarray(mask1),
            jnp.ones(len(kp2_all), bool) if mask2 is None
            else jnp.asarray(mask2),
            jnp.asarray(matched1), jnp.asarray(matched2),
            band_pixels=opts.guided_matching_max_distance_pixels)
        sel = np.nonzero(np.asarray(valid))[0]
        if len(sel):
            corr1 = np.concatenate([corr1, kp1_all[sel, :2]])
            corr2 = np.concatenate([corr2,
                                    kp2_all[np.asarray(idx2)[sel], :2]])

    # normalized coords
    x1 = (corr1 - np.asarray(pp1)) / focal1
    x2 = (corr2 - np.asarray(pp2)) / focal2

    # 3-4. triangulate + two-view BA
    R = np.asarray(rot.angle_axis_to_rotation_matrix(
        jnp.asarray(info.rotation_2)))
    t = -R @ np.asarray(info.position_2)
    t = t / max(np.linalg.norm(t), 1e-12)
    if opts.bundle_adjustment and len(x1) >= 8:
        aa_rel = np.asarray(rot.rotation_matrix_to_angle_axis(
            jnp.asarray(R)))
        aa_new, t_new = bundle_adjust_two_views_angular(
            jnp.asarray(aa_rel), jnp.asarray(t), jnp.asarray(x1),
            jnp.asarray(x2), jnp.ones(len(x1)))
        R = np.asarray(rot.angle_axis_to_rotation_matrix(aa_new))
        t = np.asarray(t_new)

    # 5. final filter: triangulate + reprojection gate
    from .. import triangulation as tri
    P1 = np.concatenate([np.eye(3), np.zeros((3, 1))], 1)
    P2 = np.concatenate([R, t[:, None]], 1)
    X = tri.triangulate_dlt(jnp.asarray(P1), jnp.asarray(P2),
                            jnp.asarray(x1), jnp.asarray(x2))
    X = np.asarray(X)
    w = X[:, 3:]
    w = np.where(np.abs(w) < 1e-12, 1e-12, w)
    Xc1 = X[:, :3] / w
    Xc2 = Xc1 @ R.T + t
    ok = (Xc1[:, 2] > 1e-6) & (Xc2[:, 2] > 1e-6)
    r1 = np.linalg.norm(
        Xc1[:, :2] / np.maximum(Xc1[:, 2:], 1e-9) - x1, axis=1) * focal1
    r2 = np.linalg.norm(
        Xc2[:, :2] / np.maximum(Xc2[:, 2:], 1e-9) - x2, axis=1) * focal2
    thresh = opts.final_max_reprojection_error_pixels
    keep = ok & (r1 < thresh) & (r2 < thresh)
    if keep.sum() < opts.min_num_inlier_matches:
        return None, np.zeros((0, 4))

    from ..visibility_pyramid import visibility_score_of_inliers
    out = TwoViewInfo(
        focal_length_1=float(focal1), focal_length_2=float(focal2),
        rotation_2=np.asarray(rot.rotation_matrix_to_angle_axis(
            jnp.asarray(R))),
        position_2=-R.T @ t,
        num_verified_matches=int(keep.sum()),
        num_homography_inliers=int(num_h),
        visibility_score=visibility_score_of_inliers(
            corr1[keep], corr2[keep], image_size1, image_size2))
    return out, np.concatenate([corr1[keep], corr2[keep]], axis=1)
