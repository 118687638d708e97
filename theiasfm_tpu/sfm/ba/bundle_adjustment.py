"""From-scratch sparse Levenberg-Marquardt bundle adjustment with
Schur-complement reduction and matrix-free PCG — the replacement for
the reference's Ceres SPARSE_SCHUR/SCHUR_JACOBI backend
(ref: src/theia/sfm/bundle_adjustment/bundle_adjustment.h:66-158,
bundle_adjuster.cc problem construction, SURVEY.md §3.5, §7).

TPU-native design:
  * The problem is a fixed-shape struct-of-arrays: observations in COO
    form (camera idx, intrinsics-group idx, point idx, pixel), padded
    with a mask. One vmapped autodiff evaluates ALL per-observation
    residual jacobians at once (2x6 camera, 2xP intrinsics, 2x3 point).
  * The point block of the Hessian is block-diagonal 3x3 -> inverted in
    closed form, batched.
  * The reduced camera system S = Hcc - Hcp Hpp^-1 Hpc is NEVER
    materialized: S @ v is computed matrix-free with gathers, per-obs
    small einsums and segment_sums — the exact op mix XLA fuses well on
    TPU, and the one that shards cleanly over a device mesh (cameras,
    points, observations are all leading-axis shardable).
  * Preconditioner: SCHUR_JACOBI — exact 6x6 (and PxP for intrinsics
    groups) diagonal blocks of S, assembled per-observation (valid
    because each (camera, point) pair appears in at most one
    observation) and inverted in batch.
  * LM trust region: classic lambda adaptation with step
    accept/reject, fixed-shape lax.while_loop.

Shared intrinsics: cameras reference an intrinsics group (ref
CameraIntrinsicsGroupId, sfm/reconstruction.h); the group parameters
enter the camera side of the Schur complement, so "gauge/aliasing under
sharding" reduces to segment_sums over the group index.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...camera import models as cm
from .losses import robust_weight


class BAProblem(NamedTuple):
    """Fixed-shape bundle adjustment problem (device SoA pytree)."""
    extrinsics: jnp.ndarray    # (Nc, 6) [position, angle-axis]
    intrinsics: jnp.ndarray    # (Ng, 10) padded per-group params
    points: jnp.ndarray        # (Np, 3)
    obs_cam: jnp.ndarray       # (M,) int32 camera index
    obs_group: jnp.ndarray     # (M,) int32 intrinsics-group index
    obs_pt: jnp.ndarray        # (M,) int32 point index
    obs_pix: jnp.ndarray       # (M, 2) observed pixels
    obs_mask: jnp.ndarray      # (M,) bool (False = padding)
    cam_mask: Optional[jnp.ndarray] = None   # (Nc,) False = hold constant
    point_mask: Optional[jnp.ndarray] = None  # (Np,)
    # Optional scatter-free reduction maps (pad_ba_problem can build
    # them with build_reduction_maps=True):
    # segment_sum(x, obs_cam) == sum(x[cam_idx_map] * cam_idx_valid).
    # NOTE: measured SLOWER than segment_sum on v5e for this problem
    # shape (0.33 vs 1.23 LM iters/s at Notre-Dame scale) — kept as an
    # experimental knob, off by default.
    cam_idx_map: Optional[jnp.ndarray] = None    # (Nc, Cmax) int32
    cam_idx_valid: Optional[jnp.ndarray] = None  # (Nc, Cmax) bool
    pt_idx_map: Optional[jnp.ndarray] = None     # (Np, Pmax) int32
    pt_idx_valid: Optional[jnp.ndarray] = None   # (Np, Pmax) bool
    grp_idx_map: Optional[jnp.ndarray] = None    # (Ng, Gmax) int32
    grp_idx_valid: Optional[jnp.ndarray] = None  # (Ng, Gmax) bool
    # Camera-sorted duplicate index arrays: observations are stored
    # sorted by POINT (fast seg_pt); the camera-side reductions then
    # scatter randomly. gather(perm) + sorted segment_sum replaces that
    # scatter (pad_ba_problem builds these with sort_by_camera=True).
    # NOTE: measured SLOWER than the scatter on v5e (0.79 vs 1.23 LM
    # iters/s at Notre-Dame scale) — experimental knob, off by default.
    cam_sort_perm: Optional[jnp.ndarray] = None   # (M,) int32
    obs_cam_sorted: Optional[jnp.ndarray] = None  # (M,) int32
    # Fused Pallas matvec plan (add_pallas_matvec_plan): per-tile
    # camera ids, window-local point ids, and window starts for the
    # sorted-segment accumulation (see pallas_matvec.py). pmv_window
    # is a zeros((W,), int8) SHAPE CARRIER: the static window size
    # must reach the solver through the jit boundary.
    pmv_cam_tiles: Optional[jnp.ndarray] = None   # (G, B) int32
    pmv_lpt_tiles: Optional[jnp.ndarray] = None   # (G, B) int32
    pmv_p0: Optional[jnp.ndarray] = None          # (G,) int32
    pmv_window: Optional[jnp.ndarray] = None      # (W,) int8 zeros
    # Camera-PAIR gather tables for the dense-Schur assembly
    # (add_cam_pair_tables): tuple of (kidx, lidx, valid) arrays, one
    # per count class; (P_c, cap) observation indices of per-point
    # STRICT upper (k < l) observation pairs grouped by ordered
    # (cam_k, cam_l) pair. The lower triangle is recovered by symmetry
    # (S correction blocks satisfy B(j,i) = B(i,j)^T) and the diagonal
    # by a per-camera segment reduction, so the assembly is completely
    # scatter-free: class results are concatenated and REDISTRIBUTED
    # into the (Nc*Nc, 36) layout with the two permutation GATHERS
    # below (XLA's TPU scatter measured ~1.15us/row — 347ms at bench
    # scale; the gather replacement is ~5ms).
    cam_pair_tables: Optional[tuple] = None
    cam_pair_perm_fwd: Optional[jnp.ndarray] = None  # (Nc*Nc, Rf) int32
    cam_pair_perm_rev: Optional[jnp.ndarray] = None  # (Nc*Nc, Rr) int32
    # (pt_idx_map/pt_idx_valid double as the fast path for the point
    # reductions: gather + K-sum beats XLA's TPU scatter 2.4-4.8x at 2M
    # observations, see seg_pt in bundle_adjust. A cumsum+boundary-diff
    # variant measured 5x but suffers catastrophic cancellation on the
    # monotone Hpp sums — rejected.)


@dataclasses.dataclass(frozen=True)
class BAOptions:
    """Static knobs (ref BundleAdjustmentOptions, bundle_adjustment.h:66-123)."""
    model_type: int = int(cm.CameraModelType.PINHOLE)
    loss: str = "trivial"
    loss_scale: float = 1.0
    max_iterations: int = 50
    cg_iterations: int = 50
    cg_tol: float = 1e-6
    initial_lambda: float = 1e-4
    min_lambda: float = 1e-12
    max_lambda: float = 1e12
    # scale the reject-side lambda growth by how bad the candidate
    # was: a catastrophic step (cost > 2x current — the eta-forced
    # truncated-CG blowups the trace probe exposed) multiplies lambda
    # by 100 instead of 10, skipping the intermediate rejected retry
    reject_growth_aggressive: bool = False
    # which of the 10 intrinsics slots are optimized
    # (ref OptimizeIntrinsicsType bitmask; default: focal only is
    #  reference default FOCAL_LENGTH)
    optimize_intrinsics: tuple = (True,) + (False,) * 9
    optimize_cameras: bool = True
    optimize_points: bool = True
    function_tolerance: float = 1e-9
    # Ruhe–Wedin coordinate-descent inner iterations (ref
    # use_inner_iterations, bundle_adjustment.h:114 — the reference's
    # DEFAULT is true, wired at bundle_adjuster.cc:69,196): after each
    # candidate LM step, every point block is re-optimized with the
    # cameras held fixed — a batched closed-form 3x3 GN sweep with a
    # per-point cost guard (the guard makes each sweep monotone
    # non-increasing in total cost, the same safeguard role as Ceres'
    # per-block inner trust region). Value = number of GN sweeps per
    # candidate step; 0 disables. Materially improves per-iteration
    # cost reduction on hard scenes, matching Ceres' default behavior.
    inner_iterations: int = 1
    # Convergence-normalized benchmarking: when > 0, LM terminates as
    # soon as the accepted cost drops to <= target_cost. Lets the bench
    # measure wall time to a MATCHED cost (e.g. 1.001x the converged
    # cost of an exact run) instead of raw iterations/s, which is not
    # comparable across exact/inexact per-iteration solves.
    target_cost: float = 0.0
    # record the per-iteration candidate cost (signed: negative for
    # rejected steps) in BASummary.cost_trace — diagnosis knob for
    # cross-config trajectory comparisons; off in production
    trace_costs: bool = False
    # set when obs_pt is non-decreasing (pad_ba_problem sorts): lets XLA
    # lower the big point-block segment reductions without full scatter
    point_indices_sorted: bool = False
    # "pcg"  — matrix-free Schur + PCG (ref ITERATIVE_SCHUR; scales to
    #          any camera count, the multi-chip path)
    # "dense_schur" — materialize the reduced camera system S
    #          ((6Nc+P*Ng)^2) from per-point observation-pair blocks and
    #          factorize it (ref DENSE_SCHUR). Exact solve, no CG loop,
    #          no preconditioner assembly; the right choice up to a few
    #          thousand cameras (S for 2k cams is 12k^2 = 0.6GB f32 —
    #          fine in HBM; Cholesky of 12k is ~0.6 TFLOP, trivial on
    #          the MXU). Requires prob.pt_idx_map/pt_idx_valid (a
    #          (Np, Kmax) per-point observation table, see
    #          add_point_obs_map / pad_ba_problem).
    linear_solver: str = "pcg"
    # store the per-observation jacobian blocks in bfloat16 INSIDE the
    # CG matvec (f32 accumulation, f32 preconditioner/RHS/back-subst):
    # the matvec is HBM-bound on jacobian traffic, so this ~halves the
    # per-CG-iteration cost. The LM accept/reject loop guards against
    # the (slightly) inexact operator.
    matvec_bf16: bool = False
    # Inexact-Newton forcing: when > 0, CG terminates at
    # ||r|| <= max(cg_tol, cg_eta) * ||b|| — a CONSTANT per-iteration
    # forcing tolerance, analogous to Ceres' eta forcing for
    # ITERATIVE_SCHUR (Solver::Options::eta, default 1e-1; Ceres uses a
    # Q-based quadratic-model-decrease criterion with eta as
    # q_tolerance, this uses a relative residual norm — comparable
    # behavior, not identical). The LM trust region absorbs the
    # inexactness; measured: a tightening schedule wastes most of the
    # benefit on late iterations.
    cg_eta: float = 0.0
    # "schur_jacobi" (exact 6x6 diagonal blocks of S, ref Ceres
    # SCHUR_JACOBI) or "block_diag" (plain damped Hcc/Hgg blocks — no
    # per-observation assembly work, weaker preconditioning; Ceres'
    # JACOBI is the scalar analog).
    preconditioner: str = "schur_jacobi"
    # Run the CG matvec's two observation sweeps as fused Pallas
    # kernels over compact (zero-padding) buffers instead of XLA ops
    # over (M, 128)-lane-padded temporaries (see pallas_matvec.py).
    # Requires Ng == 1, point-sorted observations, no shard_map axis,
    # and the plan arrays attached by add_pallas_matvec_plan —
    # silently falls back to the XLA matvec otherwise.
    pallas_matvec: bool = False
    # Transposed (F, M) jacobian layout for the Pallas matvec: blocks
    # stream as (F, B) sublane-padded tiles (compact in HBM) instead
    # of (B, F) lane-padded tiles (6-21x DMA amplification). One
    # transpose of each jacobian per damped solve buys cheaper reads
    # in every CG iteration. Measured on-chip (round 4): 18.7 vs 8.8
    # LM iters/s at 550 cams / 560k obs, 4.58 vs 3.27 at 2152 cams /
    # 2M obs — ON by default.
    pallas_transposed: bool = True
    # Also run the make_blocks sweep as a fused Pallas kernel.
    # MEASURED NET LOSS at 550 cams (5.85 vs 10.63 iters/s with the
    # matvec kernels alone; the extra windowed RMW per LM iteration
    # and a per-call zero-init buffer dominate what the sweep saves)
    # — kept as an experimental knob, off by default.
    pallas_blocks: bool = False
    # Carry residuals/jacobians (and the lambda-independent Hessian
    # blocks) across LM iterations so REJECTED steps skip the jacobian
    # pass entirely. MEASURED NET LOSS on v5e even on a reject-heavy
    # problem (1.603 vs 1.887 LM iters/s at Notre-Dame scale): the
    # lax.cond carry forces materialization of the per-obs jacobian
    # arrays every iteration and breaks XLA fusion. Off by default;
    # kept as a knob for future layouts that might flip the balance.
    jacobian_reuse: bool = False
    # Reuse the SCHUR_JACOBI preconditioner from the previous LM
    # iteration on REJECTED steps (the stale preconditioner only
    # affects CG convergence rate, never correctness — the damped
    # operator itself always uses the fresh lambda). Ignored (always
    # rebuilt) under shard_map, where the rebuild contains collectives.
    precond_reuse: bool = False
    # When set, bundle_adjust is running INSIDE shard_map over this
    # mesh axis with observations+points device-local and
    # cameras/groups replicated: camera/group reductions, CG dots, and
    # costs are psum'ed over the axis; point-block math stays local
    # (see parallel/point_sharded.py).
    axis_name: Optional[str] = None


class BASummary(NamedTuple):
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    num_iterations: jnp.ndarray
    final_lambda: jnp.ndarray
    # (max_iterations,) per-iteration candidate costs when
    # BAOptions.trace_costs (negative entries mark rejected steps);
    # None otherwise
    cost_trace: Optional[jnp.ndarray] = None


# ---------------------------------------------------------------------------


def _residual_one(model_type, extr, intr, pt, pix):
    pixel, depth = cm.project(model_type, extr, intr, pt)
    r = pixel - pix
    # behind-camera observations get a large fixed residual gradient-free
    bad = depth <= 1e-8
    return jnp.where(bad, 0.0, r), bad


def _all_jacobians(model_type, prob: BAProblem, weights, r_raw=None):
    """Residuals and weighted per-observation jacobian blocks.

    Returns r (M, 2), Jc (M, 2, 6), Ji (M, 2, 10), Jp (M, 2, 3).
    r_raw: precomputed unweighted residuals (avoids a duplicate
    residual pass when the caller already evaluated them for the
    robust-loss weights).
    """
    extr = prob.extrinsics[prob.obs_cam]
    intr = prob.intrinsics[prob.obs_group]
    pts = prob.points[prob.obs_pt]

    def f(e, i, p, pix):
        r, bad = _residual_one(model_type, e, i, p, pix)
        return r

    r = jax.vmap(f)(extr, intr, pts, prob.obs_pix) if r_raw is None \
        else r_raw
    # reverse mode: the residual is R^19 -> R^2, so 2 VJP passes beat
    # 19 JVP passes (measured ~3x faster LM fixed cost on TPU)
    Jc, Ji, Jp = jax.vmap(jax.jacrev(f, argnums=(0, 1, 2)))(
        extr, intr, pts, prob.obs_pix)
    w = weights[:, None]
    return r * w, Jc * w[..., None], Ji * w[..., None], Jp * w[..., None]


def _apply_masks(prob: BAProblem, opts: BAOptions, Jc, Ji, Jp):
    if not opts.optimize_cameras:
        Jc = Jc * 0.0
    elif prob.cam_mask is not None:
        Jc = Jc * prob.cam_mask[prob.obs_cam][:, None, None]
    intr_sel = jnp.asarray(opts.optimize_intrinsics, Jc.dtype)
    Ji = Ji * intr_sel[None, None, :]
    if not opts.optimize_points:
        Jp = Jp * 0.0
    elif prob.point_mask is not None:
        Jp = Jp * prob.point_mask[prob.obs_pt][:, None, None]
    return Jc, Ji, Jp


def ba_cost(prob: BAProblem, opts: BAOptions):
    """Total (robustified) cost. ref: Ceres total cost reporting."""
    extr = prob.extrinsics[prob.obs_cam]
    intr = prob.intrinsics[prob.obs_group]
    pts = prob.points[prob.obs_pt]

    def f(e, i, p, pix):
        return _residual_one(opts.model_type, e, i, p, pix)

    r, bad = jax.vmap(f)(extr, intr, pts, prob.obs_pix)
    s = jnp.sum(r * r, axis=-1)
    w2 = robust_weight(opts.loss, s, opts.loss_scale) ** 2
    cost_m = w2 * s
    # cheirality violations: constant penalty so LM rejects steps that
    # push points behind cameras (their jacobians are zeroed)
    cost_m = jnp.where(bad, 1e8, cost_m)
    return 0.5 * jnp.sum(jnp.where(prob.obs_mask, cost_m, 0.0))


def _inv3(A):
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack([
        A11, A12, A13, A21, A22, A23, A31, A32, A33,
    ], axis=-1).reshape(A.shape)
    return adj / det[..., None, None]


def _inv3_flat(H9, eps_diag=0.0):
    """Batched closed-form 3x3 inverse on FLAT (N, 9) row-major
    storage (adjugate / det) — pure VPU column algebra, no (N, 3, 3)
    tile-padded temporaries. Optionally adds eps_diag to the diagonal
    before inverting."""
    a, b, c = H9[:, 0], H9[:, 1], H9[:, 2]
    d, e, f = H9[:, 3], H9[:, 4], H9[:, 5]
    g, h, i = H9[:, 6], H9[:, 7], H9[:, 8]
    if eps_diag:
        a, e, i = a + eps_diag, e + eps_diag, i + eps_diag
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    return jnp.stack([A11, A12, A13, A21, A22, A23, A31, A32, A33],
                     axis=-1) / det[:, None]


_DIAG9 = np.zeros(9, np.float32)
_DIAG9[[0, 4, 8]] = 1.0


def bundle_adjust(prob: BAProblem, opts: BAOptions):
    """Run LM. Returns (BAProblem with updated params, BASummary).

    Jit-compatible; `opts` must be passed statically (closure/static arg).
    """
    Nc = prob.extrinsics.shape[0]
    Ng = prob.intrinsics.shape[0]
    Np = prob.points.shape[0]
    dtype = prob.points.dtype
    Pfull = prob.intrinsics.shape[1]

    # Active-intrinsics compression: the reference's default optimizes
    # FOCAL_LENGTH only (OptimizeIntrinsicsType, bundle_adjustment.h:
    # 66-123); carrying all Pfull=10 padded slots through every
    # group-side einsum/reduction wastes ~10x HBM traffic and FLOPs.
    # The group jacobian is statically sliced to the active slots; the
    # step is expanded back at update time.
    active = tuple(i for i, b in enumerate(opts.optimize_intrinsics)
                   if b and i < Pfull)
    P = max(1, len(active))  # keep a dummy zeroed slot when none active
    _active_idx = np.asarray(active if active else (0,), np.int32)

    def _compress_ji(Ji):
        Ji = Ji[:, :, _active_idx]
        if not active:
            Ji = Ji * 0.0
        return Ji

    def _expand_dg(dg):
        out = jnp.zeros((Ng, Pfull), dg.dtype)
        if active:
            out = out.at[:, _active_idx].set(dg)
        return out

    obs_valid = prob.obs_mask

    def _gather_reduce(x, idx_map, idx_valid):
        """segment_sum(x, idx) == masked gather + dense reduce.

        Trailing dims are FLATTENED before the gather and the reduction
        runs in chunks over the per-segment axis — both to dodge the
        (..., 6, 6)-style tile-padding blowup (XLA pads the last two
        dims to (8, 128); an (E, Kmax, 6, 6) temp would inflate 28x).
        """
        E, Kmax = idx_map.shape
        xf = x.reshape(x.shape[0], -1)                 # (M, F)
        F = xf.shape[1]
        CH = min(Kmax, 128)
        vf = idx_valid.astype(x.dtype)

        def chunk(i, acc):
            sl = jax.lax.dynamic_slice_in_dim(idx_map, i * CH, CH, 1)
            vl = jax.lax.dynamic_slice_in_dim(vf, i * CH, CH, 1)
            g = xf[sl]                                 # (E, CH, F)
            return acc + jnp.einsum("ecf,ec->ef", g, vl)

        acc = jnp.zeros((E, F), x.dtype)
        acc = jax.lax.fori_loop(0, Kmax // CH, chunk, acc)
        return acc.reshape((E,) + x.shape[1:])

    if prob.cam_idx_map is not None:
        # flat gather + block-summing matmul (same trick as seg_pt
        # below): beats XLA's TPU scatter ~4x at 2M observations
        cam_idx_flat = prob.cam_idx_map.reshape(-1)
        cam_val_flat = prob.cam_idx_valid.reshape(-1)
        Kc = prob.cam_idx_map.shape[1]

        def seg_cam(x):
            xf = x.reshape(x.shape[0], -1)
            F = xf.shape[1]
            g = (xf[cam_idx_flat] *
                 cam_val_flat[:, None].astype(x.dtype))
            g = g.reshape(Nc, Kc * F)
            S = jnp.tile(jnp.eye(F, dtype=x.dtype), (Kc, 1))
            return (g @ S).reshape((Nc,) + x.shape[1:])
    elif prob.cam_sort_perm is not None:
        def seg_cam(x):
            return jax.ops.segment_sum(
                x[prob.cam_sort_perm], prob.obs_cam_sorted,
                num_segments=Nc, indices_are_sorted=True)
    else:
        def seg_cam(x):
            return jax.ops.segment_sum(x, prob.obs_cam, num_segments=Nc)

    if prob.grp_idx_map is not None:
        def seg_grp(x):
            return _gather_reduce(x, prob.grp_idx_map,
                                  prob.grp_idx_valid)
    elif Ng == 1:
        # single shared intrinsics group (the common case): the
        # segment reduction is a plain sum — no scatter at all
        def seg_grp(x):
            return jnp.sum(x, axis=0, keepdims=True)
    else:
        def seg_grp(x):
            return jax.ops.segment_sum(x, prob.obs_group,
                                       num_segments=Ng)

    def grp_contract(spec, a, b, out_dtype=None):
        """seg_grp(einsum(spec, a, b)) without the (M, ...) temporary
        when Ng == 1: the observation axis folds into the contraction
        (an (M, P, P) temp is tile-padded ~20x = 16GB at 2M obs)."""
        out_dtype = out_dtype or dtype
        lhs, out = spec.split("->")
        if Ng == 1:
            # _psum resolves late (defined below): completes the
            # reduction across the mesh under shard_map
            return _psum(jnp.einsum(
                lhs + "->" + out[1:], a, b,
                preferred_element_type=out_dtype)[None])
        return seg_grp(jnp.einsum(spec, a, b,
                                  preferred_element_type=out_dtype))

    # Point reductions: when the (Np, K) observation table exists and
    # its padding waste is bounded, gather rows and sum over K with a
    # block-summing matmul — 2.4-4.8x XLA's TPU scatter at 2M obs,
    # numerically exact (per-segment accumulation, unlike cumsum
    # differencing which cancels catastrophically on monotone sums).
    M_obs = prob.obs_pt.shape[0]
    use_pt_gather = (
        prob.pt_idx_map is not None and
        prob.pt_idx_map.shape[0] * prob.pt_idx_map.shape[1] <= 4 * M_obs)
    if use_pt_gather:
        Kp = prob.pt_idx_map.shape[1]
        idx_flat = prob.pt_idx_map.reshape(-1)
        val_flat = prob.pt_idx_valid.reshape(-1)

        if Kp <= 8 and Np * Kp >= (1 << 20):
            # short tracks at LARGE scale: one masked gather per slot,
            # accumulated in (Np, F)-class temps. The flat-gather
            # variant below materializes an (Np*Kp, F) temp whose F
            # lanes pad to 128 — 1GB per call at 2M observations
            # (measured: 2152 cams/2M obs 1.6 -> 3.19 LM iters/s;
            # 1100 cams/1.12M obs 2.76 -> per-slot probe below).
            # Below the threshold the single big gather + matmul wins
            # (measured: 550 cams/560k obs 9.88 vs 8.70) — fixed
            # per-gather overheads dominate when the temp fits easily.
            def seg_pt(x):
                xf = x.reshape(x.shape[0], -1)
                acc = None
                for k in range(Kp):
                    g = (xf[prob.pt_idx_map[:, k]] *
                         prob.pt_idx_valid[:, k][:, None].astype(
                             x.dtype))
                    acc = g if acc is None else acc + g
                return acc.reshape((Np,) + x.shape[1:])
        else:
            def seg_pt(x):
                xf = x.reshape(x.shape[0], -1)
                F = xf.shape[1]
                g = (xf[idx_flat] * val_flat[:, None].astype(x.dtype))
                g = g.reshape(Np, Kp * F)
                S = jnp.tile(jnp.eye(F, dtype=x.dtype),
                             (Kp, 1))                      # (K*F, F)
                return (g @ S).reshape((Np,) + x.shape[1:])
    else:
        # many segments with few members each — the chunked gather wins
        # nothing; sorted segment_sum
        def seg_pt(x):
            return jax.ops.segment_sum(
                x, prob.obs_pt, num_segments=Np,
                indices_are_sorted=opts.point_indices_sorted)

    # Under shard_map (point-sharded multi-chip BA): camera/group state
    # is replicated, so their reductions and every scalar reduction are
    # completed with a psum over the mesh axis; point-block reductions
    # stay device-local by construction.
    seg_cam_local = seg_cam
    if opts.axis_name is not None:
        _psum = functools.partial(jax.lax.psum,
                                  axis_name=opts.axis_name)
        _seg_cam_local, _seg_grp_local = seg_cam, seg_grp

        def seg_cam(x):
            return _psum(_seg_cam_local(x))

        def seg_grp(x):
            return _psum(_seg_grp_local(x))
    else:
        def _psum(x):
            return x

    def build_system(extr, intr, pts, r0):
        """r0: raw residuals at (extr, intr, pts) — reused from the
        previous accept/reject cost evaluation (one residual pass per
        LM iteration instead of two).

        Returns FLAT per-observation arrays: r (M, 2), Jc (M, 12),
        Ji (M, 2P), Jp (M, 6). Per-obs arrays are kept 2-D with the
        small dims FLATTENED throughout the solver: XLA tile-pads the
        last two dims of an (M, a, b) array to (8, 128) — an (M, 2, 6)
        f32 temp inflates 10.7x and its bf16 twin 21x ((16, 128)
        tiles) at 10^5-10^6 observations. Flat (M, F) pads only
        F -> 128; all small per-row matrix algebra runs as
        _flat_einsum expansion matmuls on the MXU."""
        p = prob._replace(extrinsics=extr, intrinsics=intr, points=pts)
        s = jnp.sum(r0 * r0, axis=-1)
        w = robust_weight(opts.loss, s, opts.loss_scale)
        w = jnp.where(obs_valid, w, 0.0)
        r, Jc, Ji, Jp = _all_jacobians(opts.model_type, p, w, r_raw=r0)
        Jc, Ji, Jp = _apply_masks(prob, opts, Jc, Ji, Jp)
        Ji = _compress_ji(Ji)
        M_ = r.shape[0]
        # ONE packed (M, 20+2P) output instead of four separate
        # (M, F<128) arrays. Rationale: each (M, F) f32 array is
        # physically (M, 128) in HBM (lane padding), so four outputs
        # could cost four full write passes. Measured on-chip
        # (round 4, 550 cams): throughput UNCHANGED (8.78/9.40
        # pallas/XLA iters/s either way) — XLA already coalesced the
        # four outputs — but the packed form is kept for the single
        # jacobian-reuse carry and simpler plumbing.
        return jnp.concatenate(
            [r, Jc.reshape(M_, 12), Ji.reshape(M_, 2 * P),
             Jp.reshape(M_, 6)], axis=1)

    # Fused-kernel eligibility (see pallas_matvec.py): shared across
    # make_blocks and the CG matvec. The round-3 1M-observation cap is
    # gone (ids stream per tile instead of living whole in VMEM), and
    # the matvec kernels now compose with shard_map: under a mesh axis
    # each device runs them on its local observation shard and the
    # camera-side outputs are psum'ed (point blocks are device-local
    # in the point-sharded layout, so wp/zp need no collective).
    _pallas_ok = (opts.pallas_matvec and Ng == 1 and
                  prob.pmv_p0 is not None and
                  dtype == jnp.float32)
    _pallas_blocks_ok = (_pallas_ok and opts.pallas_blocks and
                         opts.axis_name is None)
    if _pallas_blocks_ok:
        from .pallas_matvec import FusedBlocks, PlanShapes
        _G, _B = prob.pmv_cam_tiles.shape
        _shapes = PlanShapes(_G, _B, Nc, Np, prob.pmv_window.shape[0])
        _fused_blocks = FusedBlocks(
            _shapes, P, interpret=jax.default_backend() != "tpu",
            cam_tiles=prob.pmv_cam_tiles,
            lpt_tiles=prob.pmv_lpt_tiles, p0=prob.pmv_p0)

    def make_blocks(r, Jc12, JiP, Jp6):
        """Lambda-INDEPENDENT pieces of the normal equations: undamped
        block-diagonal Hessian blocks and gradients. Computed once per
        accepted LM step and reused across rejected-step re-solves
        (only the damping depends on lambda).

        Point/camera-side products are assembled FLAT and the gradient
        rides the same segment reduction as the Hessian blocks (one
        reduction pass each over (M, 12) / (M, 42) instead of separate
        rank-3 reductions over 28x-padded temporaries). With the fused
        Pallas kernels enabled the whole sweep is ONE launch.

        Returns Hpp as FLAT (Np, 9) — (Np, 3, 3) would tile-pad 28x
        and it is re-read every CG iteration via Hpp_inv."""
        if _pallas_blocks_ok:
            pt_blk, cam_blk, X2, Y2 = _fused_blocks(Jc12, JiP, Jp6, r)
            Hpp9 = pt_blk[:Np, 0:9]
            gp = pt_blk[:Np, 9:12]
            Hcc = cam_blk[:Nc, :36].reshape(Nc, 6, 6)
            gc = cam_blk[:Nc, 36:42]
            Hgg = jnp.einsum("kpkq->pq",
                             X2.reshape(2, P, 2, P))[None]
            gg = jnp.einsum("kpk->p", Y2.reshape(2, P, 2))[None]
            return Hpp9, Hcc, Hgg, gc, gg, gp
        Hpp9_m = _flat_einsum("ka,kb->ab", (2, 3), (2, 3), Jp6, Jp6)
        gp3_m = _flat_einsum("ka,k->a", (2, 3), (2,), Jp6, r)
        pt_blk = seg_pt(jnp.concatenate([Hpp9_m, gp3_m], axis=1))
        Hpp9, gp = pt_blk[:, :9], pt_blk[:, 9:]
        Hcc36_m = _flat_einsum("ka,kb->ab", (2, 6), (2, 6), Jc12, Jc12)
        gc6_m = _flat_einsum("ka,k->a", (2, 6), (2,), Jc12, r)
        cam_blk = seg_cam(jnp.concatenate([Hcc36_m, gc6_m], axis=1))
        Hcc = cam_blk[:, :36].reshape(Nc, 6, 6)
        gc = cam_blk[:, 36:]
        if Ng == 1:
            # observation axis folds into two small matmuls
            X = _psum(jnp.dot(JiP.T, JiP,
                              preferred_element_type=dtype)[None])[0]
            Hgg = jnp.einsum("kpkq->pq",
                             X.reshape(2, P, 2, P))[None]
            Y = _psum(jnp.dot(JiP.T, r,
                              preferred_element_type=dtype)[None])[0]
            gg = jnp.einsum("kpk->p", Y.reshape(2, P, 2))[None]
        else:
            Ji3 = JiP.reshape(-1, 2, P)
            Hgg = grp_contract("mki,mkj->mij", Ji3, Ji3)
            gg = grp_contract("mki,mk->mi", Ji3, r)
        return Hpp9, Hcc, Hgg, gc, gg, gp

    def grp_reduce_flat(JiP_, t_):
        """sum over obs of Ji^T t per group -> (Ng, P), flat inputs.
        For Ng == 1 the observation axis folds into one small matmul
        (no (M, P) temp); otherwise a flat per-obs product + seg_grp."""
        if Ng == 1:
            Z = _psum(jnp.dot(JiP_.T, t_.astype(JiP_.dtype),
                              preferred_element_type=dtype)[None])[0]
            return jnp.einsum("kpk->p", Z.reshape(2, P, 2))[None]
        return seg_grp(_flat_einsum("kp,k->p", (2, P), (2,), JiP_,
                                    t_, out_dtype=dtype))

    def _vg_mat(vg1, dt):
        """(2P, 2) block-diagonal matrix B with B[k*P+p, k] = vg1[p]:
        JiP @ B == per-obs Ji·vg for the single shared intrinsics
        group — one skinny matmul instead of an (M, P) gather."""
        z = jnp.zeros((P,), dt)
        v = vg1.astype(dt)
        return jnp.stack([jnp.concatenate([v, z]),
                          jnp.concatenate([z, v])], axis=1)

    def backsub_points(Jc12, JiP, Jp6, dc, dg, Hpp_inv, gp):
        """dp = Hpp^-1 (-gp - Hpc dc - Hpi dg), flat per-obs algebra."""
        u = _flat_einsum("ki,i->k", (2, 6), (6,), Jc12,
                         dc[prob.obs_cam])
        if Ng == 1:
            u = u + jnp.dot(JiP, _vg_mat(dg[0], JiP.dtype),
                            preferred_element_type=dtype)
        else:
            u = u + _flat_einsum("kp,p->k", (2, P), (P,), JiP,
                                 dg[prob.obs_group])
        hp = seg_pt(_flat_einsum("ka,k->a", (2, 3), (2,), Jp6, u))
        return _flat_einsum("ab,b->a", (3, 3), (3,), Hpp_inv,
                            -gp - hp)

    def solve_normal_eqs(r, Jc12, JiP, Jp6, blocks, lam, P_state,
                         rebuild_precond):
        """One damped Schur/PCG solve on FLAT per-obs arrays.

        Returns (dc, di, dp, P_state). `blocks` are the
        lambda-independent pieces from make_blocks (Hpp FLAT (Np, 9));
        `P_state` carries the (Pc_inv, Pg_inv) preconditioner across
        rejected steps when opts.precond_reuse. The CG forcing
        tolerance is the STATIC max(opts.cg_tol, opts.cg_eta)."""
        Hpp9, Hcc, Hgg, gc, gg, gp = blocks
        if opts.matvec_bf16:
            Jc_mv = Jc12.astype(jnp.bfloat16)
            Ji_mv = JiP.astype(jnp.bfloat16)
            Jp_mv = Jp6.astype(jnp.bfloat16)
        else:
            Jc_mv, Ji_mv, Jp_mv = Jc12, JiP, Jp6

        # --- damped point blocks. Hpp enters the REAL math (operator
        # + back-substitution) — full precision, flat (Np, 9).
        diag9 = jnp.asarray(_DIAG9, dtype)
        Hpp_inv = _inv3_flat(Hpp9 * (1.0 + lam * diag9[None, :]),
                             eps_diag=1e-12)               # (Np,9)

        # reduced RHS: b = -g_c + Hcp Hpp^-1 g_p  (for cam and group)
        yp = _flat_einsum("ab,b->a", (3, 3), (3,), Hpp_inv, gp)
        t = _flat_einsum("kj,j->k", (2, 3), (3,), Jp6,
                         yp[prob.obs_pt])                  # (M,2)
        bc = -gc + seg_cam(_flat_einsum("ki,k->i", (2, 6), (2,),
                                        Jc12, t))
        bg = -gg + grp_reduce_flat(JiP, t)

        if opts.linear_solver == "dense_schur":
            def build_corr():
                return _dense_schur_corr(prob, opts, Jc12, JiP, Jp6,
                                         Hpp_inv, _psum, seg_pt,
                                         seg_cam_local)

            if rebuild_precond is None:
                corr_state = build_corr()
            else:
                # stale-on-reject reuse: the correction blocks keep the
                # previous (smaller) lambda; the higher fresh lambda on
                # the damped diagonal dominates, and a non-PD stale
                # system just yields a NaN step that LM rejects again
                # (lambda keeps rising until the system is PD — same
                # recovery as a failed Ceres factorization). Hcg inside
                # the state is lambda-independent, hence exact.
                corr_state = jax.lax.cond(
                    rebuild_precond, build_corr, lambda: P_state)
            corr_cc_flat, corr_cg, corr_gg, Hcg = corr_state
            dc, dg = _dense_schur_factor_solve(
                prob, opts, Hcc, Hgg, bc, bg, lam,
                corr_cc_flat, corr_cg, corr_gg, Hcg)
            dp = backsub_points(Jc12, JiP, Jp6, dc, dg, Hpp_inv, gp)
            # only carry the (large) corr blocks when reuse is on
            return dc, dg, dp, (corr_state if rebuild_precond is not None
                                else P_state)

        # camera/group damping diagonals (small, precomputed once)
        diag_c = lam * jnp.einsum("nii->ni", Hcc)          # (Nc,6)
        diag_g = lam * jnp.einsum("nii->ni", Hgg)          # (Ng,P)

        use_pallas_mv = _pallas_ok
        if use_pallas_mv:
            from .pallas_matvec import FusedMatvec, PlanShapes
            G_, B_ = prob.pmv_cam_tiles.shape
            shapes = PlanShapes(G_, B_, Nc, Np,
                                prob.pmv_window.shape[0])
            fm = FusedMatvec(
                shapes, P, mv_dtype=Jc_mv.dtype,
                interpret=jax.default_backend() != "tpu",
                cam_tiles=prob.pmv_cam_tiles,
                lpt_tiles=prob.pmv_lpt_tiles, p0=prob.pmv_p0)
            # transposed tiles measured 2.1x at 550 cams (18.7 vs 8.8
            # iters/s) and 1.4x at 2152 (4.58 vs 3.27); the round-4
            # 3000-cam gate (monolithic (Ncp, B) one-hot outgrowing
            # VMEM at 5288 cams) is lifted by the chunked camera
            # one-hot in pallas_matvec (256-column slabs above 1024
            # cams; <=1024 cams is the bit-identical single chunk)
            _use_t = opts.pallas_transposed
            if _use_t:
                # one transpose per damped solve; every CG iteration
                # then reads compact (F, B) tiles
                jc_cp, ji_cp, jp_cp = Jc_mv.T, Ji_mv.T, Jp_mv.T
            else:
                jc_cp, ji_cp, jp_cp = Jc_mv, Ji_mv, Jp_mv

            def S_matvec_pallas(vc, vg):
                if _use_t:
                    vc_t = jnp.zeros((6, shapes.cam_pad),
                                     jnp.float32).at[:, :Nc].set(vc.T)
                    vgm_t = _vg_mat(vg[0], jnp.float32).T
                    u_c, wp_pad = fm.pass1_t(jc_cp, ji_cp, jp_cp,
                                             vc_t, vgm_t)
                else:
                    vc_pad = jnp.zeros((shapes.cam_pad, 6),
                                       jnp.float32).at[:Nc].set(vc)
                    vgm = _vg_mat(vg[0], jnp.float32)
                    u_c, wp_pad = fm.pass1(jc_cp, ji_cp, jp_cp,
                                           vc_pad, vgm)
                zp = _flat_einsum("ab,b->a", (3, 3), (3,), Hpp_inv,
                                  wp_pad[:Np, :3])
                zp_pad = jnp.zeros((shapes.Np_pad, 128),
                                   jnp.float32).at[:Np, :3].set(zp)
                if _use_t:
                    yc_p, yg_p = fm.pass2_t(jc_cp, ji_cp, jp_cp, u_c,
                                            zp_pad)
                else:
                    yc_p, yg_p = fm.pass2(jc_cp, ji_cp, jp_cp, u_c,
                                          zp_pad)
                # under shard_map (point-sharded mesh) the kernels
                # reduce over LOCAL observations only; the camera and
                # shared-intrinsics reductions complete over the mesh
                # exactly like the XLA path's seg_cam/seg_grp psums
                yc = _psum(yc_p[:Nc, :6])
                g2 = yg_p[:2 * P, :2].reshape(2, P, 2)
                yg = _psum((g2[0, :, 0] + g2[1, :, 1])[None])
                return yc + diag_c * vc, yg + diag_g * vg

        # --- matrix-free S @ v on FLAT per-obs arrays. The two
        # camera-side (and group-side) reductions fuse algebraically:
        # seg(J^T u) - seg(J^T u2) == seg(J^T (u - u2)) — one segment
        # reduction each instead of two (the reductions are the
        # HBM-bound part of the matvec).
        def S_matvec(vc, vg):
            u = _flat_einsum("ki,i->k", (2, 6), (6,), Jc_mv,
                             vc[prob.obs_cam], out_dtype=dtype)
            if Ng == 1:
                u = u + jnp.dot(Ji_mv, _vg_mat(vg[0], Ji_mv.dtype),
                                preferred_element_type=dtype)
            else:
                u = u + _flat_einsum("kp,p->k", (2, P), (P,), Ji_mv,
                                     vg[prob.obs_group],
                                     out_dtype=dtype)      # (M,2) f32
            wp = seg_pt(_flat_einsum("ka,k->a", (2, 3), (2,), Jp_mv,
                                     u, out_dtype=dtype))  # (Np,3)
            zp = _flat_einsum("ab,b->a", (3, 3), (3,), Hpp_inv, wp)
            u2 = _flat_einsum("kj,j->k", (2, 3), (3,), Jp_mv,
                              zp[prob.obs_pt], out_dtype=dtype)
            d = u - u2
            yc = seg_cam(_flat_einsum("ki,k->i", (2, 6), (2,), Jc_mv,
                                      d, out_dtype=dtype))
            yg = grp_reduce_flat(Ji_mv, d)
            # damping on the camera/group diagonal
            return yc + diag_c * vc, yg + diag_g * vg

        if use_pallas_mv:
            S_matvec = S_matvec_pallas  # noqa: F811

        # --- SCHUR_JACOBI preconditioner (exact 6x6 diag blocks of S for
        # cameras; group blocks approximate — both only precondition).
        # W = Hpc contribution of obs m (each (cam, pt) pair has at most
        # one observation, so the per-obs form is exact for cameras).
        # the blocks only PREcondition, so assemble the big (M, ., .)
        # temporaries in the matvec dtype (bf16 when enabled) with f32
        # accumulation — the inverses stay full precision
        # per-obs small-matrix algebra in FLAT (M, F) layout via
        # _flat_einsum: (M, i, j) einsum temporaries with small minor
        # dims would tile-pad (8, 128), up to 28x HBM blowup at 10^6+
        # observations.
        def build_precond():
            if opts.preconditioner == "block_diag":
                Scc0 = Hcc + lam * _diagonal_only(Hcc) + \
                    1e-10 * jnp.eye(6, dtype=dtype)
                Sgg0 = Hgg + lam * _diagonal_only(Hgg) + \
                    1e-10 * jnp.eye(P, dtype=dtype)
                return jnp.linalg.inv(Scc0), jnp.linalg.inv(Sgg0)
            H9_mv = Hpp_inv[prob.obs_pt].astype(Jc_mv.dtype)
            U18_mv = _flat_einsum("ka,kc->ac", (2, 6), (2, 3),
                                  Jc_mv, Jp_mv)            # J_c^T J_p
            T18_mv = _flat_einsum("ac,ce->ae", (6, 3), (3, 3),
                                  U18_mv, H9_mv)           # U Hpp^-1
            D_m = _flat_einsum("ac,bc->ab", (6, 3), (6, 3), T18_mv,
                               U18_mv, out_dtype=dtype)    # (M,36)
            Scc_corr = seg_cam(D_m).reshape(Nc, 6, 6)
            Scc = Hcc + lam * _diagonal_only(Hcc) - Scc_corr + \
                1e-10 * jnp.eye(6, dtype=dtype)
            Pc_inv = jnp.linalg.inv(Scc)
            if Ng == 1:
                Ug_mv = _flat_einsum("kp,kc->pc", (2, P), (2, 3),
                                     Ji_mv, Jp_mv)          # (M,3P)
                Tg_mv = _flat_einsum("pc,ce->pe", (P, 3), (3, 3),
                                     Ug_mv, H9_mv)
                G2 = jnp.dot(Tg_mv.T, Ug_mv,
                             preferred_element_type=dtype)  # (3P,3P)
                Sgg_corr = _psum(jnp.einsum(
                    "pcqc->pq", G2.reshape(P, 3, P, 3))[None])
            else:
                Wg = _flat_einsum("kc,kp->cp", (2, 3), (2, P),
                                  Jp_mv, Ji_mv)            # (M,3P)
                HWg = _flat_einsum("dc,cp->dp", (3, 3), (3, P),
                                   H9_mv, Wg)              # (M,3P)
                Sgg_corr = seg_grp(_flat_einsum(
                    "cp,cq->pq", (3, P), (3, P), Wg, HWg,
                    out_dtype=dtype)).reshape(Ng, P, P)
            Sgg = Hgg + lam * _diagonal_only(Hgg) - Sgg_corr + \
                1e-10 * jnp.eye(P, dtype=dtype)
            Pg_inv = jnp.linalg.inv(Sgg)
            return Pc_inv, Pg_inv

        if rebuild_precond is None:
            Pc_inv, Pg_inv = build_precond()
        else:
            # stale-on-reject reuse: only CG convergence rate is
            # affected (the operator itself uses the fresh lambda)
            Pc_inv, Pg_inv = jax.lax.cond(
                rebuild_precond, build_precond, lambda: P_state)

        def precond(vc, vg):
            return (jnp.einsum("nij,nj->ni", Pc_inv, vc),
                    jnp.einsum("nij,nj->ni", Pg_inv, vg))

        # --- PCG on the joint (cam, group) system (the vectors are
        # replicated under shard_map — plain local dots, no psum)
        def dot(ac, ag, bc_, bg_):
            return jnp.sum(ac * bc_) + jnp.sum(ag * bg_)

        x_c = jnp.zeros((Nc, 6), dtype)
        x_g = jnp.zeros((Ng, P), dtype)
        r_c, r_g = bc, bg
        z_c, z_g = precond(r_c, r_g)
        p_c, p_g = z_c, z_g
        rz = dot(r_c, r_g, z_c, z_g)
        b_norm = jnp.sqrt(dot(bc, bg, bc, bg))
        tol_eff = max(opts.cg_tol, opts.cg_eta)
        tol2 = (tol_eff * b_norm) ** 2

        def cg_cond(st):
            k, _, _, r_c, r_g, _, _, _ = st
            rr = dot(r_c, r_g, r_c, r_g)
            return (k < opts.cg_iterations) & (rr > tol2)

        def cg_body(st):
            k, x_c, x_g, r_c, r_g, p_c, p_g, rz = st
            Ap_c, Ap_g = S_matvec(p_c, p_g)
            pAp = dot(p_c, p_g, Ap_c, Ap_g)
            alpha = rz / jnp.where(jnp.abs(pAp) < 1e-30, 1e-30, pAp)
            x_c = x_c + alpha * p_c
            x_g = x_g + alpha * p_g
            r_c = r_c - alpha * Ap_c
            r_g = r_g - alpha * Ap_g
            z_c, z_g = precond(r_c, r_g)
            rz_new = dot(r_c, r_g, z_c, z_g)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
            p_c = z_c + beta * p_c
            p_g = z_g + beta * p_g
            return (k + 1, x_c, x_g, r_c, r_g, p_c, p_g, rz_new)

        st = (jnp.zeros((), jnp.int32), x_c, x_g, r_c, r_g, p_c, p_g, rz)
        st = jax.lax.while_loop(cg_cond, cg_body, st)
        dc, dg = st[1], st[2]
        dp = backsub_points(Jc12, JiP, Jp6, dc, dg, Hpp_inv, gp)
        return dc, dg, dp, (Pc_inv, Pg_inv)

    # --------------------------------------------------------- inner iters
    def refine_points(extr, intr, pts):
        """Ruhe–Wedin inner iterations: re-optimize every point block
        with cameras fixed (ref use_inner_iterations,
        bundle_adjustment.h:114). Batched 3x3 GN; a per-point cost
        guard rejects non-improving point updates, so each sweep is
        monotone non-increasing in the total cost."""
        extr_m = extr[prob.obs_cam]
        intr_m = intr[prob.obs_group]

        def f(e, i, p, pix):
            r, _ = _residual_one(opts.model_type, e, i, p, pix)
            return r

        def res(pts_):
            return jax.vmap(lambda e, i, p, pix: _residual_one(
                opts.model_type, e, i, p, pix))(
                extr_m, intr_m, pts_[prob.obs_pt], prob.obs_pix)

        def per_obs_cost(r, bad):
            s = jnp.sum(r * r, axis=-1)
            w2 = robust_weight(opts.loss, s, opts.loss_scale) ** 2
            return jnp.where(obs_valid,
                             jnp.where(bad, 1e8, w2 * s), 0.0)

        def sweep(_, carry):
            pts_, c_pt = carry
            pts_m = pts_[prob.obs_pt]
            r, bad = res(pts_)
            s = jnp.sum(r * r, axis=-1)
            w = robust_weight(opts.loss, s, opts.loss_scale)
            w = jnp.where(obs_valid & ~bad, w, 0.0)
            Jp = jax.vmap(jax.jacrev(f, argnums=2))(
                extr_m, intr_m, pts_m, prob.obs_pix)
            Jp6 = (Jp * w[:, None, None]).reshape(-1, 6)   # flat
            rw = r * w[:, None]
            # Hessian + gradient ride ONE flat segment reduction
            Hpp9_m = _flat_einsum("ka,kb->ab", (2, 3), (2, 3),
                                  Jp6, Jp6)
            gp3_m = _flat_einsum("ka,k->a", (2, 3), (2,), Jp6, rw)
            blk = seg_pt(jnp.concatenate([Hpp9_m, gp3_m], axis=1))
            Hinv = _inv3_flat(blk[:, :9], eps_diag=1e-10)
            dp_ = -_flat_einsum("ab,b->a", (3, 3), (3,), Hinv,
                                blk[:, 9:])
            if prob.point_mask is not None:
                dp_ = dp_ * prob.point_mask[:, None]
            pts_c = pts_ + dp_
            r2, bad2 = res(pts_c)
            c_new = seg_pt(per_obs_cost(r2, bad2))
            better = c_new < c_pt
            return (jnp.where(better[:, None], pts_c, pts_),
                    jnp.where(better, c_new, c_pt))

        r0_, bad0_ = res(pts)
        c0_ = seg_pt(per_obs_cost(r0_, bad0_))
        pts, _ = jax.lax.fori_loop(0, opts.inner_iterations, sweep,
                                   (pts, c0_))
        return pts

    # ----------------------------------------------------------------- LM
    def cost_and_residuals(extr, intr, pts):
        """One residual pass: total robust cost AND the raw residuals
        (reused for the next iteration's jacobian weights)."""
        def f(e, i, p, pix):
            return _residual_one(opts.model_type, e, i, p, pix)

        r, bad = jax.vmap(f)(extr[prob.obs_cam], intr[prob.obs_group],
                             pts[prob.obs_pt], prob.obs_pix)
        s = jnp.sum(r * r, axis=-1)
        w2 = robust_weight(opts.loss, s, opts.loss_scale) ** 2
        cost_m = jnp.where(bad, 1e8, w2 * s)
        cost = 0.5 * jnp.sum(jnp.where(obs_valid, cost_m, 0.0))
        return _psum(cost), r

    cost0, r0_init = cost_and_residuals(prob.extrinsics,
                                        prob.intrinsics, prob.points)

    # Under shard_map the reuse conds would nest collectives (seg_cam
    # psums) inside data-dependent control flow — always rebuild there.
    use_jac_reuse = opts.jacobian_reuse
    reuse_blocks = opts.axis_name is None and use_jac_reuse
    # precond reuse is valid WITHOUT jacobian reuse: a rejected step
    # leaves the parameters unchanged, so the rebuilt jacobians (and
    # hence the undamped blocks the preconditioner is assembled from)
    # are identical — only lambda differs, and a stale-lambda
    # preconditioner affects CG convergence rate, never correctness.
    use_precond_reuse = (opts.precond_reuse and opts.axis_name is None
                         and opts.linear_solver in ("pcg",
                                                    "dense_schur"))

    def lm_cond(st):
        return (st[0] < opts.max_iterations) & ~st[-1]

    def lm_body(st):
        (it, extr, intr, pts, lam, cost, r_cur, J_state, B_state,
         P_state, trace, prev_accepted, done) = st
        # A REJECTED step leaves (extr, intr, pts, r_cur) unchanged —
        # the weighted residuals, jacobian blocks, AND the
        # lambda-independent Hessian blocks/gradients from the previous
        # iteration are still exact, so both passes are skipped (only
        # the damped solve re-runs with the new lambda). Mirrors Ceres'
        # evaluator caching across failed trust-region steps.
        if use_jac_reuse:
            J_state = jax.lax.cond(
                prev_accepted,
                lambda: build_system(extr, intr, pts, r_cur),
                lambda: J_state)
            packed = J_state
        else:
            packed = build_system(extr, intr, pts, r_cur)
        r = packed[:, 0:2]
        Jc = packed[:, 2:14]
        Ji = packed[:, 14:14 + 2 * P]
        Jp = packed[:, 14 + 2 * P:20 + 2 * P]
        if reuse_blocks:
            B_state = jax.lax.cond(
                prev_accepted,
                lambda: make_blocks(r, Jc, Ji, Jp),
                lambda: B_state)
            blocks = B_state
        else:
            # B_state stays a dummy carry; blocks are loop-local
            blocks = make_blocks(r, Jc, Ji, Jp)
        rebuild = prev_accepted if use_precond_reuse else None
        dc, dg, dp, P_state = solve_normal_eqs(
            r, Jc, Ji, Jp, blocks, lam, P_state, rebuild)
        extr_new = extr + dc
        intr_new = intr + _expand_dg(dg)
        pts_new = pts + dp
        if opts.inner_iterations > 0 and opts.optimize_points:
            pts_new = refine_points(extr_new, intr_new, pts_new)
        new_cost, r_new = cost_and_residuals(extr_new, intr_new,
                                             pts_new)
        accept = new_cost < cost
        extr = jnp.where(accept, extr_new, extr)
        intr = jnp.where(accept, intr_new, intr)
        pts = jnp.where(accept, pts_new, pts)
        r_cur = jnp.where(accept, r_new, r_cur)
        if opts.reject_growth_aggressive:
            growth = jnp.where(new_cost > 2.0 * cost, 100.0, 10.0)
        else:
            growth = 10.0
        lam = jnp.where(accept,
                        jnp.maximum(lam * 0.33, opts.min_lambda),
                        jnp.minimum(lam * growth, opts.max_lambda))
        rel_decrease = (cost - new_cost) / jnp.maximum(cost, 1e-30)
        done = accept & (rel_decrease < opts.function_tolerance)
        cost = jnp.where(accept, new_cost, cost)
        if opts.target_cost > 0:
            done = done | (cost <= opts.target_cost)
        if opts.trace_costs:
            trace = trace.at[it].set(
                jnp.where(accept, new_cost, -new_cost))
        return (it + 1, extr, intr, pts, lam, cost, r_cur, J_state,
                B_state, P_state, trace, accept, done)

    M_obs_ = prob.obs_cam.shape[0]
    if use_jac_reuse:
        J_state0 = jnp.zeros((M_obs_, 20 + 2 * P), dtype)
    else:
        J_state0 = jnp.zeros((0,), dtype)
    if reuse_blocks:
        B_state0 = (jnp.zeros((Np, 9), dtype),
                    jnp.zeros((Nc, 6, 6), dtype),
                    jnp.zeros((Ng, P, P), dtype),
                    jnp.zeros((Nc, 6), dtype),
                    jnp.zeros((Ng, P), dtype),
                    jnp.zeros((Np, 3), dtype))
    else:
        B_state0 = (jnp.zeros((0,), dtype),) * 6
    if opts.linear_solver == "dense_schur":
        if use_precond_reuse:
            # dense corr-block reuse state (see solve_normal_eqs)
            P_state0 = (jnp.zeros((Nc * Nc, 36), dtype),
                        jnp.zeros((Nc, Ng, 6, P), dtype),
                        jnp.zeros((Ng, Ng, P, P), dtype),
                        jnp.zeros((Nc, Ng, 6, P), dtype))
        else:
            P_state0 = (jnp.zeros((0,), dtype),)
    else:
        P_state0 = (jnp.zeros((Nc, 6, 6), dtype),
                    jnp.zeros((Ng, P, P), dtype))
    trace0 = (jnp.zeros((opts.max_iterations,), dtype)
              if opts.trace_costs else jnp.zeros((0,), dtype))
    st0 = (jnp.zeros((), jnp.int32), prob.extrinsics, prob.intrinsics,
           prob.points, jnp.asarray(opts.initial_lambda, dtype), cost0,
           r0_init, J_state0, B_state0, P_state0, trace0,
           jnp.ones((), bool), jnp.zeros((), bool))
    st = jax.lax.while_loop(lm_cond, lm_body, st0)
    it, extr, intr, pts, lam, cost = st[0], st[1], st[2], st[3], \
        st[4], st[5]

    out = prob._replace(extrinsics=extr, intrinsics=intr, points=pts)
    return out, BASummary(initial_cost=cost0, final_cost=cost,
                          num_iterations=it, final_lambda=lam,
                          cost_trace=(st[10] if opts.trace_costs
                                      else None))


def _diagonal_only(A):
    """Zero off-diagonals of (..., K, K) blocks."""
    K = A.shape[-1]
    return A * jnp.eye(K, dtype=A.dtype)


@functools.lru_cache(maxsize=None)
def _flat_einsum_mats(spec: str, xs: tuple, ys: tuple):
    """One-hot expansion/reduction matrices for per-row small-matrix
    einsums on FLAT storage (see _flat_einsum). Returns NUMPY arrays —
    device constants must be created per-trace (a cached jnp array
    created inside a lax.while_loop body leaks its tracer)."""
    import itertools
    xterm, rest = spec.split(",")
    yterm, oterm = rest.split("->")
    sizes = {}
    for t, sh in ((xterm, xs), (yterm, ys)):
        assert len(t) == len(sh), (spec, xs, ys)
        for ch, n in zip(t, sh):
            sizes[ch] = int(n)
    contracted = []
    for ch in xterm + yterm:
        if ch not in oterm and ch not in contracted:
            contracted.append(ch)
    combo = list(oterm) + contracted
    csizes = [sizes[ch] for ch in combo]
    osizes = [sizes[ch] for ch in oterm]
    C = int(np.prod(csizes)) if csizes else 1
    X, Y = int(np.prod(xs)), int(np.prod(ys))
    O = int(np.prod(osizes)) if osizes else 1
    EX = np.zeros((X, C), np.float32)
    EY = np.zeros((Y, C), np.float32)
    R = np.zeros((C, O), np.float32)
    for ci, idx in enumerate(
            itertools.product(*[range(s) for s in csizes])):
        a = dict(zip(combo, idx))
        xi = np.ravel_multi_index(tuple(a[ch] for ch in xterm), xs)
        yi = np.ravel_multi_index(tuple(a[ch] for ch in yterm), ys)
        oi = (np.ravel_multi_index(tuple(a[ch] for ch in oterm), osizes)
              if oterm else 0)
        EX[xi, ci] = 1
        EY[yi, ci] = 1
        R[ci, oi] = 1
    return EX, EY, R


def _flat_einsum(spec, xs, ys, x, y, out_dtype=None):
    """Per-row einsum of small matrices stored FLAT: x is (M, prod(xs))
    viewed as shape xs per row (row-major), same for y; returns
    (M, prod(out)) flat.

    Computed as (x @ EX) * (y @ EY) @ R with one-hot expansion matrices
    — three MXU matmuls and one (M, C) temporary with C ~ 36..180,
    instead of (M, i, j) einsum temporaries whose small minor dims XLA
    tile-pads to (8, 128) (up to 28x HBM blowup at millions of rows).
    `spec` uses single-char axes over the PER-ROW dims only, e.g.
    "ka,kc->ac" for J_c^T J_p with xs=(2, 6), ys=(2, 3)."""
    cd = x.dtype
    EX, EY, R = _flat_einsum_mats(spec, tuple(int(s) for s in xs),
                                  tuple(int(s) for s in ys))
    g = (jnp.dot(x, jnp.asarray(EX, cd), preferred_element_type=cd) *
         jnp.dot(y.astype(cd), jnp.asarray(EY, cd),
                 preferred_element_type=cd))
    return jnp.dot(g, jnp.asarray(R, cd),
                   preferred_element_type=out_dtype or cd)


def _pair_expand_mats(dtype):
    """Expansion matrices for the camera-pair block product
    out[6a+b] = sum_c T[3a+c] * U[3b+c] (see _flat_einsum)."""
    EX, EY, R = _flat_einsum_mats("ac,bc->ab", (6, 3), (6, 3))
    return (jnp.asarray(EX, dtype), jnp.asarray(EY, dtype),
            jnp.asarray(R, dtype))


_TRANS36 = np.arange(36).reshape(6, 6).T.reshape(-1)  # 6a+b <-> 6b+a


def _dense_schur_corr_fast(prob: BAProblem, Jc12, Ji2P, Jp6, Hpp_inv,
                           seg_pt, seg_cam_local, dtype):
    """Schur correction blocks via the static camera-pair tables
    (Ng == 1 fast path; see add_cam_pair_tables).

    Returns LOCAL (un-psum'ed) corr_cc_flat (Nc*Nc, 36),
    corr_cg (Nc, 1, 6, P), corr_gg (1, 1, P, P).

    Strict upper (k < l) pair products are computed as flat-row gathers
    + one-hot expansion matmuls + a block-summing matmul; the diagonal
    is a per-camera segment reduction of the per-obs blocks; the lower
    triangle comes from symmetry. The class results are redistributed
    into (Nc*Nc, 36) by two permutation GATHERS — zero scatters.

    All inputs arrive FLAT: Jc12 (M, 12), Ji2P (M, 2P), Jp6 (M, 6),
    Hpp_inv (Np, 9).
    """
    Nc = prob.extrinsics.shape[0]
    P = Ji2P.shape[1] // 2   # active-compressed group-param count
    H9_m = Hpp_inv[prob.obs_pt]                            # (3,3) rows
    U18 = _flat_einsum("ka,kc->ac", (2, 6), (2, 3), Jc12, Jp6,
                       out_dtype=dtype)                    # J_c^T J_p
    T18 = _flat_einsum("ac,ce->ae", (6, 3), (3, 3), U18, H9_m,
                       out_dtype=dtype)                    # U Hpp^-1
    EA, EB, S = _pair_expand_mats(dtype)

    outs = []
    for kidx, lidx, vmask in prob.cam_pair_tables:
        Pc, cap = kidx.shape
        Tk = T18[kidx.reshape(-1)] @ EA                    # (Pc*cap,108)
        Ul = U18[lidx.reshape(-1)] @ EB
        g = Tk * Ul * vmask.reshape(-1, 1).astype(dtype)
        # reduce over the cap entries AND the c index in one matmul
        Sbig = jnp.tile(S, (cap, 1))                       # (cap*108,36)
        outs.append(jnp.dot(g.reshape(Pc, cap * 108), Sbig,
                            preferred_element_type=dtype))
    # diagonal blocks: per-obs T_m U_m^T (the k == l entries), reduced
    # per camera — appended to the row pool in builder row order
    D36 = _flat_einsum("ac,bc->ab", (6, 3), (6, 3), T18, U18,
                       out_dtype=dtype)                    # (M,36)
    outs.append(seg_cam_local(D36).reshape(Nc, 36))
    outs.append(jnp.zeros((1, 36), dtype))                 # pad target
    out_cat = jnp.concatenate(outs, axis=0)

    def perm_reduce(perm):
        """sum_s out_cat[perm[:, s]] with the row gather CHUNKED: one
        monolithic (Nc^2, S)-row gather hangs the TPU runtime at
        ~300k+ rows (isolated & reproduced on v5e — the worker wedges
        for ~20min); ~64k-row chunks behave."""
        R, S = perm.shape
        CH = 1 << 16
        nch = -(-R // CH)
        permp = (jnp.pad(perm, ((0, nch * CH - R), (0, 0)))
                 if nch * CH != R else perm)

        def chunk(i, acc):
            pc = jax.lax.dynamic_slice_in_dim(permp, i * CH, CH, 0)
            g = out_cat[pc[:, 0]]
            for s in range(1, S):
                g = g + out_cat[pc[:, s]]
            return jax.lax.dynamic_update_slice(acc, g, (i * CH, 0))

        out = jnp.zeros((nch * CH, 36), dtype)
        return jax.lax.fori_loop(0, nch, chunk, out)[:R]

    acc = perm_reduce(prob.cam_pair_perm_fwd)
    rev = perm_reduce(prob.cam_pair_perm_rev)
    acc = acc + rev[:, _TRANS36]
    # ---- group-coupled corrections (single shared intrinsics group):
    # corr_cg[cam(k)] += T_k (sum_l Ug_l)^T ; corr_gg = sum_n GT_n GU_n^T
    Ug3P = _flat_einsum("kp,kc->pc", (2, P), (2, 3), Ji2P, Jp6,
                        out_dtype=dtype)                   # (M,3P)
    Tg3P = _flat_einsum("pc,ce->pe", (P, 3), (3, 3), Ug3P, H9_m,
                        out_dtype=dtype)
    GU = seg_pt(Ug3P)                                      # (Np,3P)
    GT = seg_pt(Tg3P)
    # corr_gg[p,q] = sum_n sum_c GT[n,3p+c] GU[n,3q+c]: one (3P,3P)
    # contraction over points, then a diagonal extraction
    G2 = jnp.dot(GT.T, GU, preferred_element_type=dtype)   # (3P,3P)
    corr_gg = jnp.einsum("pcqc->pq",
                         G2.reshape(P, 3, P, 3))[None, None]
    CmP = _flat_einsum("ac,pc->ap", (6, 3), (P, 3), T18,
                       GU[prob.obs_pt], out_dtype=dtype)   # (M,6P)
    corr_cg = seg_cam_local(CmP).reshape(Nc, 1, 6, P)
    return acc, corr_cg, corr_gg


def build_cam_pair_tables(obs_cam, pt_idx_map, pt_idx_valid, n_cams,
                          classes=(4, 16, 64, 256, 1024),
                          max_entries=1 << 20):
    """Host-side static analysis for the dense-Schur assembly.

    Enumerates the STRICT upper (k < l) per-point observation pairs,
    groups them by ordered (cam_k, cam_l) pair, buckets groups into
    count classes laid out as dense (P_c, cap) gather tables (classes
    bigger than `max_entries` slots split into chunks so no device
    temporary exceeds ~max_entries*432B; groups over the largest cap
    spill across rows). The k == l entries are exactly the per-obs
    diagonal blocks — covered by a per-camera segment reduction row
    block that the device code appends after the table rows — and the
    lower triangle is the transpose of the upper by the symmetry of the
    Schur correction.

    Returns (tables, perm_fwd, perm_rev): tables is a tuple of
    (kidx, lidx, valid) arrays; perm_fwd/perm_rev are (Nc*Nc, R) int32
    row indices into [table rows | Nc diagonal rows | 1 zero row] such
    that corr_flat = sum_r pool[perm_fwd[:, r]]
                   + (sum_r pool[perm_rev[:, r]])[:, transpose36].
    """
    idx = np.asarray(pt_idx_map)
    val = np.asarray(pt_idx_valid)
    Np, K = idx.shape
    cam = np.asarray(obs_cam)[idx]
    iu, ju = np.triu_indices(K, k=1)
    k_e = idx[:, iu].reshape(-1)
    l_e = idx[:, ju].reshape(-1)
    v_e = (val[:, iu] & val[:, ju]).reshape(-1)
    pid = (cam[:, iu].astype(np.int64) * n_cams +
           cam[:, ju]).reshape(-1)
    k_e, l_e, pid = k_e[v_e], l_e[v_e], pid[v_e]
    order = np.argsort(pid, kind="stable")
    k_e, l_e, pid = k_e[order], l_e[order], pid[order]
    uids, starts, counts = np.unique(pid, return_index=True,
                                     return_counts=True)
    E, U = len(pid), len(uids)
    caps = np.asarray(classes)
    capmax = classes[-1]
    cls = np.searchsorted(caps, np.minimum(np.maximum(counts, 1),
                                           capmax))
    cap_u = caps[cls]
    nrows_u = -(-counts // cap_u)
    u_of_e = np.repeat(np.arange(U), counts)
    rank = np.arange(E) - np.repeat(starts, counts)
    tables = []
    row_ids = []  # ordered-pair id of every produced table row
    for ci, cap in enumerate(classes):
        sel_u = np.flatnonzero(cls == ci)
        if len(sel_u) == 0:
            continue
        nrows = nrows_u[sel_u]
        row_base = np.zeros(len(sel_u), np.int64)
        np.cumsum(nrows[:-1], out=row_base[1:])
        P_c = int(nrows.sum())
        e_idx = np.flatnonzero(cls[u_of_e] == ci)
        lu = np.searchsorted(sel_u, u_of_e[e_idx])
        r = rank[e_idx]
        row = row_base[lu] + r // cap
        col = r % cap
        kk = np.zeros((P_c, cap), np.int32)
        ll = np.zeros((P_c, cap), np.int32)
        vv = np.zeros((P_c, cap), bool)
        kk[row, col] = k_e[e_idx]
        ll[row, col] = l_e[e_idx]
        vv[row, col] = True
        # per-row pair ids (spilled groups repeat the id; ids sorted
        # ascending within the class, so forward-fill by running max)
        rid = np.zeros(P_c, np.int64)
        rid[row_base] = uids[sel_u]
        filled = np.zeros(P_c, bool)
        filled[row_base] = True
        np.maximum.accumulate(np.where(filled, rid, 0), out=rid)
        rows_per_chunk = max(1, max_entries // cap)
        for s in range(0, P_c, rows_per_chunk):
            e = min(s + rows_per_chunk, P_c)
            tables.append((jnp.asarray(kk[s:e]), jnp.asarray(ll[s:e]),
                           jnp.asarray(vv[s:e])))
            row_ids.append(rid[s:e])
    n_table_rows = int(sum(len(r) for r in row_ids))
    zero_row = n_table_rows + n_cams
    # forward targets: table rows at their ordered-pair id, then the Nc
    # diagonal segment rows at ids i*Nc+i
    diag_ids = (np.arange(n_cams, dtype=np.int64) * (n_cams + 1))
    fwd_ids = np.concatenate([np.concatenate(row_ids)
                              if row_ids else np.zeros(0, np.int64),
                              diag_ids])
    perm_fwd, _ = _build_idx_map(fwd_ids.astype(np.int64),
                                 n_cams * n_cams, zero_row,
                                 bucket_min=1)
    # reverse targets (transpose): table rows only, at (b*Nc + a)
    tab_ids = fwd_ids[:n_table_rows]
    rev_ids = (tab_ids % n_cams) * n_cams + tab_ids // n_cams
    perm_rev, _ = _build_idx_map(rev_ids.astype(np.int64),
                                 n_cams * n_cams, zero_row,
                                 bucket_min=1)
    return (tuple(tables), jnp.asarray(perm_fwd),
            jnp.asarray(perm_rev))


def add_cam_pair_tables(prob: BAProblem,
                        classes=(4, 16, 64, 256, 1024),
                        max_entries=1 << 20,
                        build_cam_maps=True) -> BAProblem:
    """Attach the camera-pair gather tables that switch dense-Schur
    assembly to the scatter-free fast path (host-side; call after
    add_point_obs_map / pad_ba_problem). build_cam_maps also attaches
    the per-camera observation tables so every camera segment
    reduction (incl. the diagonal blocks here) is gather-based."""
    if prob.pt_idx_map is None:
        raise ValueError("add_cam_pair_tables requires pt_idx_map — "
                         "call add_point_obs_map first")
    tables, perm_fwd, perm_rev = build_cam_pair_tables(
        prob.obs_cam, prob.pt_idx_map, prob.pt_idx_valid,
        prob.extrinsics.shape[0], classes=classes,
        max_entries=max_entries)
    out = prob._replace(cam_pair_tables=tables,
                        cam_pair_perm_fwd=perm_fwd,
                        cam_pair_perm_rev=perm_rev)
    if build_cam_maps and prob.cam_idx_map is None:
        M = prob.obs_cam.shape[0]
        cm_, cv_ = _build_idx_map(
            np.asarray(prob.obs_cam), prob.extrinsics.shape[0], M - 1,
            obs_valid=np.asarray(prob.obs_mask))
        out = out._replace(cam_idx_map=jnp.asarray(cm_),
                           cam_idx_valid=jnp.asarray(cv_))
    return out


def _dense_schur_corr(prob: BAProblem, opts: BAOptions, Jc12, JiP, Jp6,
                      Hpp_inv, _psum, seg_pt=None, seg_cam_local=None):
    """Assemble the correction blocks of the reduced camera system.

    Per-obs inputs arrive FLAT (Jc12 (M, 12), JiP (M, 2P), Jp6 (M, 6),
    Hpp_inv (Np, 9)); the chunked generic path views them rank-3
    locally (chunk temporaries are bounded).

    S = [Hcc  Hcg] - [Hcp] Hpp^-1 [Hpc Hpg]
        [Hgc  Hgg]   [Hgp]

    Returns (corr_cc_flat (Nc*Nc, 36), corr_cg (Nc, Ng, 6, P),
    corr_gg (Ng, Ng, P, P), Hcg (Nc, Ng, 6, P)) — everything except the
    damped diagonal, the RHS, and the factorization. This is the
    expensive part of the dense solve, and the part that can be REUSED
    with a stale lambda across rejected LM steps (opts.precond_reuse).

    ref DENSE_SCHUR (Ceres linear_solver_type; bundle_adjustment.h:85-87
    recommends the iterative solver only beyond ~1000 cameras). The
    correction blocks couple cameras that observe a COMMON point, so
    they are assembled per point from the (Np, Kmax) observation table
    `pt_idx_map`: for point n with observations k, l the pair block is
    U_k Hpp_inv U_l^T with U = Jc^T Jp (6x3). The per-pair blocks are
    reduced with one segment_sum keyed on the flattened (cam_k, cam_l)
    pair index — scatter once per LM iteration instead of per CG
    iteration, and the whole solve then rides the MXU (Cholesky).

    Padded table slots carry valid=False and their U rows are zeroed, so
    they contribute nothing wherever their pair index lands.

    Under shard_map (axis_name set) points are device-local: the
    assembled blocks are psum'ed, then every device runs the same
    replicated factorization.
    """
    if prob.pt_idx_map is None:
        raise ValueError(
            "linear_solver='dense_schur' requires pt_idx_map — build "
            "the problem with add_point_obs_map/pad_ba_problem("
            "build_point_obs_map=True)")
    Nc = prob.extrinsics.shape[0]
    Ng = prob.intrinsics.shape[0]
    P = JiP.shape[1] // 2   # active-compressed group-param count
    dtype = prob.points.dtype

    # Hcg (lambda-independent; exact even when reused)
    if Ng == 1 and seg_cam_local is not None:
        Hcg_flat = _flat_einsum("ka,kb->ab", (2, 6), (2, P),
                                Jc12, JiP, out_dtype=dtype)  # (M,6P)
        Hcg = _psum(seg_cam_local(Hcg_flat)).reshape(Nc, Ng, 6, P)
    else:
        Hcg = _psum(jax.ops.segment_sum(
            _flat_einsum("ka,kb->ab", (2, 6), (2, P), Jc12, JiP,
                         out_dtype=dtype),
            prob.obs_cam * Ng + prob.obs_group,
            num_segments=Nc * Ng).reshape(Nc, Ng, 6, P))

    idx = prob.pt_idx_map                                  # (Np, K)
    K = idx.shape[1]

    if (prob.cam_pair_tables is not None and Ng == 1 and
            seg_pt is not None and seg_cam_local is not None):
        # scatter-free assembly via static camera-pair gather tables
        acc_cc, corr_cg, corr_gg = _dense_schur_corr_fast(
            prob, Jc12, JiP, Jp6, Hpp_inv, seg_pt, seg_cam_local,
            dtype)
        return (_psum(acc_cc), _psum(corr_cg), _psum(corr_gg), Hcg)

    # per-obs camera-point and group-point coupling blocks (flat rows;
    # the chunked loop below views the gathered chunks rank-3)
    U = _flat_einsum("ka,kb->ab", (2, 6), (2, 3), Jc12, Jp6)  # (M,18)
    Ug = _flat_einsum("ka,kb->ab", (2, P), (2, 3), JiP, Jp6)  # (M,3P)

    # The per-point pair blocks are assembled in CHUNKS of points under
    # a fori_loop: an unchunked (Np, K, K, 6, 6) temporary would be
    # tile-padded 28x by XLA ((6,6) minor dims -> (8,128)) — 8.5GB at
    # Notre-Dame scale. Per-chunk temporaries stay ~100-500MB.
    CH = min(4096, idx.shape[0])
    nch = -(-idx.shape[0] // CH)
    pad_n = nch * CH - idx.shape[0]

    def padn(x, fill=0):
        return jnp.pad(x, [(0, pad_n)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill) if pad_n else x

    idx_p = padn(idx)
    val_p = padn(prob.pt_idx_valid).astype(dtype)
    Hppi_p = padn(Hpp_inv)
    camn_p = prob.obs_cam[idx_p]                           # (Np',K)
    grpn_p = prob.obs_group[idx_p]

    acc0 = (jnp.zeros((Nc * Nc, 36), dtype),
            jnp.zeros((Nc * Ng, 6 * P), dtype),
            jnp.zeros((Ng * Ng, P * P), dtype))

    def chunk_body(i, acc):
        a_cc, a_cg, a_gg = acc
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i * CH, CH)
        ic, vc = sl(idx_p), sl(val_p)
        camc, grpc = sl(camn_p), sl(grpn_p)
        Uc = (U[ic].reshape(CH, K, 6, 3) *
              vc[..., None, None])                         # (CH,K,6,3)
        Ugc = (Ug[ic].reshape(CH, K, P, 3) *
               vc[..., None, None])                        # (CH,K,P,3)
        Hi = sl(Hppi_p).reshape(CH, 3, 3)                  # (CH,3,3)
        T = jnp.einsum("nkab,nbc->nkac", Uc, Hi)           # (CH,K,6,3)
        Bcc = jnp.einsum("nkac,nlbc->nklab", T, Uc,
                         preferred_element_type=dtype)     # (CH,K,K,6,6)
        pid = (camc[:, :, None] * Nc + camc[:, None, :]).reshape(-1)
        a_cc = a_cc + jax.ops.segment_sum(
            Bcc.reshape(-1, 36), pid, num_segments=Nc * Nc)
        Tg = jnp.einsum("nkab,nbc->nkac", Ugc, Hi)         # (CH,K,P,3)
        if Ng == 1:
            # single shared group (the common case): collapse the group
            # observation axis inside the einsums
            Bcg = jnp.einsum("nkac,nlbc->nkab", T, Ugc,
                             preferred_element_type=dtype)  # (CH,K,6,P)
            a_cg = a_cg + jax.ops.segment_sum(
                Bcg.reshape(-1, 6 * P), camc.reshape(-1),
                num_segments=Nc)
            a_gg = a_gg + jnp.einsum(
                "nkac,nlbc->ab", Tg, Ugc,
                preferred_element_type=dtype).reshape(1, P * P)
        else:
            Bcg = jnp.einsum("nkac,nlbc->nklab", T, Ugc,
                             preferred_element_type=dtype)
            pid_cg = (camc[:, :, None] * Ng +
                      grpc[:, None, :]).reshape(-1)
            a_cg = a_cg + jax.ops.segment_sum(
                Bcg.reshape(-1, 6 * P), pid_cg, num_segments=Nc * Ng)
            Bgg = jnp.einsum("nkac,nlbc->nklab", Tg, Ugc,
                             preferred_element_type=dtype)
            pid_gg = (grpc[:, :, None] * Ng +
                      grpc[:, None, :]).reshape(-1)
            a_gg = a_gg + jax.ops.segment_sum(
                Bgg.reshape(-1, P * P), pid_gg, num_segments=Ng * Ng)
        return a_cc, a_cg, a_gg

    acc = jax.lax.fori_loop(0, nch, chunk_body, acc0)
    return (_psum(acc[0]),                                # (Nc*Nc, 36)
            _psum(acc[1]).reshape(Nc, Ng, 6, P),
            _psum(acc[2]).reshape(Ng, Ng, P, P),
            Hcg)


def _dense_schur_factor_solve(prob: BAProblem, opts: BAOptions,
                              Hcc, Hgg, bc, bg, lam,
                              corr_cc_flat, corr_cg, corr_gg, Hcg):
    """Assemble the damped reduced camera system from the correction
    blocks and solve it with a Cholesky factorization."""
    Nc = prob.extrinsics.shape[0]
    Ng = prob.intrinsics.shape[0]
    P = Hcg.shape[3]   # active-compressed group-param count
    dtype = prob.points.dtype

    # assemble the dense system (6Nc+P*Ng square).
    # The damped block-diagonal folds into the FLAT pair accumulator
    # (diag pair ids ci*Nc+ci), and the (Nc*Nc, 36) -> (6Nc, 6Nc)
    # block un-flattening runs in camera-row chunks: one full
    # (Nc, Nc, 6, 6) view would tile-pad (6,6)->(8,128), 19GB at 2152
    # cameras.
    diag_c = Hcc + lam * _diagonal_only(Hcc)
    Acc_flat = (-corr_cc_flat).at[
        jnp.arange(Nc) * (Nc + 1)].add(diag_c.reshape(Nc, 36))
    Agg = -corr_gg
    diag_g = Hgg + lam * _diagonal_only(Hgg)
    Agg = Agg.at[jnp.arange(Ng), jnp.arange(Ng)].add(diag_g)
    Acg = Hcg - corr_cg

    Dc, Dg = 6 * Nc, P * Ng
    RC = min(128, Nc)
    nrc = -(-Nc // RC)
    pad_rc = nrc * RC - Nc
    if pad_rc:
        Acc_flat = jnp.pad(Acc_flat, ((0, pad_rc * Nc), (0, 0)))

    def unflatten_rows(i, A):
        blk = jax.lax.dynamic_slice_in_dim(Acc_flat, i * RC * Nc,
                                           RC * Nc, 0)
        blk = blk.reshape(RC, Nc, 6, 6).transpose(0, 2, 1, 3)
        return jax.lax.dynamic_update_slice(
            A, blk.reshape(RC * 6, Dc), (i * RC * 6, 0))

    Acc2d = jax.lax.fori_loop(
        0, nrc, unflatten_rows,
        jnp.zeros((nrc * RC * 6, Dc), dtype))[:Dc]

    top = jnp.concatenate([
        Acc2d,
        Acg.transpose(0, 2, 1, 3).reshape(Dc, Dg)], axis=1)
    bot = jnp.concatenate([
        Acg.transpose(1, 3, 0, 2).reshape(Dg, Dc),
        Agg.transpose(0, 2, 1, 3).reshape(Dg, Dg)], axis=1)
    A = jnp.concatenate([top, bot], axis=0)
    b = jnp.concatenate([bc.reshape(-1), bg.reshape(-1)])

    # masked cameras / non-optimized intrinsics slots / padding have
    # all-zero rows: pin them to identity so the factorization is
    # well-posed (their rhs is zero -> zero step).
    d = jnp.diagonal(A)
    fix = (jnp.abs(d) < 1e-12).astype(dtype)
    A = A + jnp.diag(fix)

    L, lower = jax.scipy.linalg.cho_factor(A, lower=True)
    x = jax.scipy.linalg.cho_solve((L, lower), b)
    # a failed factorization yields NaNs -> the LM accept/reject loop
    # rejects the step and raises lambda (same recovery as Ceres).
    dc = x[:Dc].reshape(Nc, 6)
    dg = x[Dc:].reshape(Ng, P)
    return dc, dg


def pad_obs_to_multiple(prob: BAProblem, multiple: int) -> BAProblem:
    """Append masked observations so M % multiple == 0 (keeps obs_pt
    non-decreasing by repeating the last point index). Host-side."""
    M = prob.obs_cam.shape[0]
    pad = (-M) % multiple
    if pad == 0:
        return prob
    last_pt = int(np.asarray(prob.obs_pt[-1])) if M else 0

    def padrows(x, fill):
        full = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, full])

    return prob._replace(
        obs_cam=padrows(prob.obs_cam, 0),
        obs_group=padrows(prob.obs_group, 0),
        obs_pt=padrows(prob.obs_pt, last_pt),
        obs_pix=padrows(prob.obs_pix, 0.0),
        obs_mask=padrows(prob.obs_mask, False))


def add_pallas_matvec_plan(prob: BAProblem,
                           block: int = 1024) -> BAProblem:
    """Attach the fused Pallas matvec tile arrays (host-side; see
    pallas_matvec.py). Requires point-sorted observations and
    M % block == 0 (use pad_obs_to_multiple first). The solver uses
    them when BAOptions.pallas_matvec is set."""
    from .pallas_matvec import MatvecPlan
    plan = MatvecPlan(np.asarray(prob.obs_cam),
                      np.asarray(prob.obs_pt),
                      prob.extrinsics.shape[0], prob.points.shape[0],
                      block=block)
    return prob._replace(pmv_cam_tiles=jnp.asarray(plan.cam_tiles),
                         pmv_lpt_tiles=jnp.asarray(plan.local_pt),
                         pmv_p0=jnp.asarray(plan.tile_p0),
                         pmv_window=jnp.zeros((plan.W,), jnp.int8))


def add_point_obs_map(prob: BAProblem, bucket_min: int = 4) -> BAProblem:
    """Attach the (Np, Kmax) per-point observation table — required by
    linear_solver='dense_schur' and the fast gather-based point
    reductions (host-side; call before jit)."""
    Np = prob.points.shape[0]
    M = prob.obs_pt.shape[0]
    idx_map, valid = _build_idx_map(
        np.asarray(prob.obs_pt), Np, M - 1, bucket_min=bucket_min,
        obs_valid=np.asarray(prob.obs_mask))
    # padding slots must not contribute even though they index a real
    # observation: valid=False zeroes their blocks.
    return prob._replace(pt_idx_map=jnp.asarray(idx_map),
                         pt_idx_valid=jnp.asarray(valid))


# --------------------------------------------------------------------------
# Bucketed execution: pad every axis to power-of-two buckets so repeated
# solves with ragged sizes (incremental pipeline grows by one camera at a
# time) reuse the jit cache instead of recompiling (utils/padding
# discipline).

def _build_idx_map(indices: np.ndarray, num_segments: int,
                   pad_target: int, bucket_min: int = 4,
                   obs_valid: Optional[np.ndarray] = None):
    """Host-side inverse map: for each segment, the (padded) list of
    observation indices. Padding slots point at `pad_target` (a masked
    observation) with valid=False. Masked observations (obs_valid
    False, e.g. problem padding) are excluded — otherwise the segment
    they all pad into inflates Kmax for every segment."""
    from ...utils import next_bucket
    if obs_valid is not None:
        keep = np.flatnonzero(np.asarray(obs_valid))
    else:
        keep = np.arange(len(indices))
    kept_idx = indices[keep]
    counts = np.bincount(kept_idx, minlength=num_segments)
    kmax = next_bucket(int(counts.max()) if counts.size else 1,
                       bucket_min)
    order = np.argsort(kept_idx, kind="stable")
    idx_map = np.full((num_segments, kmax), pad_target, np.int32)
    valid = np.zeros((num_segments, kmax), bool)
    starts = np.zeros(num_segments + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    sorted_idx = kept_idx[order]
    ranks = np.arange(len(order)) - starts[sorted_idx]
    idx_map[sorted_idx, ranks] = keep[order]
    valid[sorted_idx, ranks] = True
    return idx_map, valid


def pad_ba_problem(prob: BAProblem, minimum: int = 8,
                   sort_by_point: bool = True,
                   build_reduction_maps: bool = False,
                   sort_by_camera: bool = False,
                   build_point_obs_map: bool = False) -> BAProblem:
    from ...utils import next_bucket

    if sort_by_point and prob.obs_pt.shape[0] > 0:
        order = jnp.argsort(prob.obs_pt)
        prob = prob._replace(
            obs_cam=prob.obs_cam[order], obs_group=prob.obs_group[order],
            obs_pt=prob.obs_pt[order], obs_pix=prob.obs_pix[order],
            obs_mask=prob.obs_mask[order])

    Nc, Ng, Np, M = (prob.extrinsics.shape[0], prob.intrinsics.shape[0],
                     prob.points.shape[0], prob.obs_cam.shape[0])
    Ncb, Ngb = next_bucket(Nc, minimum), next_bucket(Ng, 1)
    Npb, Mb = next_bucket(Np, 64), next_bucket(M, 256)
    dtype = prob.points.dtype

    def padrows(x, n, fill=0.0):
        if x.shape[0] == n:
            return x
        pad = jnp.full((n - x.shape[0],) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, pad])

    cam_mask = (prob.cam_mask if prob.cam_mask is not None
                else jnp.ones(Nc, bool))
    point_mask = (prob.point_mask if prob.point_mask is not None
                  else jnp.ones(Np, bool))
    # padded points sit at z=1 to avoid cheirality branches mattering;
    # they have no observations so they contribute nothing.
    points = padrows(prob.points, Npb)
    intr = padrows(prob.intrinsics, Ngb, 1.0)
    obs_cam_p = padrows(prob.obs_cam, Mb)
    obs_group_p = padrows(prob.obs_group, Mb)
    # pad with the LAST point index so obs_pt stays non-decreasing
    # (enables indices_are_sorted in the point segment reductions)
    obs_pt_p = padrows(prob.obs_pt, Mb, Npb - 1)

    maps = {}
    if sort_by_camera and M > 0 and not build_reduction_maps:
        # duplicate index arrays for sorted camera-side segment_sums
        # (padding obs carry obs_cam=0 and zeroed values — harmless)
        perm = np.argsort(np.asarray(obs_cam_p), kind="stable")
        maps.update(
            cam_sort_perm=jnp.asarray(perm, jnp.int32),
            obs_cam_sorted=jnp.asarray(np.asarray(obs_cam_p)[perm],
                                       jnp.int32))
    if build_reduction_maps and M > 0:
        # scatter-free reduction maps (padding obs at index Mb-1 which is
        # masked whenever Mb > M; when Mb == M the targets are valid but
        # idx_valid masks the padded slots anyway)
        cm_, cv_ = _build_idx_map(np.asarray(obs_cam_p[:M]), Ncb, Mb - 1)
        gm_, gv_ = _build_idx_map(np.asarray(obs_group_p[:M]), Ngb,
                                  Mb - 1)
        maps = dict(
            cam_idx_map=jnp.asarray(cm_), cam_idx_valid=jnp.asarray(cv_),
            grp_idx_map=jnp.asarray(gm_), grp_idx_valid=jnp.asarray(gv_),
        )

    out = BAProblem(
        extrinsics=padrows(prob.extrinsics, Ncb),
        intrinsics=intr,
        points=points,
        obs_cam=obs_cam_p,
        obs_group=obs_group_p,
        obs_pt=obs_pt_p,
        obs_pix=padrows(prob.obs_pix, Mb),
        obs_mask=padrows(prob.obs_mask, Mb, False),
        cam_mask=padrows(cam_mask, Ncb, False),
        point_mask=padrows(point_mask, Npb, False),
        **maps,
    )
    if build_point_obs_map:
        out = add_point_obs_map(out)
    return out


@functools.lru_cache(maxsize=None)
def jitted_bundle_adjust(opts: BAOptions):
    """Cached jit of bundle_adjust for a static options object."""
    return jax.jit(lambda p: bundle_adjust(p, opts))


def bundle_adjust_host_f64(prob: BAProblem, opts: BAOptions):
    """Final-polish BA on the host CPU backend in float64.

    TPUs are f32-native (f64 is unsupported on this runner); the final
    LM iterations of a converged reconstruction can be re-run in f64 on
    the host CPU to squeeze out f32 convergence residue. Measured on
    fountain-11 the f32 TPU pipeline already matches the reference
    (median 2.04mm vs published 2.0mm), so this is belt-and-braces for
    ill-conditioned scenes; it mirrors the reference, where Ceres runs
    everything in double. Cost: a few seconds for fountain-scale.
    """
    cpu = jax.devices("cpu")[0]
    with jax.enable_x64(True):
        with jax.default_device(cpu):
            def to64(x):
                if x is None:
                    return None
                if isinstance(x, tuple):
                    return tuple(to64(e) for e in x)
                arr = np.asarray(x)
                if arr.dtype == np.float32:
                    arr = arr.astype(np.float64)
                return jnp.asarray(arr)

            prob64 = BAProblem(*[to64(f) for f in prob])
            out, summary = jitted_bundle_adjust(opts)(prob64)
            out = jax.tree.map(
                lambda x: np.asarray(x) if x is not None else None, out,
                is_leaf=lambda x: x is None)
    return out, summary


def bundle_adjust_bucketed(prob: BAProblem, opts: BAOptions):
    """Pad to buckets (sorted by point), run the cached jitted solver,
    slice back.

    Inherits the caller's matmul precision (utils/precision.py policy:
    platform default — measured accuracy-neutral end-to-end on the
    fountain-11 TPU gate)."""
    Nc, Np = prob.extrinsics.shape[0], prob.points.shape[0]
    padded = pad_ba_problem(prob)
    opts = dataclasses.replace(opts, point_indices_sorted=True)
    if (opts.pallas_matvec and padded.intrinsics.shape[0] == 1 and
            padded.obs_cam.shape[0] % 1024 == 0):
        padded = add_pallas_matvec_plan(padded, block=1024)
    out, summary = jitted_bundle_adjust(opts)(padded)
    result = prob._replace(extrinsics=out.extrinsics[:Nc],
                           intrinsics=out.intrinsics[
                               :prob.intrinsics.shape[0]],
                           points=out.points[:Np])
    return result, summary
