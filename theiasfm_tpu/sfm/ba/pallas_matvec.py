"""Pallas fused Schur-complement matvec for the BA CG loop.

The XLA formulation of S @ v (bundle_adjustment.py S_matvec) pays the
(8, 128) tile-padding tax on every per-observation temporary: each
(M, F<128) array costs a full (M, 128) HBM pass, and one CG iteration
materializes ~8 of them (~2.5 GB at Notre-Dame scale). This module
runs the two observation sweeps as Pallas kernels over COMPACT
buffers:

  * per-obs jacobians are reshaped once per solve from their padded
    (M, F) form to (M*F/128, 128) — zero padding — and each kernel
    tile views them back as (B, F) in VMEM;
  * camera-state gathers vc[obs_cam] become one-hot matmuls on the MXU
    (cameras are few; the (B, Nc) one-hot lives only in VMEM);
  * the point reductions exploit observation sorting: each tile of B
    observations touches a contiguous point window of at most B
    points, accumulated via a LOCAL one-hot matmul and added into the
    global output with an in-kernel HBM read-modify-write (the TPU
    grid is sequential, so cross-tile accumulation is race-free; the
    output aliases a zero-filled input for initialization);
  * the camera-side reduction accumulates into a persistent VMEM
    scratch across the whole grid and is written out at the last tile.

Preconditions (see bundle_adjustment's use): single shared intrinsics
group (Ng == 1), observations sorted by point, no shard_map axis,
M divisible by the block size.

Toolchain notes (2026-08, this runner, bisected on-chip): the AOT
compile helper rejects compact (M*F/128, 128) -> (B, F) in-kernel
reshapes ("unsupported shape cast") and 1-D block specs, so the
jacobians ride as (B, F) blocks of the UNPACKED (M, F) arrays
(strided DMA reads pay some padding amplification, but no (M, 128)
temporaries are ever written). The per-tile id vectors stream as
(B, 2) blocks of ONE (M, 2) int32 array — the same auto-pipelined
BlockSpec pattern — which removed the round-3 whole-(G, B)-VMEM id
residency and with it the ~1M-observation deployment ceiling.
Correctness: tests/test_pallas_matvec.py (per-pass numerics vs an
einsum reference + a full-LM equivalence gate).

ref role: the hot loop of Ceres ITERATIVE_SCHUR's implicit Schur
matvec (ref bundle_adjustment.h:84-96); design per the TPU kernel
playbook (one-hot MXU gathers, sequential-grid accumulation).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


def pack_compact(x, dtype=None):
    """(M, F) -> (M*F//128, 128) zero-padding layout (one relayout
    pass; M*F must divide 128 — guaranteed by pad_ba_problem's
    256-multiple observation bucketing for F in {2, 6, 12})."""
    M, F = x.shape
    if dtype is not None:
        x = x.astype(dtype)
    assert (M * F) % 128 == 0, (M, F)
    return x.reshape(M * F // 128, 128)


class MatvecPlan:
    """Host-side static per-problem data for the fused matvec."""

    def __init__(self, obs_cam, obs_pt, n_cams, n_pts, block=512,
                 force_window=None):
        obs_cam = np.asarray(obs_cam)
        obs_pt = np.asarray(obs_pt)
        M = obs_cam.shape[0]
        assert M % block == 0, (M, block)
        assert np.all(np.diff(obs_pt) >= 0), "obs must be point-sorted"
        self.M, self.B = M, block
        self.G = M // block
        self.Nc = n_cams
        self.Np = n_pts
        # point window per tile: sized to the ACTUAL max point span of
        # any tile (sorted obs; typical span is B / mean-track-length,
        # far below the worst-case B) — window DMA volume scales with
        # W, so this matters. p0 is 8-aligned for the DMA sublane
        # offset; +8 covers the alignment shift. force_window lets
        # multi-shard callers (parallel/point_sharded.py) impose one
        # uniform W across shards so the kernel shapes agree.
        p0 = (obs_pt[:: block].astype(np.int32) // 8) * 8
        rel_raw = obs_pt.reshape(self.G, block) - p0[:, None]
        self.W = int(_round_up(int(rel_raw.max()) + 1, 8))
        if force_window is not None:
            assert force_window >= self.W, (force_window, self.W)
            self.W = int(force_window)
        self.Np_pad = _round_up(n_pts + self.W, 8)
        self.tile_p0 = np.minimum(p0, self.Np_pad - self.W)
        # camera one-hots are built in CHUNKS of cam_chunk columns so
        # the per-step VMEM footprint is bounded at any camera count
        # (a monolithic (Ncp, B) one-hot is 21.6 MB at Trafalgar's
        # 5288 cams — the round-4 transposed-layout ceiling); <=1024
        # cams keeps the single-chunk fast path bit-identical
        self.cam_chunk = (_round_up(n_cams, 8) if n_cams <= 1024
                          else 256)
        self.cam_pad = _round_up(n_cams, self.cam_chunk)
        rel = (obs_pt.reshape(self.G, block) - self.tile_p0[:, None])
        assert (rel >= 0).all() and (rel < self.W).all(), "window"
        self.local_pt = rel.astype(np.int32)
        self.cam_tiles = obs_cam.reshape(self.G, block).astype(np.int32)


class PlanShapes:
    """Shape-only plan view for FusedMatvec when the tile arrays come
    from BAProblem fields (jit-side path)."""

    def __init__(self, G, B, Nc, Np, W):
        self.G, self.B, self.W = G, B, W
        self.M = G * B
        self.Nc, self.Np = Nc, Np
        self.cam_chunk = (_round_up(Nc, 8) if Nc <= 1024
                          else 256)
        self.cam_pad = _round_up(Nc, self.cam_chunk)
        self.Np_pad = _round_up(Np + W, 8)


def _onehot_T_matmul(ids, width, vals):
    """sum_b [ids[b] == w] * vals[b, f] -> (width, F), f32 accum."""
    oh = (ids[:, None] ==
          jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
          ).astype(vals.dtype)
    return jax.lax.dot_general(
        oh, vals, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _gather_rows(table, ids, width):
    """table[ids] (B, F) via one-hot matmul, f32 result."""
    oh = (ids[:, None] ==
          jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
          ).astype(table.dtype)
    return jax.lax.dot_general(
        oh, table, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _pass1_kernel(B, W, Ncp, C, P, mv_dtype, stream,
                  p0_ref, ids_ref, jc_ref, ji_ref, jp_ref,
                  vc_ref, vgmat_ref, wp_in_ref, u_ref, wp_ref):
    """u = Jc vc[cam] + Ji vg ; wp[window] += onehot^T (Jp^T u).

    The camera gather runs in C-column one-hot chunks (static loop) so
    per-step VMEM stays bounded at any camera count (a monolithic
    (B, Ncp) one-hot exceeded the 16M scoped-VMEM limit at Trafalgar's
    5288 cams)."""
    i = pl.program_id(0)
    jc = jc_ref[...]
    jp = jp_ref[...]
    ji = ji_ref[...]
    row = (2 * i) % 8 if stream else 2 * i
    cam = ids_ref[row, :]
    lpt = ids_ref[row + 1, :]
    vc_all = vc_ref[...]                              # (Ncp, 6)
    vc_m = jnp.zeros((B, 6), jnp.float32)
    for base in range(0, Ncp, C):
        oh = (cam[:, None] == jax.lax.broadcasted_iota(
            jnp.int32, (1, C), 1) + base).astype(vc_all.dtype)
        vc_m = vc_m + jax.lax.dot_general(
            oh, vc_all[base:base + C, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    vc_m = vc_m.astype(mv_dtype)
    u0 = jnp.sum((jc[:, 0:6] * vc_m).astype(jnp.float32), axis=1)
    u1 = jnp.sum((jc[:, 6:12] * vc_m).astype(jnp.float32), axis=1)
    ug = jax.lax.dot_general(
        ji, vgmat_ref[...].astype(ji.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (B, 2)
    u = jnp.stack([u0, u1], axis=1) + ug
    u_ref[...] = u
    um = u.astype(mv_dtype)
    t = ((jp[:, 0:3] * um[:, 0:1] +
          jp[:, 3:6] * um[:, 1:2])).astype(jnp.float32)  # (B, 3)
    part = _onehot_T_matmul(lpt, W, t)                   # (W, 3)

    # the wp buffer is (Np_pad, 128) with data in columns 0:3 — DMAs
    # must move full lane widths (a 3-lane memref slice crashes the
    # TPU compile helper); the accumulate touches only cols 0:3
    def rmw(buf, dma_sem):
        p0 = p0_ref[i]
        cp = pltpu.make_async_copy(
            wp_ref.at[pl.ds(p0, W), :], buf, dma_sem)
        cp.start()
        cp.wait()
        buf[:, 0:3] = buf[:, 0:3] + part
        cp2 = pltpu.make_async_copy(
            buf, wp_ref.at[pl.ds(p0, W), :], dma_sem)
        cp2.start()
        cp2.wait()

    pl.run_scoped(rmw, pltpu.VMEM((W, 128), jnp.float32),
                  pltpu.SemaphoreType.DMA(()))


def _pass2_kernel(B, W, Ncp, C, P, mv_dtype, stream,
                  p0_ref, ids_ref, jc_ref, ji_ref, jp_ref,
                  u_ref, zp_ref, yc_ref, yg_ref, acc_c, acc_g):
    """d = u - Jp zp[pt]; yc += onehot(cam)^T (Jc^T d); yg += Ji^T d."""
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_c[...] = jnp.zeros_like(acc_c)
        acc_g[...] = jnp.zeros_like(acc_g)

    jc = jc_ref[...]
    jp = jp_ref[...]
    ji = ji_ref[...]
    row = (2 * i) % 8 if stream else 2 * i
    cam = ids_ref[row, :]
    lpt = ids_ref[row + 1, :]
    u = u_ref[...]

    def body(zbuf, dma_sem):
        p0 = p0_ref[i]
        cp = pltpu.make_async_copy(
            zp_ref.at[pl.ds(p0, W), :], zbuf, dma_sem)
        cp.start()
        cp.wait()
        zm = _gather_rows(zbuf[:, 0:3], lpt, W).astype(
            mv_dtype)                                          # (B,3)
        u2_0 = jnp.sum((jp[:, 0:3] * zm).astype(jnp.float32), axis=1)
        u2_1 = jnp.sum((jp[:, 3:6] * zm).astype(jnp.float32), axis=1)
        d = u - jnp.stack([u2_0, u2_1], axis=1)
        dm = d.astype(mv_dtype)
        ycb = ((jc[:, 0:6] * dm[:, 0:1] +
                jc[:, 6:12] * dm[:, 1:2])).astype(jnp.float32)
        # chunked camera scatter (see _pass1_kernel)
        for base in range(0, Ncp, C):
            oh = (cam[:, None] == jax.lax.broadcasted_iota(
                jnp.int32, (1, C), 1) + base).astype(ycb.dtype)
            acc_c[base:base + C, :] = acc_c[base:base + C, :] + \
                jax.lax.dot_general(
                    oh, ycb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        zg = jax.lax.dot_general(
            ji, dm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (2P, 2)
        acc_g[...] = acc_g[...] + zg

    pl.run_scoped(body, pltpu.VMEM((W, 128), jnp.float32),
                  pltpu.SemaphoreType.DMA(()))

    @pl.when(i == n - 1)
    def _():
        yc_ref[...] = acc_c[...]
        yg_ref[...] = acc_g[...]


def _pass1_t_kernel(B, W, Ncp, C, P, mv_dtype, stream,
                    p0_ref, ids_ref, jc_ref, ji_ref, jp_ref,
                    vc_ref, vgmat_ref, wp_in_ref, u_ref, wp_ref):
    """Transposed-layout pass 1: u = Jc vc[cam] + Ji vg;
    wp[window] += onehot^T (Jp^T u).

    Jacobians ride as (F, B) blocks of (F, M) arrays — COMPACT in HBM
    (sublanes F pad to the next multiple of 8; the row-major (M, F)
    layout pads lanes F -> 128, a 6-21x DMA amplification per tile).
    vc rides transposed (6, Ncp); vgmat as (2, 2P); u as rows 0:2 of
    an (8, M) buffer. The camera one-hot is built in C-column chunks
    (static loop) so per-step VMEM stays bounded at any camera count
    — the round-4 ceiling was the monolithic (Ncp, B) one-hot
    outgrowing VMEM at 5288 cams.
    """
    i = pl.program_id(0)
    jcT = jc_ref[...]                       # (12, B)
    jiT = ji_ref[...]                       # (2P, B)
    jpT = jp_ref[...]                       # (6, B)
    row = (2 * i) % 8 if stream else 2 * i
    cam = ids_ref[row, :]
    lpt = ids_ref[row + 1, :]

    # gather in f32 (one-hot matmul is exact there); cast the RESULT
    # to the matvec dtype — rounding vc itself to bf16 before the
    # gather measurably slows LM convergence (21 vs 10 matched iters)
    vcT = vc_ref[...]                                  # (6, Ncp)
    vc_mT = jnp.zeros((6, B), jnp.float32)
    for base in range(0, Ncp, C):
        oh_cb = (jax.lax.broadcasted_iota(jnp.int32, (C, B), 0)
                 + base == cam[None, :]).astype(jnp.float32)  # (C, B)
        vc_mT = vc_mT + jax.lax.dot_general(
            vcT[:, base:base + C], oh_cb,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (6, B)
    vc_mT = vc_mT.astype(mv_dtype)
    u0 = jnp.sum((jcT[0:6, :] * vc_mT).astype(jnp.float32), axis=0)
    u1 = jnp.sum((jcT[6:12, :] * vc_mT).astype(jnp.float32), axis=0)
    ug = jax.lax.dot_general(
        vgmat_ref[...].astype(jiT.dtype), jiT,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (2, B)
    u0 = u0 + ug[0, :]
    u1 = u1 + ug[1, :]
    ub = jnp.concatenate(
        [u0[None, :], u1[None, :],
         jnp.zeros((6, B), jnp.float32)], axis=0)      # (8, B)
    u_ref[...] = ub
    um0 = u0.astype(mv_dtype)
    um1 = u1.astype(mv_dtype)
    tT = (jpT[0:3, :] * um0[None, :] +
          jpT[3:6, :] * um1[None, :]).astype(jnp.float32)  # (3, B)
    oh_wb = (jax.lax.broadcasted_iota(jnp.int32, (W, B), 0) ==
             lpt[None, :]).astype(tT.dtype)
    part = jax.lax.dot_general(
        oh_wb, tT, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (W, 3)

    def rmw(buf, dma_sem):
        p0 = p0_ref[i]
        cp = pltpu.make_async_copy(
            wp_ref.at[pl.ds(p0, W), :], buf, dma_sem)
        cp.start()
        cp.wait()
        buf[:, 0:3] = buf[:, 0:3] + part
        cp2 = pltpu.make_async_copy(
            buf, wp_ref.at[pl.ds(p0, W), :], dma_sem)
        cp2.start()
        cp2.wait()

    pl.run_scoped(rmw, pltpu.VMEM((W, 128), jnp.float32),
                  pltpu.SemaphoreType.DMA(()))


def _pass2_t_kernel(B, W, Ncp, C, P, mv_dtype, stream,
                    p0_ref, ids_ref, jc_ref, ji_ref, jp_ref,
                    u_ref, zp_ref, yc_ref, yg_ref, acc_c, acc_g):
    """Transposed-layout pass 2: d = u - Jp zp[pt];
    yc += onehot(cam)^T (Jc^T d); yg += Ji^T d."""
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_c[...] = jnp.zeros_like(acc_c)
        acc_g[...] = jnp.zeros_like(acc_g)

    jcT = jc_ref[...]
    jiT = ji_ref[...]
    jpT = jp_ref[...]
    row = (2 * i) % 8 if stream else 2 * i
    cam = ids_ref[row, :]
    lpt = ids_ref[row + 1, :]
    ub = u_ref[...]                               # (8, B), rows 0:2

    def body(zbuf, dma_sem):
        p0 = p0_ref[i]
        cp = pltpu.make_async_copy(
            zp_ref.at[pl.ds(p0, W), :], zbuf, dma_sem)
        cp.start()
        cp.wait()
        oh_wb = (jax.lax.broadcasted_iota(jnp.int32, (W, B), 0) ==
                 lpt[None, :]).astype(jnp.float32)
        zmT = jax.lax.dot_general(
            zbuf[:, 0:3], oh_wb,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (3, B)
        zmT = zmT.astype(mv_dtype)
        u2_0 = jnp.sum((jpT[0:3, :] * zmT).astype(jnp.float32),
                       axis=0)
        u2_1 = jnp.sum((jpT[3:6, :] * zmT).astype(jnp.float32),
                       axis=0)
        d0 = ub[0, :] - u2_0
        d1 = ub[1, :] - u2_1
        dm0 = d0.astype(mv_dtype)
        dm1 = d1.astype(mv_dtype)
        ycbT = (jcT[0:6, :] * dm0[None, :] +
                jcT[6:12, :] * dm1[None, :])      # (6, B) mv_dtype
        # chunked camera scatter: C-row one-hot slabs keep VMEM
        # bounded at any camera count (see _pass1_t_kernel)
        for base in range(0, Ncp, C):
            oh_cb = (jax.lax.broadcasted_iota(jnp.int32, (C, B), 0)
                     + base == cam[None, :]).astype(mv_dtype)
            acc_c[base:base + C, :] = acc_c[base:base + C, :] + \
                jax.lax.dot_general(
                    oh_cb, ycbT, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (C, 6)
        dmb = jnp.concatenate([dm0[None, :], dm1[None, :]],
                              axis=0)             # (2, B)
        acc_g[...] = acc_g[...] + jax.lax.dot_general(
            jiT, dmb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # (2P, 2)

    pl.run_scoped(body, pltpu.VMEM((W, 128), jnp.float32),
                  pltpu.SemaphoreType.DMA(()))

    @pl.when(i == n - 1)
    def _():
        yc_ref[...] = acc_c[...]
        yg_ref[...] = acc_g[...]


class FusedMatvec:
    """S-matvec observation sweeps as two Pallas launches.

    Usage per damped solve:
        fm = FusedMatvec(plan, P, mv_dtype)           # static wiring
        jc_c = pack_compact(Jc12, mv_dtype); ...      # once per solve
        u_c, wp = fm.pass1(jc_c, ji_c, jp_c, vc_pad, vgmat)
        zp = Hpp_inv @ wp[:Np]                        # XLA glue
        yc, yg2 = fm.pass2(jc_c, ji_c, jp_c, u_c, zp_pad)
    """

    # below this many observations the id arrays live whole in VMEM
    # (measured faster: no per-tile dynamic-row reads); above it they
    # stream as (8, B) superblocks so VMEM stays bounded at any M
    STREAM_IDS_ABOVE = 1 << 20

    def __init__(self, plan, P, mv_dtype=jnp.float32,
                 interpret=False, cam_tiles=None, lpt_tiles=None,
                 p0=None, stream_ids=None):
        """plan: a MatvecPlan, or any object with B/W/G/M/cam_pad/
        Np_pad attributes when the tile arrays are passed explicitly
        (the jit-side path pulls them from BAProblem fields)."""
        self.plan = plan
        self.P = P
        self.mv_dtype = mv_dtype
        self.interpret = interpret
        cam_t = (jnp.asarray(plan.cam_tiles) if cam_tiles is None
                 else cam_tiles)
        lpt_t = (jnp.asarray(plan.local_pt) if lpt_tiles is None
                 else lpt_tiles)
        G, B = plan.G, plan.B
        if stream_ids is None:
            stream_ids = plan.M > self.STREAM_IDS_ABOVE
        self.stream_ids = stream_ids
        if stream_ids:
            # ids stream as (8, B) superblocks of a compact (G8, B)
            # int32 array (cam rows interleaved with local-point rows:
            # row 2*g is cam ids of tile g, 2*g+1 its local point ids,
            # padded to a multiple of 8 rows). B is a 128-multiple so
            # the layout is compact in HBM (an (M, 2) layout would
            # physically pad to (M, 128) — measured 22% slower at 550
            # cams), the 8-row superblock satisfies Mosaic's sublane
            # rule, and Pallas only re-DMAs when the block index i//4
            # changes. This removes the round-3 hard ceiling: VMEM id
            # cost is 8*B*4 bytes at ANY number of observations.
            rows = jnp.stack(
                [cam_t.reshape(G, B), lpt_t.reshape(G, B)],
                axis=1).reshape(2 * G, B).astype(jnp.int32)
            G8 = _round_up(2 * G, 8)
            self.ids = jnp.zeros((G8, B),
                                 jnp.int32).at[:2 * G].set(rows)
        else:
            # whole-VMEM residency + per-tile dynamic row read — the
            # faster mode while 2*M*4 bytes of ids fit comfortably
            # (measured at 550 cams: resident 10.6 vs streamed 8.8
            # LM iters/s). Same interleaved row layout as the stream
            # mode, just resident: rows 2g / 2g+1 of a (2G, B) array.
            self.ids = jnp.stack(
                [cam_t.reshape(G, B), lpt_t.reshape(G, B)],
                axis=1).reshape(2 * G, B).astype(jnp.int32)
        self.p0 = jnp.asarray(plan.tile_p0) if p0 is None else p0

    def _jspec(self, F):
        # (B, F) blocks of the UNPACKED (M, F) array: F equals the
        # full trailing dim, which Mosaic accepts; the compact
        # (M*F/128, 128) + in-kernel reshape is rejected
        # ("unsupported shape cast" on (48,128)->(512,12)).
        B = self.plan.B
        return pl.BlockSpec((B, F), lambda i, p0: (i, 0),
                            memory_space=pltpu.VMEM)

    def _idspec(self):
        if not self.stream_ids:
            return pl.BlockSpec(memory_space=pltpu.VMEM)
        # (8, B) superblock of the interleaved compact (G8, B) ids:
        # tile g needs rows 2g (cam) and 2g+1 (lpt), i.e. superblock
        # g // 4, rows (2g) % 8 and (2g+1) % 8. Pallas re-fetches only
        # when g // 4 changes (1-D block specs crash this runner's AOT
        # helper and a (1, B)/(2, B) block violates Mosaic's 8-sublane
        # rule; an 8-row block satisfies it and stays compact).
        B = self.plan.B
        return pl.BlockSpec((8, B), lambda i, p0: (i // 4, 0),
                            memory_space=pltpu.VMEM)

    def _jspec_t(self, F):
        # (F, B) block of the TRANSPOSED (F, M) array: compact in HBM
        # (F sublanes pad to the next 8 vs F lanes padding to 128 in
        # the row-major layout — 6-21x less DMA per tile)
        B = self.plan.B
        return pl.BlockSpec((F, B), lambda i, p0: (0, i),
                            memory_space=pltpu.VMEM)

    def pass1_t(self, jc_t, ji_t, jp_t, vc_t, vgmat_t):
        """Transposed-layout pass 1. jc_t (12, M), ji_t (2P, M),
        jp_t (6, M); vc_t (6, cam_pad); vgmat_t (2, 2P).
        Returns (u (8, M) rows 0:2, wp (Np_pad, 128))."""
        plan, P = self.plan, self.P
        B, W, G, Ncp = plan.B, plan.W, plan.G, plan.cam_pad
        M = plan.M
        kern = functools.partial(_pass1_t_kernel, B, W, Ncp,
                                 plan.cam_chunk, P,
                                 self.mv_dtype, self.stream_ids)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[
                self._idspec(),
                self._jspec_t(12), self._jspec_t(2 * P),
                self._jspec_t(6),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # vc_t (6,Ncp)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # vgmat_t
                pl.BlockSpec(memory_space=pltpu.HBM),   # wp zero init
            ],
            out_specs=[
                self._jspec_t(8),                       # u (8, M)
                pl.BlockSpec(memory_space=pltpu.HBM),   # wp (aliased)
            ],
        )
        wp0 = jnp.zeros((plan.Np_pad, 128), jnp.float32)
        u, wp = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((8, M), jnp.float32),
                jax.ShapeDtypeStruct((plan.Np_pad, 128),
                                     jnp.float32),
            ],
            # p0(0), ids(1), jc(2), ji(3), jp(4), vc(5), vgmat(6),
            # wp0(7) -> aliases output 1
            input_output_aliases={7: 1},
            interpret=self.interpret,
        )(self.p0, self.ids, jc_t, ji_t, jp_t, vc_t, vgmat_t, wp0)
        return u, wp

    def pass2_t(self, jc_t, ji_t, jp_t, u_t, zp_pad):
        plan, P = self.plan, self.P
        B, W, G, Ncp = plan.B, plan.W, plan.G, plan.cam_pad
        kern = functools.partial(_pass2_t_kernel, B, W, Ncp,
                                 plan.cam_chunk, P,
                                 self.mv_dtype, self.stream_ids)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[
                self._idspec(),
                self._jspec_t(12), self._jspec_t(2 * P),
                self._jspec_t(6),
                self._jspec_t(8),                       # u (8, M)
                pl.BlockSpec(memory_space=pltpu.HBM),   # zp HBM
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # yc (Ncp, 6)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # yg (2P, 2)
            ],
            scratch_shapes=[pltpu.VMEM((Ncp, 6), jnp.float32),
                            pltpu.VMEM((2 * P, 2), jnp.float32)],
        )
        yc, yg = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((Ncp, 6), jnp.float32),
                jax.ShapeDtypeStruct((2 * P, 2), jnp.float32),
            ],
            interpret=self.interpret,
        )(self.p0, self.ids, jc_t, ji_t, jp_t, u_t, zp_pad)
        return yc, yg

    def pass1(self, jc_c, ji_c, jp_c, vc_pad, vgmat):
        plan, P = self.plan, self.P
        B, W, G, Ncp = plan.B, plan.W, plan.G, plan.cam_pad
        M = plan.M
        kern = functools.partial(_pass1_kernel, B, W, Ncp,
                                 plan.cam_chunk, P,
                                 self.mv_dtype, self.stream_ids)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[
                self._idspec(),                         # ids (B, 2)
                self._jspec(12), self._jspec(2 * P), self._jspec(6),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # vc (Ncp, 6)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # vgmat (2P, 2)
                pl.BlockSpec(memory_space=pltpu.HBM),   # wp zero init
            ],
            out_specs=[
                self._jspec(2),                         # u compact
                pl.BlockSpec(memory_space=pltpu.HBM),   # wp (aliased)
            ],
        )
        wp0 = jnp.zeros((plan.Np_pad, 128), jnp.float32)
        u, wp = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((M, 2), jnp.float32),
                jax.ShapeDtypeStruct((plan.Np_pad, 128),
                                     jnp.float32),
            ],
            # input index counts the scalar-prefetch arg: p0(0),
            # ids(1), jc(2), ji(3), jp(4), vc(5), vgmat(6),
            # wp0(7) -> aliases output 1
            input_output_aliases={7: 1},
            interpret=self.interpret,
        )(self.p0, self.ids, jc_c, ji_c, jp_c,
          vc_pad, vgmat, wp0)
        return u, wp

    def pass2(self, jc_c, ji_c, jp_c, u_c, zp_pad):
        plan, P = self.plan, self.P
        B, W, G, Ncp = plan.B, plan.W, plan.G, plan.cam_pad
        kern = functools.partial(_pass2_kernel, B, W, Ncp,
                                 plan.cam_chunk, P,
                                 self.mv_dtype, self.stream_ids)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[
                self._idspec(),
                self._jspec(12), self._jspec(2 * P), self._jspec(6),
                self._jspec(2),                         # u compact
                pl.BlockSpec(memory_space=pltpu.HBM),   # zp HBM
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # yc (Ncp, 6)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # yg (2P, 2)
            ],
            scratch_shapes=[pltpu.VMEM((Ncp, 6), jnp.float32),
                            pltpu.VMEM((2 * P, 2), jnp.float32)],
        )
        yc, yg = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((Ncp, 6), jnp.float32),
                jax.ShapeDtypeStruct((2 * P, 2), jnp.float32),
            ],
            interpret=self.interpret,
        )(self.p0, self.ids, jc_c, ji_c, jp_c,
          u_c, zp_pad)
        return yc, yg


def _blocks_kernel(B, W, Ncp, P, stream,
                   p0_ref, ids_ref, jc_ref, ji_ref, jp_ref,
                   r_ref, pt_in_ref, pt_ref, cam_out_ref, gx_ref,
                   gy_ref, acc_cam, acc_x, acc_y):
    """Undamped normal-equation blocks in ONE observation sweep
    (replaces make_blocks' flat-einsum + segment-reduction pipeline):
      pt_blk[n, 0:12]  += [Hpp9 | gp3]   (windowed RMW, sorted obs)
      cam_blk[c, 0:42] += [Hcc36 | gc6]  (one-hot MXU, VMEM scratch)
      X (2P, 2P) += Ji^T Ji ; Y (2P, 2) += Ji^T r  (shared group)
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        acc_cam[...] = jnp.zeros_like(acc_cam)
        acc_x[...] = jnp.zeros_like(acc_x)
        acc_y[...] = jnp.zeros_like(acc_y)

    jc = jc_ref[...]
    ji = ji_ref[...]
    jp = jp_ref[...]
    r = r_ref[...]
    row = (2 * i) % 8 if stream else 2 * i
    cam = ids_ref[row, :]
    lpt = ids_ref[row + 1, :]

    pt_cols = [jp[:, a] * jp[:, c] + jp[:, 3 + a] * jp[:, 3 + c]
               for a in range(3) for c in range(3)]
    pt_cols += [jp[:, c] * r[:, 0] + jp[:, 3 + c] * r[:, 1]
                for c in range(3)]
    ptvals = jnp.stack(pt_cols, axis=1)                  # (B, 12)
    part = _onehot_T_matmul(lpt, W, ptvals)              # (W, 12)

    def rmw(buf, dma_sem):
        p0 = p0_ref[i]
        cp = pltpu.make_async_copy(
            pt_ref.at[pl.ds(p0, W), :], buf, dma_sem)
        cp.start()
        cp.wait()
        buf[:, 0:12] = buf[:, 0:12] + part
        cp2 = pltpu.make_async_copy(
            buf, pt_ref.at[pl.ds(p0, W), :], dma_sem)
        cp2.start()
        cp2.wait()

    pl.run_scoped(rmw, pltpu.VMEM((W, 128), jnp.float32),
                  pltpu.SemaphoreType.DMA(()))

    cam_cols = [jc[:, a] * jc[:, c] + jc[:, 6 + a] * jc[:, 6 + c]
                for a in range(6) for c in range(6)]
    cam_cols += [jc[:, c] * r[:, 0] + jc[:, 6 + c] * r[:, 1]
                 for c in range(6)]
    camvals = jnp.stack(cam_cols, axis=1)                # (B, 42)
    acc_cam[...] = acc_cam[...] + _onehot_T_matmul(cam, Ncp, camvals)
    acc_x[...] = acc_x[...] + jax.lax.dot_general(
        ji, ji, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_y[...] = acc_y[...] + jax.lax.dot_general(
        ji, r, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == n - 1)
    def _():
        cam_out_ref[...] = acc_cam[...]
        gx_ref[...] = acc_x[...]
        gy_ref[...] = acc_y[...]


class FusedBlocks:
    """make_blocks' observation sweep as one Pallas launch (f32)."""

    def __init__(self, plan, P, interpret=False, cam_tiles=None,
                 lpt_tiles=None, p0=None):
        self.fm = FusedMatvec(plan, P, mv_dtype=jnp.float32,
                              interpret=interpret,
                              cam_tiles=cam_tiles,
                              lpt_tiles=lpt_tiles, p0=p0)

    def __call__(self, jc, ji, jp, r):
        fm = self.fm
        plan, P = fm.plan, fm.P
        B, W, G, Ncp = plan.B, plan.W, plan.G, plan.cam_pad
        kern = functools.partial(_blocks_kernel, B, W, Ncp, P,
                                 fm.stream_ids)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[
                fm._idspec(),
                fm._jspec(12), fm._jspec(2 * P), fm._jspec(6),
                fm._jspec(2),                           # residuals
                pl.BlockSpec(memory_space=pltpu.HBM),   # pt zero init
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),   # pt (aliased)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # cam (Ncp, 42)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # X (2P, 2P)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # Y (2P, 2)
            ],
            scratch_shapes=[pltpu.VMEM((Ncp, 42), jnp.float32),
                            pltpu.VMEM((2 * P, 2 * P), jnp.float32),
                            pltpu.VMEM((2 * P, 2), jnp.float32)],
        )
        pt0 = jnp.zeros((plan.Np_pad, 128), jnp.float32)
        # input index incl. scalar prefetch: p0(0), ids(1),
        # jc(2), ji(3), jp(4), r(5), pt0(6) -> aliases output 0
        pt, camb, X2, Y2 = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((plan.Np_pad, 128), jnp.float32),
                jax.ShapeDtypeStruct((Ncp, 42), jnp.float32),
                jax.ShapeDtypeStruct((2 * P, 2 * P), jnp.float32),
                jax.ShapeDtypeStruct((2 * P, 2), jnp.float32),
            ],
            input_output_aliases={6: 0},
            interpret=fm.interpret,
        )(fm.p0, fm.ids, jc, ji, jp, r, pt0)
        return pt, camb, X2, Y2
