"""Fused Pallas Schur-matvec vs the reference einsum math
(interpret mode on CPU; the real kernel path is exercised on TPU by
scripts/bench_probe.py's pcg_pallas config)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from theiasfm_tpu.sfm.ba.pallas_matvec import FusedMatvec, MatvecPlan


def _rand_problem(rng, M=1024, Nc=12, Np=100, P=1, B=256):
    obs_pt = np.sort(rng.integers(0, Np, M)).astype(np.int32)
    obs_cam = rng.integers(0, Nc, M).astype(np.int32)
    Jc = rng.normal(size=(M, 12)).astype(np.float32)
    Ji = rng.normal(size=(M, 2 * P)).astype(np.float32)
    Jp = rng.normal(size=(M, 6)).astype(np.float32)
    vc = rng.normal(size=(Nc, 6)).astype(np.float32)
    vg = rng.normal(size=(P,)).astype(np.float32)
    zp = rng.normal(size=(Np, 3)).astype(np.float32)
    return obs_cam, obs_pt, Jc, Ji, Jp, vc, vg, zp


def _vgmat(vg, P):
    z = np.zeros((P,), np.float32)
    return jnp.asarray(np.stack([np.concatenate([vg, z]),
                                 np.concatenate([z, vg])], axis=1))


import pytest


@pytest.mark.parametrize("Nc", [12, 1300])
def test_fused_matvec_transposed_matches_einsum(Nc):
    """Transposed (F, M) jacobian layout kernels match the reference
    math (same checks as the row-layout test). Nc=1300 exercises the
    CHUNKED camera one-hot (256-column slabs, cam_pad 1536) that
    lifts the round-4 VMEM ceiling at >1024 cameras."""
    rng = np.random.default_rng(0)
    M, Np, P, B = 1024, 100, 1, 256
    obs_cam, obs_pt, Jc, Ji, Jp, vc, vg, zp = _rand_problem(
        rng, M, Nc, Np, P, B)
    plan = MatvecPlan(obs_cam, obs_pt, Nc, Np, block=B)
    fm = FusedMatvec(plan, P, interpret=True)

    jc_t = jnp.asarray(Jc.T)
    ji_t = jnp.asarray(Ji.T)
    jp_t = jnp.asarray(Jp.T)
    vc_t = jnp.zeros((6, plan.cam_pad),
                     jnp.float32).at[:, :Nc].set(vc.T)
    vgmat_t = jnp.asarray(np.asarray(_vgmat(vg, P)).T)
    u_t, wp = fm.pass1_t(jc_t, ji_t, jp_t, vc_t, vgmat_t)

    Jc3 = Jc.reshape(M, 2, 6)
    Ji3 = Ji.reshape(M, 2, P)
    Jp3 = Jp.reshape(M, 2, 3)
    u_ref = (np.einsum("mki,mi->mk", Jc3, vc[obs_cam]) +
             np.einsum("mkp,p->mk", Ji3, vg))
    np.testing.assert_allclose(np.asarray(u_t)[:2].T, u_ref,
                               rtol=2e-5, atol=2e-5)
    wp_ref = np.zeros((Np, 3))
    np.add.at(wp_ref, obs_pt, np.einsum("mkc,mk->mc", Jp3, u_ref))
    np.testing.assert_allclose(np.asarray(wp)[:Np, :3], wp_ref,
                               rtol=3e-4, atol=3e-4)

    zp_pad = jnp.zeros((plan.Np_pad, 128),
                       jnp.float32).at[:Np, :3].set(zp)
    yc, yg = fm.pass2_t(jc_t, ji_t, jp_t, u_t, zp_pad)
    u2_ref = np.einsum("mkc,mc->mk", Jp3, zp[obs_pt])
    d_ref = u_ref - u2_ref
    yc_ref = np.zeros((Nc, 6))
    np.add.at(yc_ref, obs_cam, np.einsum("mki,mk->mi", Jc3, d_ref))
    np.testing.assert_allclose(np.asarray(yc)[:Nc, :6], yc_ref,
                               rtol=3e-4, atol=3e-4)
    zg_full = np.einsum("mf,mk->fk", Ji, d_ref)
    np.testing.assert_allclose(np.asarray(yg)[:2 * P, :2], zg_full,
                               rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("stream,Nc", [(False, 12), (True, 12),
                                       (False, 1300)])
def test_fused_matvec_matches_einsum(stream, Nc):
    rng = np.random.default_rng(0)
    M, Np, P, B = 1024, 100, 1, 256
    obs_cam, obs_pt, Jc, Ji, Jp, vc, vg, zp = _rand_problem(
        rng, M, Nc, Np, P, B)
    plan = MatvecPlan(obs_cam, obs_pt, Nc, Np, block=B)
    fm = FusedMatvec(plan, P, interpret=True, stream_ids=stream)

    jc_c = jnp.asarray(Jc)
    ji_c = jnp.asarray(Ji)
    jp_c = jnp.asarray(Jp)
    vc_pad = jnp.zeros((plan.cam_pad, 6), jnp.float32).at[:Nc].set(vc)
    u_c, wp = fm.pass1(jc_c, ji_c, jp_c, vc_pad, _vgmat(vg, P))

    # reference math
    Jc3 = Jc.reshape(M, 2, 6)
    Ji3 = Ji.reshape(M, 2, P)
    Jp3 = Jp.reshape(M, 2, 3)
    u_ref = (np.einsum("mki,i->mk", Jc3, np.zeros(6)) +
             np.einsum("mki,mi->mk", Jc3, vc[obs_cam]) +
             np.einsum("mkp,p->mk", Ji3, vg))
    np.testing.assert_allclose(
        np.asarray(u_c), u_ref, rtol=2e-5, atol=2e-5)
    wp_ref = np.zeros((Np, 3))
    np.add.at(wp_ref, obs_pt,
              np.einsum("mkc,mk->mc", Jp3, u_ref))
    np.testing.assert_allclose(np.asarray(wp)[:Np, :3], wp_ref,
                               rtol=3e-4, atol=3e-4)

    # pass 2
    zp_pad = jnp.zeros((plan.Np_pad, 128),
                   jnp.float32).at[:Np, :3].set(zp)
    yc, yg = fm.pass2(jc_c, ji_c, jp_c, u_c, zp_pad)
    u2_ref = np.einsum("mkc,mc->mk", Jp3, zp[obs_pt])
    d_ref = u_ref - u2_ref
    yc_ref = np.zeros((Nc, 6))
    np.add.at(yc_ref, obs_cam,
              np.einsum("mki,mk->mi", Jc3, d_ref))
    np.testing.assert_allclose(np.asarray(yc)[:Nc, :6], yc_ref,
                               rtol=3e-4, atol=3e-4)
    zg_ref = np.einsum("mkp,mk->pk", Ji3, d_ref)  # (P, 2) -> want 2P,2
    zg_full = np.einsum("mf,mk->fk", Ji, d_ref)   # (2P, 2)
    np.testing.assert_allclose(np.asarray(yg)[:2 * P, :2], zg_full,
                               rtol=3e-4, atol=3e-4)
    # yg reduced: sum_k Ji[m, k, p] d[m, k] == zg_full[kP+p, k] summed
    yg_ref = np.einsum("mkp,mk->p", Ji3, d_ref)
    got = np.asarray(yg)[:2 * P, :2].reshape(2, P, 2)
    got_p = got[0, :, 0] + got[1, :, 1]
    np.testing.assert_allclose(got_p, yg_ref, rtol=3e-4, atol=3e-4)


def test_bundle_adjust_pallas_matvec_matches_xla():
    """Full LM solve with the fused Pallas matvec (interpret mode off
    TPU) must track the XLA matvec path."""
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _make_problem
    from theiasfm_tpu.sfm.ba import BAOptions, bundle_adjust
    from theiasfm_tpu.sfm.ba.bundle_adjustment import (
        add_pallas_matvec_plan, pad_obs_to_multiple)

    prob = _make_problem(n_cams=12, n_pts=256, obs_per_pt=4,
                         dtype=jnp.float32)
    prob = add_pallas_matvec_plan(pad_obs_to_multiple(prob, 512),
                                  block=512)
    base = BAOptions(max_iterations=8, cg_iterations=20,
                     loss="huber", loss_scale=2.0,
                     function_tolerance=0.0, point_indices_sorted=True)
    import dataclasses
    _, s0 = bundle_adjust(prob, base)
    _, s1 = bundle_adjust(
        prob, dataclasses.replace(base, pallas_matvec=True))
    np.testing.assert_allclose(float(s1.final_cost),
                               float(s0.final_cost), rtol=1e-3)
    assert float(s1.final_cost) < 0.5 * float(s1.initial_cost)
    # transposed (F, M) kernel layout must agree too
    _, s2 = bundle_adjust(
        prob, dataclasses.replace(base, pallas_matvec=True,
                                  pallas_transposed=True))
    np.testing.assert_allclose(float(s2.final_cost),
                               float(s0.final_cost), rtol=1e-3)


def test_bundle_adjust_pallas_blocks_matches_xla():
    """The experimental fused make_blocks kernel (pallas_blocks) must
    also track the XLA path (interpret mode off TPU)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _make_problem
    from theiasfm_tpu.sfm.ba import BAOptions, bundle_adjust
    from theiasfm_tpu.sfm.ba.bundle_adjustment import (
        add_pallas_matvec_plan, pad_obs_to_multiple)
    import dataclasses

    prob = _make_problem(n_cams=12, n_pts=256, obs_per_pt=4,
                         dtype=jnp.float32)
    prob = add_pallas_matvec_plan(pad_obs_to_multiple(prob, 512),
                                  block=512)
    base = BAOptions(max_iterations=6, cg_iterations=20,
                     loss="huber", loss_scale=2.0,
                     function_tolerance=0.0, point_indices_sorted=True)
    _, s0 = bundle_adjust(prob, base)
    _, s1 = bundle_adjust(
        prob, dataclasses.replace(base, pallas_matvec=True,
                                  pallas_blocks=True))
    np.testing.assert_allclose(float(s1.final_cost),
                               float(s0.final_cost), rtol=1e-3)


def test_bundle_adjust_bucketed_pallas_opt_in():
    """The pipeline-level bucketed entry attaches the fused-matvec
    plan itself when opts.pallas_matvec is set and the padded problem
    is eligible (Ng == 1, 1024-divisible, <= 1M obs)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _make_problem
    from theiasfm_tpu.sfm.ba import BAOptions
    from theiasfm_tpu.sfm.ba.bundle_adjustment import (
        bundle_adjust_bucketed)
    import dataclasses

    prob = _make_problem(n_cams=12, n_pts=300, obs_per_pt=4,
                         dtype=jnp.float32)
    base = BAOptions(max_iterations=5, cg_iterations=20, loss="huber",
                     loss_scale=2.0, function_tolerance=0.0)
    _, s0 = bundle_adjust_bucketed(prob, base)
    _, s1 = bundle_adjust_bucketed(
        prob, dataclasses.replace(base, pallas_matvec=True))
    np.testing.assert_allclose(float(s1.final_cost),
                               float(s0.final_cost), rtol=1e-3)
