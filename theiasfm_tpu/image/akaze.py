"""AKAZE features as fixed-shape JAX: nonlinear diffusion scale space,
Hessian-determinant detector, M-SURF descriptor.

ref: src/theia/image/descriptor/akaze_descriptor.cc (wraps the vendored
libAKAZE with MSURF float descriptors, :82-85) and the AKAZE paper
(Alcantarilla et al., BMVC 2013). TPU formulation:

  * the nonlinear (Perona-Malik G2) diffusion is run with fixed counts
    of explicit diffusion steps per evolution level — an FED-style
    schedule with static shapes (conductivity recomputed per level),
  * the contrast factor k is the 70th percentile of gradient magnitude
    (paper's heuristic) computed on-device,
  * detection = scale-normalized det(Hessian) extrema over space and
    adjacent levels with a static keypoint budget (top_k, like SIFT),
  * descriptors = M-SURF 64-d: 4x4 overlapping cells of Gaussian-
    weighted (sum dx, sum dy, sum |dx|, sum |dy|) in the keypoint's
    rotated frame, computed by the same gather/one-hot machinery as
    the SIFT descriptor.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .sift import _blur, _keypoint_orientation_maps


@dataclasses.dataclass(frozen=True)
class AkazeOptions:
    num_octaves: int = 4
    sublevels: int = 4
    detector_threshold: float = 0.001
    max_features_per_octave: int = 512
    # stability limit of one explicit 2-D diffusion step; the FED
    # schedule (below) takes varying super-stable steps whose CYCLE is
    # stable, exactly the vendored lib's scheme
    fed_tau_max: float = 0.25


def _fed_tau_schedule(T: float, tau_max: float = 0.25):
    """Fast Explicit Diffusion step sizes for one cycle covering
    diffusion time T (Grewenig/Weickert FED, as used by the reference's
    vendored AKAZE: fed.cpp fed_tau_by_cycle_time). A cycle of n steps
    tau_j = tau_max / (2 cos^2(pi (2j+1) / (4n + 2))) is stable as a
    whole even though individual steps exceed tau_max; n is chosen so
    the cycle time n(n+1)/3 * tau_max covers T, then the taus are
    scaled to sum exactly to T. Returns a host numpy array (static)."""
    import math
    n = max(1, int(math.ceil(
        math.sqrt(3.0 * T / tau_max + 0.25) - 0.5 - 1e-8)))
    c = 1.0 / (4.0 * n + 2.0)
    taus = np.asarray([
        tau_max / (2.0 * math.cos(math.pi * (2 * j + 1) * c) ** 2)
        for j in range(n)])
    return taus * (T / taus.sum())


def _gradients_scharr(img):
    """Scharr 3x3 derivatives (AKAZE uses Scharr for robustness)."""
    kx = jnp.asarray([[-3.0, 0, 3], [-10, 0, 10], [-3, 0, 3]],
                     dtype=img.dtype) / 32.0
    ky = kx.T

    def conv(im, k):
        p = jnp.pad(im, 1, mode="edge")
        return jax.lax.conv_general_dilated(
            p[None, None], k[None, None], (1, 1), "VALID")[0, 0]

    return conv(img, kx), conv(img, ky)


def _diffuse_level(L, k_contrast, taus):
    """Explicit Perona-Malik G2 diffusion, one FED cycle:
    L += tau_i * div(g ∇L) with the super-stable step schedule from
    _fed_tau_schedule (taus: static (n,) jnp array)."""
    def step(i, L):
        lx, ly = _gradients_scharr(L)
        g = 1.0 / (1.0 + (lx * lx + ly * ly) / (k_contrast ** 2))
        # divergence of g * grad via central differences
        gx = g * lx
        gy = g * ly
        div = (0.5 * (jnp.roll(gx, -1, 1) - jnp.roll(gx, 1, 1)) +
               0.5 * (jnp.roll(gy, -1, 0) - jnp.roll(gy, 1, 0)))
        return L + taus[i] * div

    return jax.lax.fori_loop(0, taus.shape[0], step, L)


def _hessian_response(L, sigma):
    """Scale-normalized det(Hessian)."""
    lx, ly = _gradients_scharr(L)
    lxx, lxy = _gradients_scharr(lx)
    _, lyy = _gradients_scharr(ly)
    return (sigma ** 2) * (lxx * lyy - lxy * lxy)


_MS_CELLS = 4
_MS_SAMP = 20  # sample grid per side for the descriptor window


def _msurf_descriptors(L, sl, yk, xk, sigma_rel, theta, n_levels):
    """M-SURF 64-d descriptor per keypoint.

    L: (S, H, W) evolution levels; gradient samples on a rotated
    _MS_SAMP x _MS_SAMP grid spanning 20*sigma, 4x4 overlapping cells of
    (sum dx, sum dy, sum |dx|, sum |dy|).
    """
    K = sl.shape[0]
    H, W = L.shape[1], L.shape[2]
    gx = 0.5 * (jnp.roll(L, -1, 2) - jnp.roll(L, 1, 2))
    gy = 0.5 * (jnp.roll(L, -1, 1) - jnp.roll(L, 1, 1))

    g = (jnp.arange(_MS_SAMP) + 0.5) / _MS_SAMP - 0.5
    gy_, gx_ = jnp.meshgrid(g, g, indexing="ij")
    grid = jnp.stack([gx_.reshape(-1), gy_.reshape(-1)], -1)  # (P, 2)
    P = grid.shape[0]

    win = 20.0 * sigma_rel
    ct, st = jnp.cos(theta), jnp.sin(theta)
    ox = (grid[None, :, 0] * ct[:, None] -
          grid[None, :, 1] * st[:, None]) * win[:, None]
    oy = (grid[None, :, 0] * st[:, None] +
          grid[None, :, 1] * ct[:, None]) * win[:, None]
    sx = jnp.clip(xk[:, None] + ox, 0, W - 2)
    sy = jnp.clip(yk[:, None] + oy, 0, H - 2)
    x0 = sx.astype(jnp.int32)
    y0 = sy.astype(jnp.int32)
    fx = sx - x0
    fy = sy - y0
    sli = sl[:, None]

    def bil(vol):
        v00 = vol[sli, y0, x0]
        v01 = vol[sli, y0, x0 + 1]
        v10 = vol[sli, y0 + 1, x0]
        v11 = vol[sli, y0 + 1, x0 + 1]
        return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
                v10 * fy * (1 - fx) + v11 * fy * fx)

    dx = bil(gx)
    dy = bil(gy)
    # rotate gradients into the keypoint frame
    rdx = dx * ct[:, None] + dy * st[:, None]
    rdy = -dx * st[:, None] + dy * ct[:, None]
    wgt = jnp.exp(-(grid[None, :, 0] ** 2 + grid[None, :, 1] ** 2) /
                  (2 * 0.33 ** 2))
    rdx = rdx * wgt
    rdy = rdy * wgt

    # overlapping 4x4 cells: cell centers at (-0.375..0.375), triangular
    # spatial weights with half-width 0.25 (overlap)
    centers = (jnp.arange(_MS_CELLS) + 0.5) / _MS_CELLS - 0.5
    wu = jnp.maximum(0.0, 1.0 - jnp.abs(
        grid[:, 0][:, None] - centers[None, :]) / 0.25)  # (P, 4)
    wv = jnp.maximum(0.0, 1.0 - jnp.abs(
        grid[:, 1][:, None] - centers[None, :]) / 0.25)

    feats = jnp.stack([rdx, rdy, jnp.abs(rdx), jnp.abs(rdy)],
                      axis=-1)                     # (K, P, 4)
    t1 = jnp.einsum("kpc,pj->kjpc", feats, wv)
    cells = jnp.einsum("kjpc,pi->kijc", t1, wu)    # (K, 4, 4, 4)
    desc = cells.reshape(K, _MS_CELLS * _MS_CELLS * 4)
    return desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)


@partial(jax.jit, static_argnames=("opts", "octave_shapes"))
def _extract_device(image, opts: AkazeOptions, octave_shapes):
    S = opts.sublevels
    base = _blur(image, 1.0)

    # contrast factor: approximate 70th percentile of |grad| on the base
    lx, ly = _gradients_scharr(base)
    mag = jnp.sqrt(lx * lx + ly * ly)
    k_contrast = jnp.maximum(jnp.percentile(mag, 70.0), 1e-4)

    outputs = []
    for o, (Ho, Wo) in enumerate(octave_shapes):
        levels = [base]
        sigmas = []
        for s in range(S):
            sigma = 1.6 * (2.0 ** (s / S))
            sigmas.append(sigma * (2 ** o))
            t_prev = 0.5 * (1.6 * 2.0 ** ((s - 1) / S)) ** 2 if s else 0.5
            t_cur = 0.5 * sigma ** 2
            taus = jnp.asarray(_fed_tau_schedule(
                max(t_cur - t_prev, 1e-6), opts.fed_tau_max),
                image.dtype)
            levels.append(_diffuse_level(levels[-1], k_contrast, taus))
        L = jnp.stack(levels[1:])                   # (S, Ho, Wo)
        resp = jnp.stack([_hessian_response(L[s], 1.6 * 2.0 ** (s / S))
                          for s in range(S)])

        big = jnp.asarray(jnp.inf, resp.dtype)
        mx = jax.lax.reduce_window(resp, -big, jax.lax.max, (3, 3, 3),
                                   (1, 1, 1), "SAME")
        is_ext = (resp >= mx) & (resp > opts.detector_threshold)
        lvl = jnp.arange(S)[:, None, None]
        yy = jnp.arange(Ho)[None, :, None]
        xx = jnp.arange(Wo)[None, None, :]
        b = 10
        is_ext = is_ext & (yy >= b) & (yy < Ho - b) & (xx >= b) & \
            (xx < Wo - b) & (lvl >= 0)

        score = jnp.where(is_ext, resp, 0.0).reshape(-1)
        K = opts.max_features_per_octave
        top_score, flat = jax.lax.top_k(score, K)
        valid = top_score > 0
        slv = flat // (Ho * Wo)
        rem = flat % (Ho * Wo)
        iy = rem // Wo
        ix = rem % Wo

        mag_l = jnp.sqrt(
            (0.5 * (jnp.roll(L, -1, 2) - jnp.roll(L, 1, 2))) ** 2 +
            (0.5 * (jnp.roll(L, -1, 1) - jnp.roll(L, 1, 1))) ** 2)
        ang_l = jnp.arctan2(
            0.5 * (jnp.roll(L, -1, 1) - jnp.roll(L, 1, 1)),
            0.5 * (jnp.roll(L, -1, 2) - jnp.roll(L, 1, 2)))
        sigma_rel = 1.6 * (2.0 ** (slv / S))
        theta = _keypoint_orientation_maps(mag_l, ang_l, slv, iy, ix,
                                           sigma_rel)
        desc = _msurf_descriptors(L, slv, iy.astype(L.dtype),
                                  ix.astype(L.dtype), sigma_rel, theta,
                                  S)
        scale_mult = 2.0 ** o
        kps = jnp.stack([ix * scale_mult, iy * scale_mult,
                         sigma_rel * scale_mult, theta], -1)
        outputs.append((kps.astype(jnp.float32), desc, valid))
        base = levels[-1][::2, ::2]

    kps = jnp.concatenate([x[0] for x in outputs])
    desc = jnp.concatenate([x[1] for x in outputs])
    valid = jnp.concatenate([x[2] for x in outputs])
    return kps, desc, valid


def extract_akaze(image: np.ndarray, opts: AkazeOptions = AkazeOptions()):
    """Extract AKAZE features. Returns (keypoints (K, 4)
    [x, y, sigma, theta], descriptors (K, 64), valid (K,))."""
    img = np.asarray(image, np.float32)
    H, W = img.shape
    n_oct = opts.num_octaves
    shapes = []
    h, w = H, W
    for o in range(n_oct):
        if h < 40 or w < 40:
            break
        shapes.append((h, w))
        h, w = (h + 1) // 2, (w + 1) // 2
    H_pad = ((H - 1) // (1 << len(shapes)) + 1) * (1 << len(shapes))
    W_pad = ((W - 1) // (1 << len(shapes)) + 1) * (1 << len(shapes))
    img = np.pad(img, ((0, H_pad - H), (0, W_pad - W)), mode="edge")
    shapes = []
    h, w = H_pad, W_pad
    for o in range(n_oct):
        if h < 40 or w < 40:
            break
        shapes.append((h, w))
        h, w = h // 2, w // 2

    kps, desc, valid = _extract_device(jnp.asarray(img), opts,
                                       tuple(shapes))
    in_img = (kps[:, 0] < W) & (kps[:, 1] < H)
    return np.asarray(kps), np.asarray(desc), np.asarray(valid & in_img)
