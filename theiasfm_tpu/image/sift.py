"""SIFT feature detection + description as fixed-shape JAX.

ref: src/theia/image/descriptor/sift_descriptor.cc:39,105-127 — the
reference wraps vlfeat's C SIFT (vl_sift_*). This is a from-scratch
TPU formulation of the same algorithm (Lowe 2004):

  * Gaussian scale-space per octave via separable convs (XLA conv ops),
  * DoG extrema as DENSE stencil ops (3x3x3 neighborhood max/min via
    reduce_window) — no per-keypoint control flow,
  * dense single-step quadratic subpixel refinement + edge rejection,
  * a STATIC keypoint budget per octave selected with top_k (the
    ragged->fixed-shape discipline; invalid slots masked),
  * orientation histogram and the 4x4x8 descriptor computed by gathering
    fixed-size windows per keypoint and binning with one-hot matmuls
    (vectorized over keypoints — MXU/VPU work, not loops).

Keypoints: (x, y, scale_sigma, orientation) in input-image pixels.
Descriptors: 128-d L2-normalized, clipped at 0.2, renormalized (Lowe).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SiftOptions:
    """Density knobs mirror ref SiftParameters (sift_parameters.h)."""
    num_octaves: int = 4
    levels_per_octave: int = 3
    sigma0: float = 1.6
    peak_threshold: float = 1.7 / 255.0   # vlfeat-style on DoG values
    edge_threshold: float = 10.0
    max_features_per_octave: int = 1024
    upsample: bool = False  # first_octave = -1 equivalent
    # ref SiftParameters descriptor knobs (sift_parameters.h:68-72).
    # The reference DEFAULTS to root_sift=True, upright_sift=True; our
    # defaults preserve classic (oriented, L2) SIFT — flip both for
    # reference-default behavior.
    root_sift: bool = False   # desc <- sqrt(desc / ||desc||_1)
    upright: bool = False     # skip orientation assignment (theta=0)


def _gauss_kernel(sigma: float, dtype=jnp.float32):
    radius = max(int(np.ceil(3.0 * sigma)), 1)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    return jnp.asarray(k, dtype)


def _blur(img, sigma: float):
    """Separable Gaussian blur with reflect padding. img (H, W)."""
    k = _gauss_kernel(sigma, img.dtype)
    r = (k.shape[0] - 1) // 2
    # horizontal
    p = jnp.pad(img, ((0, 0), (r, r)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        p[None, None, :, :], k[None, None, None, :], (1, 1), "VALID")[0, 0]
    p = jnp.pad(out, ((r, r), (0, 0)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        p[None, None, :, :], k[None, None, :, None], (1, 1), "VALID")[0, 0]
    return out


def _downsample2(img):
    return img[::2, ::2]


def _min_max_pool3(x):
    """(S, H, W) -> 3x3x3 neighborhood max and min (same shape)."""
    big = jnp.asarray(jnp.inf, x.dtype)
    mx = jax.lax.reduce_window(x, -big, jax.lax.max, (3, 3, 3),
                               (1, 1, 1), "SAME")
    mn = jax.lax.reduce_window(x, big, jax.lax.min, (3, 3, 3),
                               (1, 1, 1), "SAME")
    return mx, mn


def _octave_keypoints(gauss, opts: SiftOptions):
    """Detect keypoints in one octave.

    gauss: (S+3, H, W) Gaussian levels. Returns (score (K,), y, x, s
    (float refined), valid (K,)) with K = max_features_per_octave.
    """
    S = opts.levels_per_octave
    dog = gauss[1:] - gauss[:-1]              # (S+2, H, W)
    H, W = dog.shape[1], dog.shape[2]

    mx, mn = _min_max_pool3(dog)
    is_ext = ((dog >= mx) | (dog <= mn)) & \
        (jnp.abs(dog) > 0.8 * opts.peak_threshold)

    # derivatives (central differences over the full volume)
    ds = 0.5 * (jnp.roll(dog, -1, 0) - jnp.roll(dog, 1, 0))
    dy = 0.5 * (jnp.roll(dog, -1, 1) - jnp.roll(dog, 1, 1))
    dx = 0.5 * (jnp.roll(dog, -1, 2) - jnp.roll(dog, 1, 2))
    dss = jnp.roll(dog, -1, 0) + jnp.roll(dog, 1, 0) - 2 * dog
    dyy = jnp.roll(dog, -1, 1) + jnp.roll(dog, 1, 1) - 2 * dog
    dxx = jnp.roll(dog, -1, 2) + jnp.roll(dog, 1, 2) - 2 * dog
    dxy = 0.25 * (jnp.roll(jnp.roll(dog, -1, 1), -1, 2) -
                  jnp.roll(jnp.roll(dog, -1, 1), 1, 2) -
                  jnp.roll(jnp.roll(dog, 1, 1), -1, 2) +
                  jnp.roll(jnp.roll(dog, 1, 1), 1, 2))
    dxs = 0.25 * (jnp.roll(jnp.roll(dog, -1, 0), -1, 2) -
                  jnp.roll(jnp.roll(dog, -1, 0), 1, 2) -
                  jnp.roll(jnp.roll(dog, 1, 0), -1, 2) +
                  jnp.roll(jnp.roll(dog, 1, 0), 1, 2))
    dys = 0.25 * (jnp.roll(jnp.roll(dog, -1, 0), -1, 1) -
                  jnp.roll(jnp.roll(dog, -1, 0), 1, 1) -
                  jnp.roll(jnp.roll(dog, 1, 0), -1, 1) +
                  jnp.roll(jnp.roll(dog, 1, 0), 1, 1))

    # solve the symmetric 3x3 system Hess @ off = -grad at every voxel
    # in closed adjugate form on per-COMPONENT (S+2, H, W) arrays — a
    # stacked (S+2, H, W, 3, 3) tensor would tile-pad its trailing
    # (3, 3) to (8, 128), a 341x HBM blowup (23.6 GB for an 18-image
    # batch of 0.5 MP frames — measured OOM).
    a, b_, c = dxx + 1e-8, dxy, dxs
    e, f, i_ = dyy + 1e-8, dys, dss + 1e-8
    A11 = e * i_ - f * f
    A12 = c * f - b_ * i_
    A13 = b_ * f - c * e
    A22 = a * i_ - c * c
    A23 = b_ * c - a * f
    A33 = a * e - b_ * b_
    det = a * A11 + b_ * A12 + c * A13
    det = jnp.where(jnp.abs(det) < 1e-12,
                    jnp.where(det < 0, -1e-12, 1e-12), det)
    off_x = -(A11 * dx + A12 * dy + A13 * ds) / det
    off_y = -(A12 * dx + A22 * dy + A23 * ds) / det
    off_s = -(A13 * dx + A23 * dy + A33 * ds) / det
    refined = dog + 0.5 * (dx * off_x + dy * off_y + ds * off_s)

    # edge rejection on the 2x2 spatial Hessian
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = opts.edge_threshold
    edge_ok = (det > 0) & (tr * tr / jnp.where(det <= 0, 1.0, det) <
                           (r + 1) ** 2 / r)

    off_max = jnp.maximum(jnp.maximum(jnp.abs(off_x), jnp.abs(off_y)),
                          jnp.abs(off_s))
    good = (is_ext & edge_ok &
            (jnp.abs(refined) > opts.peak_threshold) &
            (off_max < 1.5))
    # only levels 1..S are valid extrema layers; exclude borders
    lvl = jnp.arange(dog.shape[0])[:, None, None]
    yy = jnp.arange(H)[None, :, None]
    xx = jnp.arange(W)[None, None, :]
    b = 5
    good = good & (lvl >= 1) & (lvl <= S) & \
        (yy >= b) & (yy < H - b) & (xx >= b) & (xx < W - b)

    score = jnp.where(good, jnp.abs(refined), 0.0).reshape(-1)
    K = opts.max_features_per_octave
    top_score, flat_idx = jax.lax.top_k(score, K)
    valid = top_score > 0
    sl = flat_idx // (H * W)
    rem = flat_idx % (H * W)
    iy = rem // W
    ix = rem % W
    x_ref = ix + off_x.reshape(-1)[flat_idx]
    y_ref = iy + off_y.reshape(-1)[flat_idx]
    s_ref = sl + off_s.reshape(-1)[flat_idx]
    return top_score, y_ref, x_ref, s_ref, sl, iy, ix, valid


def _grad_xy(img):
    gy = 0.5 * (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0))
    gx = 0.5 * (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1))
    return gx, gy


_ORI_BINS = 36
_WIN = 16  # orientation sampling window (fixed)
# Per-keypoint gradient-patch side. Orientation and descriptor both
# read ONLY this patch, extracted with one contiguous dynamic_slice
# per keypoint from edge-padded gradient maps — the TPU-native
# replacement for the round-4 per-sample scalar gathers and the
# histogram scatter-add (scatters cost ~1.15us/row on this chip;
# 296k scatter rows per octave dominated the 145 ms/image SIFT time).
# 88 covers the worst-case rotated descriptor window: sigma_rel <=
# 1.6 * 2^(4.5/3) = 4.53, win = 3*sigma*NBP = 54.3, half-diagonal
# 38.4, + subpixel offset 1.5 + bilinear support -> radius 41.
_PATCH = 88
_PR = _PATCH // 2


def _extract_patches(gx_pad, gy_pad, sl, iy, ix):
    """(K, PATCH, PATCH) gradient patches, centered so the keypoint's
    integer pixel sits at (PR, PR). gx_pad/gy_pad are the per-octave
    gradient pyramids edge-padded by PR on both spatial axes."""
    def one(s, y, x):
        a = jax.lax.dynamic_slice(gx_pad, (s, y, x),
                                  (1, _PATCH, _PATCH))[0]
        b = jax.lax.dynamic_slice(gy_pad, (s, y, x),
                                  (1, _PATCH, _PATCH))[0]
        return a, b
    return jax.vmap(one)(sl, iy, ix)


def _keypoint_orientation_maps(mag_pyr, ang_pyr, sl, iy, ix,
                               sigma_rel):
    """Dominant orientation from full mag/ang maps via per-sample
    gathers — kept for callers that already materialize polar
    gradient maps (AKAZE); SIFT itself uses the patch-based
    _keypoint_orientation below (no scalar gathers)."""
    K = sl.shape[0]
    r = _WIN // 2
    dyx = jnp.stack(jnp.meshgrid(jnp.arange(-r, r + 1),
                                 jnp.arange(-r, r + 1),
                                 indexing="ij"), -1).reshape(-1, 2)
    ys = jnp.clip(iy[:, None] + dyx[None, :, 0], 0,
                  mag_pyr.shape[1] - 1)
    xs = jnp.clip(ix[:, None] + dyx[None, :, 1], 0,
                  mag_pyr.shape[2] - 1)
    m = mag_pyr[sl[:, None], ys, xs]       # (K, P)
    a = ang_pyr[sl[:, None], ys, xs]
    d2 = (dyx[None, :, 0] ** 2 + dyx[None, :, 1] ** 2).astype(m.dtype)
    w_sigma = 1.5 * sigma_rel
    w = jnp.exp(-d2 / (2.0 * w_sigma[:, None] ** 2)) * m
    return _hist_orientation(w, a)


def _hist_orientation(w, a):
    """36-bin weighted orientation histogram (one-hot einsum, no
    scatter) -> smoothed peak with parabolic refinement."""
    K = w.shape[0]
    bin_f = (a / (2 * jnp.pi) * _ORI_BINS) % _ORI_BINS
    b0 = jnp.floor(bin_f).astype(jnp.int32) % _ORI_BINS
    frac = bin_f - jnp.floor(bin_f)
    oh = (jax.nn.one_hot(b0, _ORI_BINS, dtype=w.dtype) *
          (w * (1 - frac))[..., None] +
          jax.nn.one_hot((b0 + 1) % _ORI_BINS, _ORI_BINS,
                         dtype=w.dtype) * (w * frac)[..., None])
    hist = jnp.sum(oh, axis=1)                       # (K, 36)
    for _ in range(3):
        hist = (jnp.roll(hist, 1, -1) + hist +
                jnp.roll(hist, -1, -1)) / 3.0
    peak = jnp.argmax(hist, axis=-1)
    hp = hist[jnp.arange(K), peak]
    hl = hist[jnp.arange(K), (peak - 1) % _ORI_BINS]
    hr = hist[jnp.arange(K), (peak + 1) % _ORI_BINS]
    denom = hl - 2 * hp + hr
    delta = jnp.where(jnp.abs(denom) > 1e-12,
                      0.5 * (hl - hr) / denom, 0.0)
    return (peak + delta + 0.5) * (2 * jnp.pi / _ORI_BINS)


def _keypoint_orientation(pgx, pgy, sigma_rel):
    """Dominant gradient orientation per keypoint from its patch.

    pgx/pgy: (K, PATCH, PATCH); sigma_rel (K,) in octave pixels. The
    17x17 window is a STATIC patch slice; the 36-bin histogram is an
    einsum over one-hot bin weights (MXU), not a scatter.
    """
    K = pgx.shape[0]
    r = _WIN // 2
    wx = pgx[:, _PR - r:_PR + r + 1, _PR - r:_PR + r + 1]
    wy = pgy[:, _PR - r:_PR + r + 1, _PR - r:_PR + r + 1]
    m = jnp.sqrt(wx * wx + wy * wy + 1e-20).reshape(K, -1)  # (K, P)
    a = jnp.arctan2(wy, wx).reshape(K, -1)
    dy, dx = jnp.meshgrid(jnp.arange(-r, r + 1),
                          jnp.arange(-r, r + 1), indexing="ij")
    d2 = (dy * dy + dx * dx).reshape(-1).astype(m.dtype)
    w_sigma = 1.5 * sigma_rel
    w = jnp.exp(-d2[None, :] / (2.0 * w_sigma[:, None] ** 2)) * m
    return _hist_orientation(w, a)  # [0, 2pi)


_NBP = 4   # descriptor spatial bins
_NBO = 8   # orientation bins
_DSAMP = 16  # sample grid per side


def _descriptors(pgx, pgy, dyk, dxk, sigma_rel, theta):
    """4x4x8 SIFT descriptor per keypoint via bilinear sampling of its
    gradient PATCH on a rotated grid — the sampling is two small
    weight-matrix contractions per gradient map (MXU work), with no
    gathers. dyk/dxk are the subpixel offsets of the refined keypoint
    from the patch center."""
    K = pgx.shape[0]
    # sample grid in descriptor frame: NBP bins, 3*sigma spacing per bin
    g = (jnp.arange(_DSAMP) + 0.5) / _DSAMP - 0.5    # (-0.5, 0.5)
    gy_, gx_ = jnp.meshgrid(g, g, indexing="ij")
    grid = jnp.stack([gx_.reshape(-1), gy_.reshape(-1)], -1)  # (P, 2)
    P = grid.shape[0]

    win = 3.0 * sigma_rel * _NBP                     # full window width
    ct, st = jnp.cos(theta), jnp.sin(theta)
    # rotated offsets in octave pixels
    ox = (grid[None, :, 0] * ct[:, None] -
          grid[None, :, 1] * st[:, None]) * win[:, None]
    oy = (grid[None, :, 0] * st[:, None] +
          grid[None, :, 1] * ct[:, None]) * win[:, None]
    # positions in PATCH coordinates (keypoint integer pixel at PR)
    sx = jnp.clip(dxk[:, None] + ox + _PR, 0.0, _PATCH - 1.001)
    sy = jnp.clip(dyk[:, None] + oy + _PR, 0.0, _PATCH - 1.001)

    # bilinear sampling as two weight contractions: w[k, p, t] has the
    # two-tap tent profile max(0, 1 - |s - t|) along each patch axis
    taps = jnp.arange(_PATCH, dtype=sx.dtype)
    wyt = jnp.maximum(0.0, 1.0 - jnp.abs(sy[..., None] -
                                         taps[None, None, :]))
    wxt = jnp.maximum(0.0, 1.0 - jnp.abs(sx[..., None] -
                                         taps[None, None, :]))
    tx = jnp.einsum("kyx,kpy->kpx", pgx, wyt)
    gxs = jnp.einsum("kpx,kpx->kp", tx, wxt)
    ty = jnp.einsum("kyx,kpy->kpx", pgy, wyt)
    gys = jnp.einsum("kpx,kpx->kp", ty, wxt)
    m = jnp.sqrt(gxs * gxs + gys * gys + 1e-20)
    a = jnp.arctan2(gys, gxs)
    a_rel = (a - theta[:, None]) % (2 * jnp.pi)

    # Gaussian weight over the window
    r2 = grid[None, :, 0] ** 2 + grid[None, :, 1] ** 2
    wgt = jnp.exp(-r2 / (2 * 0.25))  # sigma = 0.5 window halves
    contrib = m * wgt                                  # (K, P)

    # trilinear binning into (NBP, NBP, NBO)
    u = (grid[:, 0] + 0.5) * _NBP - 0.5                # (P,)
    v = (grid[:, 1] + 0.5) * _NBP - 0.5
    ob = a_rel / (2 * jnp.pi) * _NBO                   # (K, P)

    def spatial_w(c, centers):
        return jnp.maximum(0.0, 1.0 - jnp.abs(c[:, None] -
                                              centers[None, :]))

    centers = jnp.arange(_NBP, dtype=m.dtype)
    wu = spatial_w(u, centers)                         # (P, NBP)
    wv = spatial_w(v, centers)                         # (P, NBP)
    o0 = jnp.floor(ob).astype(jnp.int32) % _NBO
    of = ob - jnp.floor(ob)
    onehot0 = jax.nn.one_hot(o0, _NBO, dtype=m.dtype) * (1 - of)[..., None]
    onehot1 = jax.nn.one_hot((o0 + 1) % _NBO, _NBO,
                             dtype=m.dtype) * of[..., None]
    wo = onehot0 + onehot1                             # (K, P, NBO)

    # desc[k, j, i, o] = sum_p contrib[k,p] wu[p,i] wv[p,j] wo[k,p,o]
    # — bin order (y, x, orientation), vlfeat's memory layout
    # (sift.c stores d[t + BO*ix + BO*BP*iy]); verified directly
    # against the compiled vlfeat oracle: mean descriptor cosine 0.95
    # on spatially/orientation-matched img1.png keypoints
    # (tests/test_sift_vlfeat_parity.py)
    cw = contrib[:, :, None] * wo                      # (K, P, NBO)
    t1 = jnp.einsum("kpo,pj->kjpo", cw, wv)            # (K, NBP, P, NBO)
    desc = jnp.einsum("kjpo,pi->kjio", t1, wu)         # (K, NBP, NBP, NBO)
    desc = desc.reshape(K, _NBP * _NBP * _NBO)

    # Lowe normalization: L2 -> clip 0.2 -> L2
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
    return desc


def _extract_impl(image, opts: SiftOptions, octave_shapes):
    S = opts.levels_per_octave
    k = 2.0 ** (1.0 / S)
    base = image
    # assume input pre-blurred at 0.5; bring to sigma0
    sig_init = float(np.sqrt(max(opts.sigma0 ** 2 - 0.5 ** 2, 0.01)))
    base = _blur(base, sig_init)

    all_out = []
    for o, (Ho, Wo) in enumerate(octave_shapes):
        gauss = [base]
        sig_prev = opts.sigma0
        for s in range(1, S + 3):
            sig_total = opts.sigma0 * (k ** s)
            sig_delta = float(np.sqrt(max(sig_total ** 2 -
                                          sig_prev ** 2, 1e-4)))
            gauss.append(_blur(gauss[-1], sig_delta))
            sig_prev = sig_total
        G = jnp.stack(gauss)                          # (S+3, Ho, Wo)

        score, y_ref, x_ref, s_ref, sl, iy, ix, valid = \
            _octave_keypoints(G, opts)
        gx, gy = jax.vmap(_grad_xy)(G)
        gx = jnp.pad(gx, ((0, 0), (_PR, _PR), (_PR, _PR)),
                     mode="edge")
        gy = jnp.pad(gy, ((0, 0), (_PR, _PR), (_PR, _PR)),
                     mode="edge")
        # one contiguous patch slice per keypoint; start (iy, ix) in
        # the padded maps puts the keypoint's pixel at (PR, PR)
        pgx, pgy = _extract_patches(gx, gy, sl, iy, ix)
        sigma_rel = opts.sigma0 * (k ** s_ref)        # octave pixels
        if opts.upright:
            # ref upright_sift: one canonical-orientation descriptor
            theta = jnp.zeros_like(sigma_rel)
        else:
            theta = _keypoint_orientation(pgx, pgy, sigma_rel)
        desc = _descriptors(pgx, pgy, y_ref - iy, x_ref - ix,
                            sigma_rel, theta)
        if opts.root_sift:
            # RootSIFT (Arandjelovic-Zisserman): L1-normalize + sqrt,
            # so L2 distance on the result = Hellinger distance
            desc = jnp.sqrt(desc / jnp.maximum(
                jnp.sum(desc, axis=-1, keepdims=True), 1e-12))
        scale_mult = 2.0 ** o * (0.5 if opts.upsample else 1.0)
        kps = jnp.stack([
            x_ref * scale_mult, y_ref * scale_mult,
            sigma_rel * scale_mult, theta], -1)       # (K, 4)
        all_out.append((kps, desc, valid, score))
        base = _downsample2(G[S])                     # next octave seed

    kps = jnp.concatenate([o[0] for o in all_out])
    desc = jnp.concatenate([o[1] for o in all_out])
    valid = jnp.concatenate([o[2] for o in all_out])
    score = jnp.concatenate([o[3] for o in all_out])
    return kps, desc, valid, score


@partial(jax.jit, static_argnames=("opts", "octave_shapes"))
def _extract_device(image, opts: SiftOptions, octave_shapes):
    return _extract_impl(image, opts, octave_shapes)


@partial(jax.jit, static_argnames=("opts", "octave_shapes"))
def _extract_device_batch(images, opts: SiftOptions, octave_shapes):
    """vmapped extraction over a stack of same-shape images — one
    device call per bucket instead of per image (ROADMAP: batch
    same-bucket images; the pyramid convs batch onto the same fused
    kernels)."""
    return jax.vmap(lambda im: _extract_impl(im, opts, octave_shapes))(
        images)


def _pad_and_shapes(img: np.ndarray, opts: SiftOptions):
    """Host-side: pad (H, W) so every octave halves exactly; returns
    (padded image, octave shapes tuple)."""
    H, W = img.shape
    shapes = []
    h, w = H, W
    for _ in range(opts.num_octaves):
        if h < 16 or w < 16:
            break
        shapes.append((h, w))
        h, w = (h + 1) // 2, (w + 1) // 2
    H_pad = ((H - 1) // (1 << len(shapes)) + 1) * (1 << len(shapes))
    W_pad = ((W - 1) // (1 << len(shapes)) + 1) * (1 << len(shapes))
    img = np.pad(img, ((0, H_pad - H), (0, W_pad - W)), mode="edge")
    shapes = []
    h, w = H_pad, W_pad
    for _ in range(opts.num_octaves):
        if h < 16 or w < 16:
            break
        shapes.append((h, w))
        h, w = h // 2, w // 2
    return img, tuple(shapes)


def extract_sift_batch(images, opts: SiftOptions = SiftOptions()):
    """Batched SIFT over same-shape grayscale images ((B, H, W) stack
    or list of equal-shape arrays). Returns per-image
    (keypoints, descriptors, valid) like extract_sift."""
    imgs = [np.asarray(im, np.float32) for im in images]
    H, W = imgs[0].shape
    assert all(im.shape == (H, W) for im in imgs), "same-shape batch"
    if opts.upsample:
        imgs = [np.kron(im, np.ones((2, 2), np.float32))
                for im in imgs]
    padded, shapes = zip(*[_pad_and_shapes(im, opts) for im in imgs])
    kps, desc, valid, _ = _extract_device_batch(
        jnp.stack([jnp.asarray(p) for p in padded]), opts, shapes[0])
    kps = np.asarray(kps)
    desc = np.asarray(desc)
    valid = np.asarray(valid)
    # keypoint coords are in ORIGINAL image scale (scale_mult undoes
    # the upsample), so gate against the pre-upsample dims
    in_img = (kps[..., 0] < W) & (kps[..., 1] < H)
    valid = valid & in_img
    return [(kps[b], desc[b], valid[b]) for b in range(len(imgs))]


def extract_sift(image: np.ndarray, opts: SiftOptions = SiftOptions()):
    """Extract SIFT features from a grayscale image (H, W) in [0, 1].

    Returns (keypoints (K, 4) [x, y, sigma, theta], descriptors
    (K, 128), valid (K,) bool) with K = num_octaves *
    max_features_per_octave (fixed shape; filter by `valid`).
    """
    img = np.asarray(image, np.float32)
    if opts.upsample:
        img = np.kron(img, np.ones((2, 2), np.float32))
    H, W = img.shape
    shapes = []
    h, w = H, W
    n_oct = opts.num_octaves
    for o in range(n_oct):
        if h < 16 or w < 16:
            break
        shapes.append((h, w))
        h, w = (h + 1) // 2, (w + 1) // 2
    # static downsample halves exactly; pad image to even multiple
    H_pad = ((H - 1) // (1 << len(shapes)) + 1) * (1 << len(shapes))
    W_pad = ((W - 1) // (1 << len(shapes)) + 1) * (1 << len(shapes))
    img = np.pad(img, ((0, H_pad - H), (0, W_pad - W)), mode="edge")
    shapes = []
    h, w = H_pad, W_pad
    for o in range(n_oct):
        if h < 16 or w < 16:
            break
        shapes.append((h, w))
        h, w = h // 2, w // 2

    kps, desc, valid, score = _extract_device(
        jnp.asarray(img), opts, tuple(shapes))
    # drop keypoints that fell into the padded margin
    in_img = (kps[:, 0] < W) & (kps[:, 1] < H)
    valid = valid & in_img
    return np.asarray(kps), np.asarray(desc), np.asarray(valid)
