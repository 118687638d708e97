"""Undistortion of images, features, and reconstructions.

ref: src/theia/sfm/undistort_image.{h,cc} (resample an image through
the camera's distortion model into an undistorted pinhole camera) and
UndistortReconstruction (replace cameras with distortion-free models,
mapping feature observations). The image resampling is one batched
bilinear gather over the full pixel grid (VPU work).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..camera import models as cm
from .reconstruction import Reconstruction


def undistort_points(camera, points_px: np.ndarray) -> np.ndarray:
    """Distorted pixel coords -> undistorted pixel coords (same K)."""
    intr = jnp.asarray(camera.intrinsics)
    pts = jnp.asarray(points_px)
    xy_d = cm._remove_calibration(intr, pts)
    xy_u = cm.undistort(int(camera.model_type), intr, xy_d)
    return np.asarray(cm._apply_calibration(intr, xy_u))


def undistort_image(camera, image: np.ndarray) -> np.ndarray:
    """Resample `image` (H, W[, C]) so the output is distortion-free
    under the same linear calibration. For each undistorted output
    pixel, sample the source at its distorted location (bilinear)."""
    H, W = image.shape[:2]
    intr = jnp.asarray(camera.intrinsics)
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32),
                          indexing="ij")
    pix = jnp.stack([xs, ys], -1).reshape(-1, 2)
    xy_u = cm._remove_calibration(intr, pix)
    xy_d = cm.distort(int(camera.model_type), intr, xy_u)
    src = np.asarray(cm._apply_calibration(intr, xy_d))
    sx = np.clip(src[:, 0], 0, W - 1.001)
    sy = np.clip(src[:, 1], 0, H - 1.001)
    x0 = sx.astype(np.int32)
    y0 = sy.astype(np.int32)
    fx = (sx - x0)[:, None] if image.ndim == 3 else (sx - x0)
    fy = (sy - y0)[:, None] if image.ndim == 3 else (sy - y0)
    img = np.asarray(image, np.float32)
    out = (img[y0, x0] * (1 - fy) * (1 - fx) +
           img[y0, x0 + 1] * (1 - fy) * fx +
           img[y0 + 1, x0] * fy * (1 - fx) +
           img[y0 + 1, x0 + 1] * fy * fx)
    return out.reshape(image.shape)


def undistort_reconstruction(recon: Reconstruction):
    """In-place: move all feature observations to undistorted coords and
    zero the distortion parameters (ref UndistortReconstruction)."""
    for vid, view in recon.views.items():
        cam = view.camera
        if not np.any(cam.intrinsics[5:]):
            continue
        if view.features:
            tids = list(view.features.keys())
            pts = np.stack([view.features[t] for t in tids])
            und = undistort_points(cam, pts)
            for t, p in zip(tids, und):
                view.features[t] = p
        cam.intrinsics[5:] = 0.0
        cam.model_type = cm.CameraModelType.PINHOLE


def colorize_reconstruction(recon: Reconstruction, image_loader):
    """Average per-track colors from observing images.
    ref: src/theia/sfm/colorize_reconstruction.{h,cc}.
    image_loader: name -> (H, W, 3) float [0,1] array."""
    sums = {t: np.zeros(3) for t in recon.tracks}
    counts = {t: 0 for t in recon.tracks}
    for vid, view in recon.views.items():
        img = image_loader(view.name)
        if img is None:
            continue
        H, W = img.shape[:2]
        for t, feat in view.features.items():
            x = int(np.clip(feat[0], 0, W - 1))
            y = int(np.clip(feat[1], 0, H - 1))
            sums[t] += img[y, x][:3]
            counts[t] += 1
    for t, tr in recon.tracks.items():
        if counts[t]:
            tr.color = np.clip(sums[t] / counts[t] * 255.0, 0,
                               255).astype(np.uint8)
