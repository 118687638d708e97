"""Tests for small utility parity rows: MutablePriorityQueue
(ref util/mutable_priority_queue.h), gauss_jordan
(ref math/matrix/gauss_jordan.h + gauss_jordan_test.cc), and
populate_image_sizes (ref io/populate_image_sizes.cc)."""
import numpy as np
import jax.numpy as jnp

from theiasfm_tpu.math import gauss_jordan
from theiasfm_tpu.utils import MutablePriorityQueue


def test_mutable_priority_queue_basic():
    q = MutablePriorityQueue()
    q.insert("a", 5)
    q.insert("b", 3)
    q.insert("c", 9)
    assert len(q) == 3 and "b" in q
    assert q.top() == ("b", 3)
    q.update("c", 1)
    assert q.pop() == ("c", 1)
    q.remove("a")
    assert q.pop() == ("b", 3)
    assert len(q) == 0


def test_gauss_jordan_square(rng):
    A = rng.normal(size=(6, 6))
    x = rng.normal(size=(6, 2))
    aug = np.concatenate([A, A @ x], axis=1)
    R = np.asarray(gauss_jordan(jnp.asarray(aug)))
    np.testing.assert_allclose(R[:, :6], np.eye(6), atol=1e-9)
    np.testing.assert_allclose(R[:, 6:], x, atol=1e-8)


def test_gauss_jordan_needs_pivoting(rng):
    # zero leading pivot forces a row swap (ref test: pivoting path)
    A = np.array([[0.0, 2.0, 1.0],
                  [1.0, 0.0, 2.0],
                  [3.0, 1.0, 0.0]])
    b = A @ np.array([1.0, -2.0, 3.0])
    aug = np.concatenate([A, b[:, None]], axis=1)
    R = np.asarray(gauss_jordan(jnp.asarray(aug)))
    np.testing.assert_allclose(R[:, 3], [1.0, -2.0, 3.0], atol=1e-10)


def test_populate_image_sizes(tmp_path):
    from PIL import Image
    from theiasfm_tpu.io import populate_image_sizes
    from theiasfm_tpu.sfm.reconstruction import Reconstruction

    Image.new("RGB", (64, 48)).save(tmp_path / "img0.png")
    recon = Reconstruction()
    v = recon.add_view("img0.png")
    assert populate_image_sizes(recon, str(tmp_path))
    cam = recon.view(v).camera
    assert (cam.image_width, cam.image_height) == (64, 48)
    assert cam.intrinsics[3] == 32.0 and cam.intrinsics[4] == 24.0
    recon.add_view("missing.png")
    assert not populate_image_sizes(recon, str(tmp_path))
    assert not populate_image_sizes(recon, str(tmp_path / "nodir"))
