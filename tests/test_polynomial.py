"""Tests mirroring ref: src/theia/math/closed_form_polynomial_solver_test.cc
and find_polynomial_roots_jenkins_traub_test.cc (random-coefficient
polynomials, verify residuals at recovered roots)."""
import jax.numpy as jnp
import numpy as np

from theiasfm_tpu.math import polynomial as poly


def sort_c(x):
    x = np.asarray(x)
    return x[np.argsort(x.real + 1e-6 * x.imag)]


def test_quadratic_real():
    r = poly.solve_quadratic(1.0, -3.0, 2.0)  # (x-1)(x-2)
    np.testing.assert_allclose(sort_c(r), [1.0, 2.0], atol=1e-10)


def test_quadratic_complex():
    r = poly.solve_quadratic(1.0, 0.0, 1.0)  # x^2+1
    np.testing.assert_allclose(np.sort(np.imag(np.asarray(r))), [-1, 1],
                               atol=1e-10)


def test_quadratic_batched(rng):
    roots_true = rng.uniform(-5, 5, size=(100, 2))
    a = np.ones(100)
    b = -(roots_true[:, 0] + roots_true[:, 1])
    c = roots_true[:, 0] * roots_true[:, 1]
    r = np.asarray(poly.solve_quadratic(jnp.asarray(a), jnp.asarray(b),
                                        jnp.asarray(c)))
    got = np.sort(r.real, axis=-1)
    np.testing.assert_allclose(got, np.sort(roots_true, axis=-1), atol=1e-8)


def test_cubic(rng):
    roots_true = np.sort(rng.uniform(-3, 3, size=(50, 3)), axis=-1)
    coeffs = np.stack([np.polynomial.polynomial.polyfromroots(r)[::-1]
                       for r in roots_true])
    r = np.asarray(poly.solve_cubic(coeffs[:, 0], coeffs[:, 1], coeffs[:, 2],
                                    coeffs[:, 3]))
    got = np.sort(r.real, axis=-1)
    np.testing.assert_allclose(got, roots_true, atol=1e-6)


def test_quartic(rng):
    roots_true = np.sort(rng.uniform(-3, 3, size=(50, 4)), axis=-1)
    coeffs = np.stack([np.polynomial.polynomial.polyfromroots(r)[::-1]
                       for r in roots_true])
    r = np.asarray(poly.solve_quartic(*[coeffs[:, i] for i in range(5)]))
    got = np.sort(r.real, axis=-1)
    np.testing.assert_allclose(got, roots_true, atol=1e-5)


def test_degree10_aberth(rng):
    """Degree-10 like the 5-pt essential matrix polynomial."""
    roots_true = rng.uniform(-2, 2, size=(20, 10))
    coeffs = np.stack([np.polynomial.polynomial.polyfromroots(r)[::-1]
                       for r in roots_true])
    r = np.asarray(poly.poly_roots(jnp.asarray(coeffs), iters=100))
    # every true root must be matched by some recovered root
    for i in range(20):
        for rt in roots_true[i]:
            assert np.min(np.abs(r[i] - rt)) < 1e-5, (i, rt, r[i])


def test_complex_conjugate_roots():
    # (x^2+1)(x^2-4x+5)(x-2) — mixed real/complex
    c1 = np.array([1.0, 0.0, 1.0])
    c2 = np.array([1.0, -4.0, 5.0])
    c3 = np.array([1.0, -2.0])
    coeffs = np.convolve(np.convolve(c1, c2), c3)
    r = np.asarray(poly.poly_roots(jnp.asarray(coeffs), iters=100))
    expected = np.array([1j, -1j, 2 + 1j, 2 - 1j, 2.0])
    for e in expected:
        assert np.min(np.abs(r - e)) < 1e-6


def test_real_roots_mask():
    coeffs = jnp.asarray(np.convolve([1.0, -1.0], [1.0, 0.0, 1.0]))
    r = poly.poly_roots(coeffs, iters=80)
    mask = np.asarray(poly.real_roots_mask(r))
    assert mask.sum() == 1
    real_root = np.asarray(r)[mask][0]
    np.testing.assert_allclose(real_root.real, 1.0, atol=1e-7)
