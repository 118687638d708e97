"""Matmul-precision policy for TPU f32.

TPU MXU f32 matmuls default to fast bfloat16 passes. Measured on the
fountain-11 end-to-end gate ON TPU (with the evaluation's Umeyama
alignment correctly done in host f64 — an f32/TPU alignment corrupts
the MEASUREMENT by several mm and masked this): the default fast
precision reconstructs at median 2.04mm / mean 2.42mm vs the
reference's published 2.0/2.4, and 'highest' gives the same accuracy
(2.08/2.48) at ~1.3x the wall time. So the pipeline default is the
fast platform precision; set THEIASFM_GEOMETRY_PRECISION=highest to
pin f32-exact MXU passes for the geometric path when debugging
numerics. No-ops on CPU (already true f32/f64).
"""
from __future__ import annotations

import functools
import os

import jax

# 'default' (fast, measured accuracy-neutral end-to-end) unless
# overridden: THEIASFM_GEOMETRY_PRECISION=highest
_GEOMETRY_PRECISION = os.environ.get("THEIASFM_GEOMETRY_PRECISION",
                                     "default")


def geometry_precision(fn):
    """Decorator: trace `fn` with matmul precision 'highest' (float32
    accumulation on the MXU) — for the geometric estimation path."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision(_GEOMETRY_PRECISION):
            return fn(*args, **kwargs)
    return wrapper


def fast_precision(fn):
    """Decorator: trace `fn` with the platform-default (fast) matmul
    precision — for the BA hot path inside a geometry_precision
    region."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("default"):
            return fn(*args, **kwargs)
    return wrapper
