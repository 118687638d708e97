"""Robust loss functions for IRLS-style bundle adjustment.

ref: src/theia/sfm/bundle_adjustment/create_loss_function.h
(TRIVIAL/HUBER/SOFTLONE/CAUCHY/ARCTAN/TUKEY mapped to Ceres losses).
Here each loss contributes sqrt(rho'(s)) as a per-observation IRLS
weight on residuals and jacobians — the standard first-order
robustification (Triggs correction omitted, as is common).
"""
from __future__ import annotations

import jax.numpy as jnp

LOSSES = ("trivial", "huber", "softl1", "cauchy", "arctan", "tukey")


def robust_weight(loss: str, s, scale: float):
    """sqrt(rho'(s)) for squared-norm input s = ||r||^2.

    Matches the Ceres loss derivative conventions the reference relies
    on (create_loss_function.h): rho expressed over s, scale a.
    """
    a2 = scale * scale
    if loss == "trivial":
        return jnp.ones_like(s)
    if loss == "huber":
        # rho' = 1 if s <= a2 else a/sqrt(s)
        return jnp.where(s <= a2, 1.0,
                         jnp.sqrt(scale / jnp.sqrt(jnp.maximum(s, 1e-30))))
    if loss == "softl1":
        # rho = 2 a ( sqrt(1 + s/a2) - 1 ); rho' = 1/sqrt(1 + s/a2)
        return (1.0 + s / a2) ** -0.25
    if loss == "cauchy":
        # rho = a2 log(1 + s/a2); rho' = 1/(1 + s/a2)
        return jnp.sqrt(1.0 / (1.0 + s / a2))
    if loss == "arctan":
        # rho = a atan(s/a); rho' = 1/(1 + (s/a)^2)
        t = s / a2
        return jnp.sqrt(1.0 / (1.0 + t * t))
    if loss == "tukey":
        t = s / a2
        w = jnp.where(t <= 1.0, (1.0 - t) , 0.0)
        return jnp.sqrt(jnp.maximum(w, 0.0))
    raise ValueError(loss)
