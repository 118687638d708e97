"""UPnP / DLS-PnP: nonminimal absolute pose for central and
generalized (non-central) cameras.

ref: src/theia/sfm/pose/upnp.{h,cc} — "UPnP: An Optimal O(n) Solution
to the Absolute Pose Problem with Universal Applicability" (Kneip et
al., ECCV 2014), cost J(R, t) = sum_i ||depth_i v_i + c_i - R p_i - t||^2
(upnp.h:49-56);
ref: src/theia/sfm/pose/dls_pnp.{h,cc} — "A Direct Least-Squares (DLS)
Method for PnP" (Hesch & Roumeliotis, ICCV 2011), the central-camera
special case of the same object-space cost.

TPU-first design. The reference solves the first-order optimality
conditions with Groebner-basis template matrices (395x412 / 141x149
eliminations feeding a nonsymmetric action-matrix eigendecomposition —
upnp.h:71-77). None of that maps to XLA. Instead we use the same
analytic elimination of depths and translation — reducing the cost to
a quartic polynomial on the unit-quaternion sphere — and find its
global minimum with a *fixed grid of rotations covering SO(3)* refined
by vmapped Riemannian Gauss-Newton:

- building the reduced cost is a handful of (N, 3)-batched matmuls;
- the multistart refinement is 24-64 independent 3-DoF GN descents,
  all advanced in lockstep under vmap (static shapes, no branching);
- the SO(3) covering (chiral octahedral group, max gap ~31 deg to the
  nearest start) empirically always places at least one start in the
  global basin for PnP-type quartics.

This trades algebraic exactness for massive parallelism — the right
trade on hardware where 64 GN descents cost the same as one.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...math import rotation as rot

__all__ = ["upnp", "dls_pnp", "upnp_cost_matrix", "multistart_refine_quat",
           "so3_covering_quats"]


def _so3_covering_quats():
    """Fixed 28-start covering of SO(3): the 24 chiral-octahedral
    rotations (as quaternions, half-sphere) plus 4 extra tetrahedral
    midpoints for safety. Deterministic — no RNG."""
    quats = []
    # identity + face rotations of the octahedral group
    axes = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
    for ax in axes:
        for k in range(4):
            angle = k * np.pi / 2.0
            w = np.cos(angle / 2.0)
            s = np.sin(angle / 2.0)
            quats.append((w, s * ax[0], s * ax[1], s * ax[2]))
    # edge rotations (180 deg about face diagonals)
    for ax in [(1, 1, 0), (1, -1, 0), (1, 0, 1), (1, 0, -1),
               (0, 1, 1), (0, 1, -1)]:
        n = np.sqrt(2.0)
        quats.append((0.0, ax[0] / n, ax[1] / n, ax[2] / n))
    # vertex rotations (120/240 deg about body diagonals)
    for ax in [(1, 1, 1), (1, 1, -1), (1, -1, 1), (-1, 1, 1)]:
        n = np.sqrt(3.0)
        for angle in (2 * np.pi / 3, 4 * np.pi / 3):
            w = np.cos(angle / 2.0)
            s = np.sin(angle / 2.0)
            quats.append((w, s * ax[0] / n, s * ax[1] / n, s * ax[2] / n))
    # dedupe antipodal/repeat
    out = []
    for q in quats:
        q = np.asarray(q, np.float64)
        if q[0] < 0:
            q = -q
        if not any(np.allclose(q, o, atol=1e-9) for o in out):
            out.append(q)
    return np.stack(out)  # (24, 4)


_COVERING = _so3_covering_quats()


def so3_covering_quats():
    """The fixed deterministic SO(3) multistart covering (S, 4)."""
    return _COVERING


def multistart_refine_quat(cost_q, starts, gn_iters: int = 12):
    """Minimize a smooth cost over SO(3) (unit quaternions) by lockstep
    multistart damped Newton — the shared engine behind upnp/dls_pnp/
    gdls. ``cost_q(q) -> scalar`` must be jax-differentiable. Returns
    the best quaternion (4,) over all starts. jit/vmap friendly."""

    def refine(q0):
        # Riemannian damped Newton on S^3, 3-DoF tangent steps. The
        # cost is nonconvex (saddles/maxima abound), so instead of a
        # data-dependent LM damping schedule — which would break
        # lockstep vmap — each iteration evaluates a fixed ladder of
        # dampings plus a pure gradient step and keeps the best.
        eye3 = jnp.eye(3, dtype=q0.dtype)

        def apply_delta(q, delta):
            dq = jnp.concatenate([jnp.ones((1,), q.dtype), 0.5 * delta])
            qn = rot.quaternion_multiply(q, dq)
            return qn / jnp.linalg.norm(qn)

        def step(_, q):
            def local(delta):
                return cost_q(apply_delta(q, delta))

            z = jnp.zeros((3,), q.dtype)
            g = jax.grad(local)(z)
            H = jax.hessian(local)(z)
            tr = jnp.abs(jnp.trace(H)) + 1e-12

            lams = jnp.asarray([0.0, 1e-4, 1e-2, 1e-1, 1.0, 10.0],
                               q.dtype) * tr

            def newton_delta(lam):
                return -jnp.linalg.solve(H + (lam + 1e-15) * eye3, g)

            deltas = jax.vmap(newton_delta)(lams)          # (6, 3)
            gstep = -0.3 * g / (jnp.linalg.norm(g) + 1e-12)
            deltas = jnp.concatenate([deltas, gstep[None]], axis=0)
            qns = jax.vmap(lambda d: apply_delta(q, d))(deltas)
            costs = jax.vmap(cost_q)(qns)
            costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
            best = jnp.argmin(costs)
            return jnp.where(costs[best] < cost_q(q), qns[best], q)

        return jax.lax.fori_loop(0, gn_iters, step, q0)

    qs = jax.vmap(refine)(starts)                       # (S, 4)
    costs = jax.vmap(cost_q)(qs)
    costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
    return qs[jnp.argmin(costs)]


def upnp_cost_matrix(ray_origins, ray_dirs, world_points):
    """Eliminate depths and translation from the UPnP cost.

    Returns (t_of_R, cost_of_R) closures over the reduced problem:
    given R (3, 3), ``t_of_R(R)`` is the optimal translation and
    ``cost_of_R(R)`` the object-space cost
    sum_i || (I - v_i v_i^T)(R p_i + t - c_i) ||^2
    (depths solved in closed form: depth_i = v_i . (R p_i + t - c_i),
    matching upnp.h:49-56 with the sign convention R p + t on the ray).
    """
    c = jnp.asarray(ray_origins)
    v = jnp.asarray(ray_dirs)
    p = jnp.asarray(world_points)
    n = p.shape[0]
    eye = jnp.eye(3, dtype=p.dtype)
    Q = eye[None] - v[:, :, None] * v[:, None, :]       # (n, 3, 3) projectors
    Qsum = jnp.sum(Q, axis=0)                           # (3, 3)
    # Guard: Qsum is rank-deficient only if all rays are parallel.
    Qsum_inv = jnp.linalg.inv(Qsum + 1e-12 * eye)
    Qc = jnp.einsum("nij,nj->i", Q, c)                  # (3,)

    def t_of_R(R):
        QRp = jnp.einsum("nij,nj->i", Q, p @ R.T)
        return Qsum_inv @ (Qc - QRp)

    def cost_of_R(R):
        t = t_of_R(R)
        r = p @ R.T + t - c                             # (n, 3)
        Qr = jnp.einsum("nij,nj->ni", Q, r)
        return jnp.sum(Qr * r), t

    return t_of_R, cost_of_R


def upnp(ray_origins, ray_dirs, world_points, gn_iters: int = 12):
    """Universal PnP: absolute pose of a central or generalized camera.

    ray_origins (n, 3) camera-frame ray origins (zeros for a central
    camera), ray_dirs (n, 3) unit directions, world_points (n, 3).
    Solves R p_i + t = c_i + depth_i v_i in least squares.

    Returns (R (3, 3), t (3,), cost ()) — the best solution over the
    SO(3)-covering multistart. jit/vmap friendly.
    """
    _, cost_of_R = upnp_cost_matrix(ray_origins, ray_dirs, world_points)
    starts = jnp.asarray(_COVERING, jnp.asarray(world_points).dtype)

    def cost_q(q):
        R = rot.quaternion_to_rotation_matrix(q)
        cost, _ = cost_of_R(R)
        return cost

    qb = multistart_refine_quat(cost_q, starts, gn_iters)
    R = rot.quaternion_to_rotation_matrix(qb)
    t_of_R, cost_of_R2 = upnp_cost_matrix(ray_origins, ray_dirs,
                                          world_points)
    cost, t = cost_of_R2(R)
    return R, t, cost


def dls_pnp(feature_positions, world_points, gn_iters: int = 12):
    """DLS-PnP (central camera): pose from n >= 3 2D-3D matches.

    feature_positions (n, 2) normalized image coords; world_points
    (n, 3). Returns (R, t, cost) minimizing the object-space error —
    the central-camera case of `upnp`
    (ref: src/theia/sfm/pose/dls_pnp.h:45-57).
    """
    f = jnp.asarray(feature_positions)
    rays = jnp.concatenate([f, jnp.ones_like(f[:, :1])], axis=-1)
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    origins = jnp.zeros_like(rays)
    return upnp(origins, rays, world_points, gn_iters=gn_iters)
