"""Triplet rotation-cycle consistency filter.

ref: src/theia/sfm/filter_view_graph_cycles_by_rotation.{h,cc} — for
every connected view triplet, compose the loop rotation
R_ca @ R_bc @ R_ab; edges only survive if they participate in at least
one triplet whose loop deviation from identity is below the threshold.
Batched: all triplet loop compositions in one device call; triplet
enumeration on host (math/graph extract_triplets / native C++).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ...math import rotation as rot
from ...math.graph import extract_triplets
from ..view_graph import ViewGraph


def filter_view_graph_cycles_by_rotation(
        graph: ViewGraph, max_loop_error_degrees: float = 3.0) -> int:
    """Remove edges not supported by any consistent triplet. Returns the
    number of removed edges."""
    edges = list(graph.edges().keys())
    if not edges:
        return 0
    triplets = extract_triplets(edges)
    if not triplets:
        return 0

    # relative rotations in dense arrays keyed per ordered edge
    def rel_aa(a, b):
        info = graph.edge(a, b)
        aa = np.asarray(info.rotation_2, float)
        return aa if a < b else -aa  # stored as low->high; invert else

    R_ab, R_bc, R_ca = [], [], []
    for (a, b, c) in triplets:
        R_ab.append(rel_aa(a, b))
        R_bc.append(rel_aa(b, c))
        R_ca.append(rel_aa(c, a))
    A = rot.angle_axis_to_rotation_matrix(jnp.asarray(np.stack(R_ab)))
    B = rot.angle_axis_to_rotation_matrix(jnp.asarray(np.stack(R_bc)))
    C = rot.angle_axis_to_rotation_matrix(jnp.asarray(np.stack(R_ca)))
    loop = jnp.einsum("tij,tjk,tkl->til", C, B, A)
    cos = jnp.clip((jnp.trace(loop, axis1=-2, axis2=-1) - 1) / 2,
                   -1.0, 1.0)
    err_deg = np.asarray(jnp.degrees(jnp.arccos(cos)))

    supported = set()
    for (a, b, c), e in zip(triplets, err_deg):
        if e <= max_loop_error_degrees:
            supported.add((a, b) if a < b else (b, a))
            supported.add((b, c) if b < c else (c, b))
            supported.add((a, c) if a < c else (c, a))
    removed = 0
    for (a, b) in edges:
        if (a, b) not in supported:
            graph.remove_edge(a, b)
            removed += 1
    return removed
