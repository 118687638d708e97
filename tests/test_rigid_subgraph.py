"""Parallel-rigid subgraph extraction tests.

ref: src/theia/sfm/extract_maximally_parallel_rigid_subgraph.{h,cc} —
cameras whose positions are fully determined (up to global
translation + scale) by the pairwise translation directions form the
rigid component; weakly-connected cameras must be dropped.
"""
import numpy as np

from theiasfm_tpu.sfm.global_pose.rigid_subgraph import (
    extract_maximally_parallel_rigid_subgraph, maximal_rigid_component)
from theiasfm_tpu.sfm.view_graph import TwoViewInfo, ViewGraph


def _complete_edges(nodes, positions):
    edges, dirs = [], []
    for a in range(len(nodes)):
        for b in range(a + 1, len(nodes)):
            d = positions[nodes[b]] - positions[nodes[a]]
            edges.append((nodes[a], nodes[b]))
            dirs.append(d / np.linalg.norm(d))
    return edges, dirs


class TestMaximalRigidComponent:
    def test_complete_graph_is_rigid(self):
        rng = np.random.default_rng(3)
        pos = rng.normal(size=(6, 3))
        edges, dirs = _complete_edges(list(range(6)), pos)
        comp = maximal_rigid_component(np.asarray(edges), np.asarray(dirs), 6)
        assert set(comp.tolist()) == set(range(6))

    def test_dangling_node_dropped(self):
        rng = np.random.default_rng(4)
        pos = rng.normal(size=(7, 3))
        edges, dirs = _complete_edges(list(range(6)), pos)
        # node 6 hangs off node 0 by a single direction constraint:
        # its distance along the ray is free -> not parallel rigid.
        d = pos[6] - pos[0]
        edges.append((0, 6))
        dirs.append(d / np.linalg.norm(d))
        comp = maximal_rigid_component(np.asarray(edges), np.asarray(dirs), 7)
        assert set(comp.tolist()) == set(range(6))


class TestExtractFromViewGraph:
    def test_removes_nonrigid_views(self):
        rng = np.random.default_rng(5)
        n = 6
        pos = rng.normal(size=(n + 1, 3)) * 3.0
        graph = ViewGraph()
        orientations = {v: np.zeros(3) for v in range(n + 1)}
        for a in range(n):
            for b in range(a + 1, n):
                d = pos[b] - pos[a]
                info = TwoViewInfo(position_2=d / np.linalg.norm(d),
                                   num_verified_matches=100)
                graph.add_edge(a, b, info)
        d = pos[n] - pos[2]
        graph.add_edge(2, n, TwoViewInfo(position_2=d / np.linalg.norm(d),
                                         num_verified_matches=100))
        removed = extract_maximally_parallel_rigid_subgraph(
            orientations, graph)
        assert removed == 1
        assert not graph.has_view(n)
        assert graph.num_views() == n
