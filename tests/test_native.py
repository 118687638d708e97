"""Native C++ host-ops vs numpy reference implementations."""
import numpy as np
import pytest

from theiasfm_tpu.math.graph import (connected_components,
                                     minimum_spanning_tree)
from theiasfm_tpu.utils.native import (connected_components_native,
                                       get_lib, kruskal_mst_native,
                                       mfas_order_native)


@pytest.fixture(autouse=True)
def require_native():
    if get_lib() is None:
        pytest.skip("native lib not built")


def test_native_cc_matches_numpy(rng):
    n = 500
    edges = rng.integers(0, n, size=(2000, 2))
    ref = connected_components(n, edges)
    got = connected_components_native(n, edges[:, 0], edges[:, 1])
    # same partition (labels may differ): compare canonical forms
    def canon(lab):
        first = {}
        out = np.empty_like(lab)
        for i, l in enumerate(lab):
            out[i] = first.setdefault(l, i)
        return out
    np.testing.assert_array_equal(canon(ref), canon(got))


def test_native_mst_matches_numpy(rng):
    n = 50
    edges = []
    for i in range(n):
        for j in range(i + 1, n):
            if rng.uniform() < 0.3:
                edges.append((i, j))
    edges = np.asarray(edges)
    w = rng.uniform(size=len(edges))
    ref = minimum_spanning_tree(n, edges, w)
    got = kruskal_mst_native(n, edges, w)
    assert sorted(ref) == sorted(got.tolist())


def test_native_mfas(rng):
    # simple DAG: 0 -> 1 -> 2 -> 3 with one weak back-arc
    arcs_i = np.array([0, 1, 2, 3])
    arcs_j = np.array([1, 2, 3, 0])
    w = np.array([1.0, 1.0, 1.0, 0.1])
    order = mfas_order_native(4, arcs_i, arcs_j, w)
    assert order[0] < order[1] < order[2] < order[3]
