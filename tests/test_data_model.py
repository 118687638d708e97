"""Data model tests mirroring ref: src/theia/sfm/reconstruction_test.cc,
track_builder_test.cc, view_graph/view_graph_test.cc,
math/graph tests."""
import numpy as np

from theiasfm_tpu.math.graph import (UnionFind, connected_components,
                                     extract_triplets,
                                     minimum_spanning_tree)
from theiasfm_tpu.sfm.reconstruction import (CameraIntrinsicsPrior,
                                             Reconstruction)
from theiasfm_tpu.sfm.track_builder import TrackBuilder
from theiasfm_tpu.sfm.view_graph import TwoViewInfo, ViewGraph


def test_reconstruction_views_tracks():
    r = Reconstruction()
    v1 = r.add_view("a.jpg")
    v2 = r.add_view("b.jpg")
    assert r.add_view("a.jpg") == 2 ** 32 - 1  # duplicate name
    assert r.view_id_from_name("b.jpg") == v2
    t = r.add_track()
    assert r.add_observation(v1, t, (10.0, 20.0))
    assert r.add_observation(v2, t, (11.0, 21.0))
    assert not r.add_observation(v1, t, (12.0, 22.0))  # dup view in track
    assert r.num_views() == 2 and r.num_tracks() == 1
    assert set(r.track(t).views) == {v1, v2}
    r.remove_view(v1)
    assert r.num_views() == 1
    assert r.track(t) is not None and r.track(t).views == {v2}
    r.remove_view(v2)
    assert r.num_tracks() == 0  # orphan track dropped


def test_set_from_prior_default_focal():
    r = Reconstruction()
    v = r.add_view("x.jpg")
    prior = CameraIntrinsicsPrior(image_width=640, image_height=480)
    view = r.view(v)
    view.camera.set_from_prior(prior)
    assert view.camera.focal_length == 1.2 * 640  # ref default rule
    assert view.camera.intrinsics[3] == 320.0


def test_track_builder_consistency():
    r = Reconstruction()
    vids = [r.add_view(f"{i}.jpg") for i in range(4)]
    tb = TrackBuilder(min_track_length=2)
    # one clean track across 3 views
    tb.add_feature_correspondence(vids[0], (1, 1), vids[1], (2, 2))
    tb.add_feature_correspondence(vids[1], (2, 2), vids[2], (3, 3))
    # an inconsistent track: view 3 appears twice
    tb.add_feature_correspondence(vids[3], (5, 5), vids[0], (6, 6))
    tb.add_feature_correspondence(vids[3], (7, 7), vids[0], (6, 6))
    n = tb.build_tracks(r)
    assert n == 1
    tid = list(r.tracks.keys())[0]
    assert len(r.track(tid).views) == 3


def test_view_graph():
    g = ViewGraph()
    g.add_edge(0, 1, TwoViewInfo(num_verified_matches=10))
    g.add_edge(1, 2, TwoViewInfo(num_verified_matches=20))
    g.add_edge(3, 4, TwoViewInfo(num_verified_matches=5))
    assert g.num_views() == 5 and g.num_edges() == 3
    assert g.has_edge(1, 0)
    assert g.edge(2, 1).num_verified_matches == 20
    removed = g.remove_disconnected_views()
    assert sorted(removed) == [3, 4]
    assert g.num_views() == 3
    g.remove_edge(0, 1)
    assert not g.has_edge(0, 1)


def test_union_find_and_cc():
    uf = UnionFind(6)
    uf.union(0, 1); uf.union(1, 2); uf.union(4, 5)
    assert uf.find(0) == uf.find(2) != uf.find(3)
    labels = connected_components(6, [(0, 1), (1, 2), (4, 5)])
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] not in (labels[0], labels[4])


def test_mst():
    edges = np.array([[0, 1], [1, 2], [0, 2], [2, 3]])
    w = np.array([1.0, 2.0, 10.0, 3.0])
    mst = minimum_spanning_tree(4, edges, w)
    assert sorted(mst) == [0, 1, 3]


def test_triplets():
    t = extract_triplets([(0, 1), (1, 2), (0, 2), (2, 3), (1, 3)])
    assert (0, 1, 2) in t and (1, 2, 3) in t and len(t) == 2


def test_to_ba_problem_round_trip(rng):
    r = Reconstruction()
    g = 0
    vids = [r.add_view(f"{i}.jpg", group=g) for i in range(3)]
    for v in vids:
        view = r.view(v)
        view.is_estimated = True
        view.camera.extrinsics = rng.normal(size=6)
        view.camera.intrinsics[0] = 500.0
    tids = []
    for i in range(5):
        t = r.add_track()
        tr = r.track(t)
        tr.is_estimated = True
        tr.point = np.append(rng.normal(size=3), 1.0)
        tids.append(t)
        for v in vids:
            r.add_observation(v, t, rng.normal(size=2))
    prob, maps = r.to_ba_problem()
    assert prob.extrinsics.shape == (3, 6)
    assert prob.points.shape == (5, 3)
    assert prob.obs_pix.shape == (15, 2)
    assert prob.intrinsics.shape[0] == 1  # single shared group
    # round trip
    import jax.numpy as jnp
    prob2 = prob._replace(points=prob.points + 1.0)
    r.update_from_ba(prob2, maps)
    np.testing.assert_allclose(r.track(tids[0]).xyz(),
                               np.asarray(prob.points[0]) + 1.0)


def test_sfm_utils(rng):
    from theiasfm_tpu.sfm.utils import (find_common_tracks_in_views,
                                        find_common_views_by_name)
    r = Reconstruction()
    v1, v2, v3 = [r.add_view(f"u{i}.jpg") for i in range(3)]
    t1, t2 = r.add_track(), r.add_track()
    r.add_observation(v1, t1, (0, 0))
    r.add_observation(v2, t1, (1, 1))
    r.add_observation(v2, t2, (2, 2))
    r.add_observation(v3, t2, (3, 3))
    assert find_common_tracks_in_views(r, [v1, v2]) == [t1]
    assert find_common_tracks_in_views(r, [v1, v3]) == []
    r2 = Reconstruction()
    r2.add_view("u1.jpg")
    r2.add_view("zz.jpg")
    assert find_common_views_by_name(r, r2) == ["u1.jpg"]
