"""I/O tests mirroring ref: src/theia/io/*_test.cc (round trips,
calibration JSON fixture parsing, Theia binary interop)."""
import numpy as np
import pytest

from theiasfm_tpu.io import (read_bundler, read_calibration,
                             read_nvm, read_reconstruction,
                             read_theia_reconstruction, write_bundler,
                             write_calibration, write_colmap, write_nvm,
                             write_ply, write_reconstruction)
from theiasfm_tpu.sfm.reconstruction import Reconstruction


def make_recon(rng, n_views=4, n_tracks=20):
    r = Reconstruction()
    vids = [r.add_view(f"im{i}.jpg", group=0) for i in range(n_views)]
    for v in vids:
        view = r.views[v]
        view.is_estimated = True
        view.camera.extrinsics = rng.normal(size=6)
        view.camera.intrinsics[0] = 500.0
        view.camera.intrinsics[3:5] = [320, 240]
        view.camera.image_width = 640
        view.camera.image_height = 480
    for i in range(n_tracks):
        t = r.add_track()
        tr = r.tracks[t]
        tr.is_estimated = True
        tr.point = np.append(rng.normal(size=3), 1.0)
        tr.color = rng.integers(0, 255, 3).astype(np.uint8)
        for v in vids[:3]:
            r.add_observation(v, t, rng.uniform(0, 480, 2))
    return r


def test_native_round_trip(tmp_path, rng):
    r = make_recon(rng)
    path = str(tmp_path / "recon.npz")
    write_reconstruction(r, path)
    r2 = read_reconstruction(path)
    assert r2.num_views() == r.num_views()
    assert r2.num_tracks() == r.num_tracks()
    v = r.views[0]
    v2 = r2.views[r2.view_id_from_name(v.name)]
    np.testing.assert_allclose(v2.camera.extrinsics, v.camera.extrinsics)
    n_obs = sum(len(vv.features) for vv in r2.views.values())
    assert n_obs == 60


def test_theia_binary_fixture():
    gt = read_theia_reconstruction(
        "/root/reference/data/sfm/gt_fountain11.bin")
    assert gt.num_views() == 11
    f11 = read_theia_reconstruction(
        "/root/reference/data/sfm/fountain11.bin")
    assert f11.num_views() == 11 and f11.num_tracks() == 16616


def test_theia_binary_writer_round_trip(tmp_path):
    """write_theia_reconstruction emits cereal PortableBinary that
    parses back identically (ref: reconstruction_writer.cc:53-66)."""
    from theiasfm_tpu.io import write_theia_reconstruction
    r = read_theia_reconstruction(
        "/root/reference/data/sfm/fountain11.bin")
    path = str(tmp_path / "rt.bin")
    write_theia_reconstruction(path, r)
    r2 = read_theia_reconstruction(path)
    assert r.num_views() == r2.num_views()
    assert r.num_tracks() == r2.num_tracks()
    for vid in r.views:
        v1, v2 = r.views[vid], r2.views[vid]
        assert v1.name == v2.name
        assert v1.is_estimated == v2.is_estimated
        assert v1.camera.model_type == v2.camera.model_type
        np.testing.assert_allclose(v1.camera.extrinsics,
                                   v2.camera.extrinsics)
        np.testing.assert_allclose(v1.camera.intrinsics,
                                   v2.camera.intrinsics)
        assert set(v1.features) == set(v2.features)
    for tid in r.tracks:
        np.testing.assert_allclose(r.tracks[tid].point,
                                   r2.tracks[tid].point)
        assert r.tracks[tid].views == r2.tracks[tid].views


def test_calibration_fixture():
    priors = read_calibration(
        "/root/reference/data/io/calibration_test.json")
    assert len(priors) == 4
    p = priors["view_1.jpg"]
    assert p.focal_length == 300 and p.image_width == 480
    assert p.principal_point == (240.0, 240.0)
    p4 = priors["view_4.jpg"]
    assert p4.camera_intrinsics_model_type.name == \
        "PINHOLE_RADIAL_TANGENTIAL"
    assert p4.tangential_distortion == (0.05, 0.05)


def test_calibration_round_trip(tmp_path, rng):
    priors = read_calibration(
        "/root/reference/data/io/calibration_test.json")
    path = str(tmp_path / "calib.json")
    write_calibration(priors, path)
    p2 = read_calibration(path)
    assert p2.keys() == priors.keys()
    assert p2["view_2.jpg"].aspect_ratio == 1.5


def test_bundler_round_trip(tmp_path, rng):
    r = make_recon(rng)
    lists = str(tmp_path / "list.txt")
    bundle = str(tmp_path / "bundle.out")
    write_bundler(r, lists, bundle)
    r2 = read_bundler(lists, bundle)
    assert r2.num_views() == 4
    assert len(r2.estimated_tracks()) == 20
    v = r.views[0]
    v2 = r2.views[r2.view_id_from_name("im0.jpg")]
    np.testing.assert_allclose(v2.camera.extrinsics, v.camera.extrinsics,
                               atol=1e-8)
    np.testing.assert_allclose(v2.camera.intrinsics[0], 500.0)
    # a track point survives
    pts = sorted(np.asarray([t.xyz() for t in r.tracks.values()]).ravel())
    pts2 = sorted(np.asarray([t.xyz() for t in r2.tracks.values()]).ravel())
    np.testing.assert_allclose(pts2, pts, atol=1e-6)


def test_nvm_round_trip(tmp_path, rng):
    r = make_recon(rng)
    path = str(tmp_path / "model.nvm")
    write_nvm(r, path)
    r2 = read_nvm(path)
    assert r2.num_views() == 4
    assert r2.num_tracks() == 20
    v = r.views[0]
    v2 = r2.views[r2.view_id_from_name("im0.jpg")]
    np.testing.assert_allclose(v2.camera.extrinsics[:3],
                               v.camera.extrinsics[:3], atol=1e-6)


def test_colmap_and_ply_export(tmp_path, rng):
    r = make_recon(rng)
    write_colmap(r, str(tmp_path / "colmap"))
    for fn in ("cameras.txt", "images.txt", "points3D.txt"):
        assert (tmp_path / "colmap" / fn).exists()
    lines = (tmp_path / "colmap" / "images.txt").read_text().splitlines()
    assert len([ln for ln in lines if not ln.startswith("#")]) == 8
    write_ply(r, str(tmp_path / "cloud.ply"))
    txt = (tmp_path / "cloud.ply").read_text()
    assert "element vertex 24" in txt  # 20 points + 4 cameras


def test_sift_key_files(tmp_path, rng):
    from theiasfm_tpu.io import (read_sift_binary, read_sift_text,
                                 write_sift_binary, write_sift_text)
    kps = rng.uniform(0, 500, (30, 4))
    desc = rng.uniform(0, 0.3, (30, 128)).astype(np.float32)
    write_sift_text(str(tmp_path / "a.key"), kps, desc)
    k2, d2 = read_sift_text(str(tmp_path / "a.key"))
    np.testing.assert_allclose(k2[:, :2], kps[:, :2], atol=0.01)
    np.testing.assert_allclose(d2, desc, atol=1.0 / 512)
    write_sift_binary(str(tmp_path / "a.bkey"), kps, desc)
    k3, d3 = read_sift_binary(str(tmp_path / "a.bkey"))
    np.testing.assert_allclose(k3, kps, rtol=1e-6)
    np.testing.assert_allclose(d3, desc, rtol=1e-6)


def test_pmvs_export(tmp_path, rng):
    from theiasfm_tpu.io import export_pmvs
    r = make_recon(rng)
    n = export_pmvs(r, str(tmp_path / "pmvs"))
    assert n == 4
    assert (tmp_path / "pmvs" / "txt" / "00000000.txt").exists()
    assert (tmp_path / "pmvs" / "pmvs_options.txt").exists()


def test_native_theia_reader_parity():
    """C++ reader (native/theia_io.cc) must parse identically to the
    pure-Python cereal parser."""
    import numpy as np
    from theiasfm_tpu.io.theia_format import (
        read_theia_reconstruction, read_theia_reconstruction_native)

    path = "/root/reference/data/sfm/fountain11.bin"
    rn = read_theia_reconstruction_native(path)
    if rn is None:
        import pytest
        pytest.skip("native library not built")
    rp = read_theia_reconstruction(path, prefer_native=False)
    assert rn.num_views() == rp.num_views()
    assert rn.num_tracks() == rp.num_tracks()
    for vid in rp.views:
        vp, vn = rp.view(vid), rn.view(vid)
        assert vp.name == vn.name
        np.testing.assert_array_equal(vp.camera.extrinsics,
                                      vn.camera.extrinsics)
        np.testing.assert_array_equal(vp.camera.intrinsics,
                                      vn.camera.intrinsics)
        assert set(vp.features) == set(vn.features)
    for tid in rp.tracks:
        np.testing.assert_array_equal(rp.track(tid).point,
                                      rn.track(tid).point)


def test_native_reader_roundtrip_writer(tmp_path):
    """Our writer's output parses identically through both readers."""
    import numpy as np
    from theiasfm_tpu.io.theia_format import (
        read_theia_reconstruction, read_theia_reconstruction_native,
        write_theia_reconstruction)

    src = read_theia_reconstruction(
        "/root/reference/data/sfm/fountain11.bin", prefer_native=False)
    path = str(tmp_path / "rt_native.bin")
    write_theia_reconstruction(path, src)
    rn = read_theia_reconstruction_native(path)
    if rn is None:
        import pytest
        pytest.skip("native library not built")
    assert rn.num_views() == src.num_views()
    assert rn.num_tracks() == src.num_tracks()
    for vid in src.views:
        np.testing.assert_allclose(rn.view(vid).camera.extrinsics,
                                   src.view(vid).camera.extrinsics)


def test_feature_file_roundtrip(tmp_path, rng):
    from theiasfm_tpu.io import (read_keypoints_and_descriptors,
                                 write_keypoints_and_descriptors)
    import numpy as np
    kp = rng.normal(size=(17, 4)).astype(np.float32)
    desc = rng.normal(size=(17, 128)).astype(np.float32)
    p = str(tmp_path / "img.features")
    write_keypoints_and_descriptors(p, kp, desc)
    kp2, desc2 = read_keypoints_and_descriptors(p)
    np.testing.assert_array_equal(kp, kp2)
    np.testing.assert_array_equal(desc, desc2)
