"""EXIF reader tests mirroring ref: src/theia/sfm/exif_reader_test.cc
(same fixtures, same expected focal length / GPS values)."""
import numpy as np

from theiasfm_tpu.sfm.exif_reader import (ExifReader, ecef_to_lla,
                                          lla_to_ecef)

EXIF_IMG = "/root/reference/data/image/exif.jpg"
GPS_IMG = "/root/reference/data/image/gps_exif.jpg"


def test_exif_focal_length():
    prior = ExifReader().extract_exif_metadata(EXIF_IMG)
    assert prior.image_width == 960 and prior.image_height == 1280
    # ref exif_reader_test.cc:54 expects 1304.84
    assert abs(prior.focal_length - 1304.84) < 0.5, prior.focal_length


def test_gps_exif():
    prior = ExifReader().extract_exif_metadata(GPS_IMG)
    assert prior.position is not None
    lat, lon, alt = prior.position
    # ref exif_reader_test.cc:68-75
    assert abs(lat - 33.875461) < 1e-4
    assert abs(lon - (-116.301620)) < 1e-4
    assert abs(alt - 304) < 1.0


def test_gps_converter_round_trip(rng):
    """ref: src/theia/sfm/gps_converter_test.cc."""
    for _ in range(20):
        lla = (rng.uniform(-89, 89), rng.uniform(-180, 180),
               rng.uniform(-100, 5000))
        xyz = lla_to_ecef(*lla)
        back = ecef_to_lla(*xyz)
        np.testing.assert_allclose(back, lla, atol=1e-6)
