"""EXIF-based calibration priors.

ref: src/theia/sfm/exif_reader.{h,cc} — reads EXIF focal length (mm),
make/model, and GPS; converts to a pixel focal length via a
camera-sensor-width database
(focal_px = focal_mm / sensor_width_mm * image_width_px,
exif_reader.cc:94-218). Here EXIF comes from PIL; the sensor database
is pluggable: pass a file of lines "make model sensor_width_mm"
(compatible with the common public databases) or rely on the built-in
subset + the EXIF FocalPlaneXResolution fallback the reference also
uses.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from .reconstruction import CameraIntrinsicsPrior

# Small built-in subset of common sensors (mm). Extend via
# load_sensor_database(path).
_BUILTIN_SENSORS = {
    "canon eos 5d": 35.8, "canon eos 5d mark ii": 36.0,
    "canon eos 5d mark iii": 36.0, "canon eos 6d": 35.8,
    "canon eos 7d": 22.3, "canon eos rebel t3i": 22.3,
    "canon eos 400d digital": 22.2, "canon eos 20d": 22.5,
    "canon eos 30d": 22.5, "canon eos 40d": 22.2,
    "canon eos 50d": 22.3, "canon eos 60d": 22.3,
    "canon powershot g9": 7.6, "canon powershot s95": 7.6,
    "nikon d90": 23.6, "nikon d3000": 23.6, "nikon d3100": 23.1,
    "nikon d5100": 23.6, "nikon d700": 36.0, "nikon d750": 35.9,
    "nikon d80": 23.6, "nikon d70": 23.7, "nikon d200": 23.6,
    "nikon d300": 23.6, "nikon d7000": 23.6,
    "sony alpha 7": 35.8, "sony ilce-7m2": 35.8,
    "sony dsc-rx100": 13.2,
    "apple iphone 6": 4.8, "apple iphone 7": 4.8,
    "apple iphone 8": 4.8, "apple iphone x": 4.8,
    "samsung galaxy s7": 5.76,
}


class ExifReader:
    """ref: ExifReader (exif_reader.h)."""

    def __init__(self, sensor_database_path: Optional[str] = None):
        self.sensors: Dict[str, float] = dict(_BUILTIN_SENSORS)
        # external database (same line format as the public
        # sensor-width databases / ref data/camera_sensor_database.txt);
        # THEIASFM_SENSOR_DB env var supplies a default path
        sensor_database_path = (sensor_database_path or
                                os.environ.get("THEIASFM_SENSOR_DB"))
        if sensor_database_path and os.path.exists(sensor_database_path):
            self.load_sensor_database(sensor_database_path)

    def load_sensor_database(self, path: str):
        """Lines: <make+model words> <sensor_width_mm>."""
        with open(path) as f:
            for line in f:
                parts = line.strip().split()
                if len(parts) < 2:
                    continue
                try:
                    width = float(parts[-1])
                except ValueError:
                    continue
                name = " ".join(parts[:-1]).lower()
                self.sensors[name] = width

    def extract_exif_metadata(self, image_path: str
                              ) -> CameraIntrinsicsPrior:
        """ref: ExifReader::ExtractEXIFMetadata."""
        from PIL import ExifTags, Image

        prior = CameraIntrinsicsPrior()
        with Image.open(image_path) as img:
            prior.image_width, prior.image_height = img.size
            exif = img.getexif()
            if not exif:
                return prior
            tags = {ExifTags.TAGS.get(k, k): v for k, v in exif.items()}
            ifd = exif.get_ifd(0x8769) if hasattr(exif, "get_ifd") else {}
            tags.update({ExifTags.TAGS.get(k, k): v
                         for k, v in (ifd or {}).items()})

        focal_mm = tags.get("FocalLength")
        make = str(tags.get("Make", "")).strip().lower()
        model = str(tags.get("Model", "")).strip().lower()
        name = f"{make} {model}".strip()
        if model.startswith(make) and make:
            name = model

        sensor_width = self.sensors.get(name) or self.sensors.get(model)
        if sensor_width is None:
            # FocalPlane*Resolution fallback (ref exif_reader.cc). The
            # resolution refers to the ORIGINAL capture frame, whose
            # width is ExifImageWidth (the stored image may be resized).
            fpx = tags.get("FocalPlaneXResolution")
            unit = tags.get("FocalPlaneResolutionUnit", 2)
            capture_w = tags.get("ExifImageWidth", prior.image_width)
            if fpx:
                per_mm = {2: 25.4, 3: 10.0, 4: 1.0, 5: 0.001}.get(
                    int(unit), 25.4)
                try:
                    sensor_width = float(capture_w) / float(fpx) * per_mm
                except (ZeroDivisionError, TypeError):
                    sensor_width = None

        if focal_mm and sensor_width:
            try:
                prior.focal_length = (float(focal_mm) / sensor_width *
                                      prior.image_width)
            except (TypeError, ZeroDivisionError):
                pass
        prior.principal_point = (prior.image_width / 2.0,
                                 prior.image_height / 2.0)

        # GPS (ref: gps priors wired into CameraIntrinsicsPrior)
        gps = None
        try:
            from PIL import Image
            with Image.open(image_path) as img:
                gps_ifd = img.getexif().get_ifd(0x8825)
            if gps_ifd:
                gps = _parse_gps(gps_ifd)
        except Exception:
            gps = None
        if gps is not None:
            prior.position = gps
        return prior


def _parse_gps(gps_ifd):
    def to_deg(vals, ref, neg):
        d = float(vals[0]) + float(vals[1]) / 60 + float(vals[2]) / 3600
        return -d if ref in neg else d

    try:
        lat = to_deg(gps_ifd[2], gps_ifd.get(1, "N"), ("S",))
        lon = to_deg(gps_ifd[4], gps_ifd.get(3, "E"), ("W",))
        alt = float(gps_ifd.get(6, 0.0))
        return np.asarray([lat, lon, alt])
    except (KeyError, TypeError, IndexError):
        return None


def lla_to_ecef(lat_deg, lon_deg, alt_m):
    """WGS-84 LLA -> ECEF. ref: src/theia/sfm/gps_converter.{h,cc}."""
    a = 6378137.0
    e2 = 6.69437999014e-3
    lat = np.radians(lat_deg)
    lon = np.radians(lon_deg)
    N = a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
    x = (N + alt_m) * np.cos(lat) * np.cos(lon)
    y = (N + alt_m) * np.cos(lat) * np.sin(lon)
    z = (N * (1 - e2) + alt_m) * np.sin(lat)
    return np.asarray([x, y, z])


def ecef_to_lla(x, y, z):
    """ECEF -> WGS-84 LLA (closed-form Bowring iteration-free approx +
    one refinement). ref: gps_converter.cc."""
    a = 6378137.0
    e2 = 6.69437999014e-3
    b = a * np.sqrt(1 - e2)
    ep2 = (a * a - b * b) / (b * b)
    p = np.hypot(x, y)
    th = np.arctan2(a * z, b * p)
    lon = np.arctan2(y, x)
    lat = np.arctan2(z + ep2 * b * np.sin(th) ** 3,
                     p - e2 * a * np.cos(th) ** 3)
    N = a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
    alt = p / np.cos(lat) - N
    return np.degrees(lat), np.degrees(lon), alt
