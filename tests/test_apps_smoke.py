"""CLI application smoke tests on the real fountain-11 fixture —
every app here is run as a subprocess exactly as a user would
(ref: the applications/ binaries are the reference's user surface;
§2.9 of SURVEY.md)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FOUNTAIN = "/root/reference/data/sfm/fountain11.bin"
GT = "/root/reference/data/sfm/gt_fountain11.bin"
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)


def run_app(args, timeout=300):
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, timeout=timeout, cwd=REPO, env=ENV)


def test_compute_reconstruction_statistics():
    r = run_app(["apps/compute_reconstruction_statistics.py",
                 "--reconstruction", FOUNTAIN])
    assert r.returncode == 0, r.stderr[-800:]
    out = r.stdout
    assert "views" in out.lower() or "cameras" in out.lower(), out[:400]
    # the fixture's median reprojection error is ~0.23 px; the app
    # must report a sub-pixel median
    import re
    m = re.search(r"reprojection error[^\n]*median ([0-9.]+)",
                  out.lower())
    assert m and float(m.group(1)) < 1.0, out[:800]


def test_compare_reconstructions():
    r = run_app(["apps/compare_reconstructions.py",
                 "--reference_reconstruction", GT,
                 "--reconstruction_to_align", FOUNTAIN])
    assert r.returncode == 0, r.stderr[-800:]
    assert "error" in r.stdout.lower() or "position" in r.stdout.lower()


def test_convert_reconstruction_roundtrip(tmp_path):
    npz = str(tmp_path / "fountain.npz")
    r = run_app(["apps/convert_reconstruction.py",
                 "--input", FOUNTAIN, "--output", npz,
                 "--output_format", "native"])
    assert r.returncode == 0, r.stderr[-800:]
    assert os.path.exists(npz) or os.path.exists(npz + ".npz"), \
        r.stdout[-400:]


def test_write_ply(tmp_path):
    ply = str(tmp_path / "fountain.ply")
    r = run_app(["apps/write_reconstruction_ply_file.py",
                 "--reconstruction", FOUNTAIN, "--ply_file", ply])
    assert r.returncode == 0, r.stderr[-800:]
    assert os.path.exists(ply)
    head = open(ply, "rb").read(200).decode("ascii", "ignore")
    assert head.startswith("ply"), head[:40]


def test_export_colmap(tmp_path):
    out = str(tmp_path / "colmap")
    os.makedirs(out, exist_ok=True)
    r = run_app(["apps/export_colmap_files.py",
                 "--input_reconstruction_file", FOUNTAIN,
                 "--output_folder", out])
    assert r.returncode == 0, r.stderr[-800:]
    files = set(os.listdir(out))
    assert {"cameras.txt", "images.txt", "points3D.txt"} <= files, files


def test_export_nvm(tmp_path):
    nvm = str(tmp_path / "fountain.nvm")
    r = run_app(["apps/export_to_nvm_file.py",
                 "--input_reconstruction_file", FOUNTAIN,
                 "--output_nvm_file", nvm])
    assert r.returncode == 0, r.stderr[-800:]
    assert os.path.exists(nvm)
    assert open(nvm).readline().strip().startswith("NVM_V3")
