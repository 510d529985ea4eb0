"""Native COLMAP decoder: build, parity with the Python parsers, fallback."""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from nerf_fl_tpu.data import colmap_native
from nerf_fl_tpu.data.colmap import read_points3d_binary
from tests.fixtures import make_phototourism_scene


@pytest.fixture(scope="module")
def points_file(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("native_scene"))
    make_phototourism_scene(root, n_images=4, size=16, n_points=300)
    return os.path.join(root, "dense/sparse/points3D.bin")


@pytest.fixture(scope="module")
def built_lib():
    r = subprocess.run([sys.executable,
                        os.path.join(REPO, "tools/build_native.py")],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"no C toolchain: {r.stderr}")
    colmap_native._lib = None  # force reload
    assert colmap_native.native_available()
    return True


def _check_against_reference_parser(path, arrays):
    ref = read_points3d_binary(path)
    keys = list(ref.keys())
    np.testing.assert_array_equal(arrays.ids, keys)
    np.testing.assert_allclose(arrays.xyz,
                               np.array([ref[k].xyz for k in keys]))
    np.testing.assert_array_equal(arrays.rgb.astype(np.int64),
                                  np.array([ref[k].rgb for k in keys]))
    np.testing.assert_array_equal(
        arrays.track_len, [len(ref[k].image_ids) for k in keys])


def test_python_fallback_matches_parser(points_file):
    buf = open(points_file, "rb").read()
    arrays = colmap_native._python_fallback(buf, with_tracks=True)
    _check_against_reference_parser(points_file, arrays)
    ref = read_points3d_binary(points_file)
    flat = np.concatenate([
        np.stack([ref[k].image_ids, ref[k].point2D_idxs], 1)
        for k in ref if len(ref[k].image_ids)])
    np.testing.assert_array_equal(arrays.tracks, flat)


def test_native_matches_python(points_file, built_lib):
    native = colmap_native.read_points3d_arrays(points_file, with_tracks=True)
    _check_against_reference_parser(points_file, native)
    buf = open(points_file, "rb").read()
    py = colmap_native._python_fallback(buf, with_tracks=True)
    np.testing.assert_array_equal(native.tracks, py.tracks)
    np.testing.assert_allclose(native.error, py.error)


def test_native_rejects_truncated(points_file, built_lib):
    buf = open(points_file, "rb").read()
    trunc = os.path.join(os.path.dirname(points_file), "trunc.bin")
    with open(trunc, "wb") as f:
        f.write(buf[:len(buf) // 2])
    with pytest.raises(ValueError):
        colmap_native.read_points3d_arrays(trunc)
