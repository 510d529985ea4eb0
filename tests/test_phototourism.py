"""COLMAP parser + Phototourism dataset tests on a synthetic binary fixture,
including cross-checks against the reference parser."""
import os
import subprocess
import sys

import numpy as np
import pytest

from nerf_fl_tpu.data.colmap import (qvec2rotmat, read_cameras_binary,
                                     read_images_binary,
                                     read_points3d_binary, read_points3d_xyz,
                                     rotmat2qvec)
from nerf_fl_tpu.data.phototourism import PhototourismDataset

from tests.fixtures import make_phototourism_scene


@pytest.fixture(scope="module")
def tour_scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("minitour"))
    make_phototourism_scene(root, n_images=5, size=32)
    return root


def _ref_colmap():
    sys.path.insert(0, "/root/reference/datasets")
    try:
        import colmap_utils
        return colmap_utils
    finally:
        sys.path.pop(0)


def test_colmap_parsers_match_reference(tour_scene):
    ref = _ref_colmap()
    sparse = os.path.join(tour_scene, "dense/sparse")

    cams = read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    rcams = ref.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    assert set(cams) == set(rcams)
    for k in cams:
        assert cams[k].model == rcams[k].model
        assert cams[k].width == rcams[k].width
        np.testing.assert_allclose(cams[k].params, rcams[k].params)

    imgs = read_images_binary(os.path.join(sparse, "images.bin"))
    rimgs = ref.read_images_binary(os.path.join(sparse, "images.bin"))
    assert set(imgs) == set(rimgs)
    for k in imgs:
        assert imgs[k].name == rimgs[k].name
        assert imgs[k].camera_id == rimgs[k].camera_id
        np.testing.assert_allclose(imgs[k].qvec, rimgs[k].qvec)
        np.testing.assert_allclose(imgs[k].tvec, rimgs[k].tvec)
        np.testing.assert_allclose(imgs[k].qvec2rotmat(),
                                   rimgs[k].qvec2rotmat())

    pts = read_points3d_binary(os.path.join(sparse, "points3D.bin"))
    rpts = ref.read_points3d_binary(os.path.join(sparse, "points3D.bin"))
    assert set(pts) == set(rpts)
    for k in list(pts)[:20]:
        np.testing.assert_allclose(pts[k].xyz, rpts[k].xyz)
        np.testing.assert_array_equal(pts[k].image_ids, rpts[k].image_ids)

    xyz = read_points3d_xyz(os.path.join(sparse, "points3D.bin"))
    np.testing.assert_allclose(
        xyz, np.array([pts[k].xyz for k in pts]), atol=0)


def test_quaternion_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(5):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = qvec2rotmat(q)
        np.testing.assert_allclose(rotmat2qvec(R), q, atol=1e-8)


def test_dataset_train_split(tour_scene):
    ds = PhototourismDataset(tour_scene, "train", img_downscale=1)
    assert ds.ray_format == "camdir" and not ds.white_back
    assert ds.N_images_train == 4 and ds.N_images_test == 1
    n = 4 * 32 * 32
    assert ds.all_rays.shape == (n, 5)
    assert ds.all_rgbs.shape == (n, 3)
    # ts are the sparse COLMAP image ids
    assert set(np.unique(ds.all_ts)) == set(ds.img_ids_train)
    # rescale put max far at 5
    assert max(ds.fars.values()) == pytest.approx(5.0, rel=1e-5)
    for id_ in ds.img_ids_train:
        assert 0 < ds.nears[id_] < ds.fars[id_] <= 5.0 + 1e-5
    # poses give cameras looking at the origin from ~radius 6 (rescaled)
    scale = 6.0 / np.linalg.norm(ds.poses[0, :, 3]) * 1.0
    assert 0.5 < scale < 10


def test_dataset_val_split(tour_scene):
    ds = PhototourismDataset(tour_scene, "val", img_downscale=1, val_num=2)
    assert ds.img_downscale == 2  # forced >= 2
    assert len(ds) == 2
    s = ds[0]
    n = 16 * 16
    assert s["rays"].shape == (n, 8)
    assert s["rgbs"].shape == (n, 3)
    assert (s["ts"] == ds.val_id).all()
    np.testing.assert_allclose(
        np.linalg.norm(s["rays"][:, 3:6], axis=-1), 1.0, atol=1e-5)


def test_dataset_test_split_with_injected_path(tour_scene):
    ds = PhototourismDataset(tour_scene, "test", img_downscale=1)
    ds.test_img_w = ds.test_img_h = 16
    f = 16 / 2 / np.tan(np.pi / 6)
    ds.test_K = np.array([[f, 0, 8], [0, f, 8], [0, 0, 1]])
    ds.test_appearance_idx = ds.img_ids[0]
    ds.poses_test = np.tile(ds.poses_dict[ds.img_ids[0]], (3, 1, 1))
    assert len(ds) == 3
    s = ds[1]
    assert s["rays"].shape == (256, 8)
    np.testing.assert_allclose(s["rays"][:, 6], 0.0)
    np.testing.assert_allclose(s["rays"][:, 7], 5.0)
    assert (s["ts"] == ds.img_ids[0]).all()


def test_cache_roundtrip(tour_scene):
    import prepare_phototourism as prep
    args = type("A", (), {"root_dir": tour_scene, "img_downscale": 1})
    prep.main(args)
    assert os.path.exists(os.path.join(tour_scene, "cache/rays1.npy"))
    rays = np.load(os.path.join(tour_scene, "cache/rays1.npy"))
    assert rays.shape[1] == 6  # reference cache layout

    fresh = PhototourismDataset(tour_scene, "train", img_downscale=1)
    cached = PhototourismDataset(tour_scene, "train", img_downscale=1,
                                 use_cache=True)
    np.testing.assert_allclose(fresh.all_rays, cached.all_rays, atol=1e-6)
    np.testing.assert_array_equal(fresh.all_ts, cached.all_ts)
    np.testing.assert_allclose(fresh.all_rgbs, cached.all_rgbs, atol=1e-6)
    np.testing.assert_allclose(fresh.poses, cached.poses, atol=1e-6)


def test_poses_look_at_origin(tour_scene):
    # fixture cameras look at the origin; after COLMAP roundtrip + axis flip
    # the c2w -z axis (viewing dir) must point from eye toward origin
    ds = PhototourismDataset(tour_scene, "train", img_downscale=1)
    for i in range(len(ds.poses)):
        eye = ds.poses[i, :, 3]
        back = ds.poses[i, :, 2]  # +z = back
        to_origin = -eye / np.linalg.norm(eye)
        np.testing.assert_allclose(-back / np.linalg.norm(back), to_origin,
                                   atol=1e-4)
