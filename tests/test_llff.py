"""LLFF dataset tests on a synthetic poses_bounds.npy fixture."""
import os

import numpy as np
import pytest
from PIL import Image

from nerf_fl_tpu.data.llff import (LLFFDataset, average_poses, center_poses,
                                   create_spheric_poses, create_spiral_poses)

from tests.fixtures import _look_at_pose, _render_ball


@pytest.fixture(scope="module")
def llff_scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("llff_mini"))
    from tests.fixtures import make_llff_scene
    make_llff_scene(root, n_images=5, width=40, height=30, focal=45.0)
    return root


def test_average_and_center_poses():
    rng = np.random.default_rng(1)
    poses = np.stack([_look_at_pose(0.1 * i, 4.0)[:3] for i in range(6)])
    centered, avg = center_poses(poses)
    assert centered.shape == (6, 3, 4)
    # after centering, the average pose is ~identity
    c_avg = average_poses(centered)
    np.testing.assert_allclose(c_avg[:, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(c_avg[:, 3], 0, atol=1e-6)


def test_spiral_and_spheric_paths():
    sp = create_spiral_poses(np.array([1.0, 1.0, 0.5]), 3.5, n_poses=30)
    assert sp.shape == (30, 3, 4)
    # all rotations orthonormal
    rtr = np.einsum("nij,nkj->nik", sp[:, :, :3], sp[:, :, :3])
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (30, 1, 1)), atol=1e-6)
    sph = create_spheric_poses(2.0, n_poses=12)
    assert sph.shape == (12, 3, 4)


def test_llff_train_split_ndc(llff_scene):
    ds = LLFFDataset(llff_scene, "train", img_wh=(40, 30))
    assert ds.ray_format == "world" and not ds.white_back
    n = 4 * 40 * 30  # one image held out for val
    assert ds.all_rays.shape == (n, 8)
    assert ds.all_rgbs.shape == (n, 3)
    # NDC: near/far are 0/1
    np.testing.assert_allclose(ds.all_rays[:, 6], 0.0)
    np.testing.assert_allclose(ds.all_rays[:, 7], 1.0)
    # nearest depth rescaled to 1/0.75
    assert ds.bounds.min() == pytest.approx(1 / 0.75, rel=1e-6)


def test_llff_val_and_test_splits(llff_scene):
    val = LLFFDataset(llff_scene, "val", img_wh=(40, 30))
    s = val[0]
    assert s["rays"].shape == (1200, 8) and s["rgbs"].shape == (1200, 3)
    test = LLFFDataset(llff_scene, "test", img_wh=(40, 30))
    assert len(test) == 120  # spiral path
    assert test[0]["rays"].shape == (1200, 8)
    tt = LLFFDataset(llff_scene, "test_train", img_wh=(40, 30))
    assert len(tt) == 5


def test_llff_spheric(llff_scene):
    ds = LLFFDataset(llff_scene, "train", img_wh=(40, 30),
                     spheric_poses=True)
    # non-NDC: near = bounds.min(), far = min(8*near, bounds.max())
    near = ds.bounds.min()
    np.testing.assert_allclose(ds.all_rays[:, 6], near, rtol=1e-5)
    assert (ds.all_rays[:, 7] <= 8 * near + 1e-4).all()
