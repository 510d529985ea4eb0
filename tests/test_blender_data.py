"""Blender dataset pipeline tests on the synthetic fixture scene."""
import numpy as np
import pytest
from PIL import Image

from nerf_fl_tpu.data import RayBatcher
from nerf_fl_tpu.data.blender import BlenderDataset
from nerf_fl_tpu.data.perturbations import add_perturbation


def test_train_buffers_shapes(blender_scene):
    ds = BlenderDataset(blender_scene, "train", img_wh=(40, 40))
    n = 4 * 40 * 40
    assert ds.all_rays.shape == (n, 8)
    assert ds.all_rgbs.shape == (n, 3)
    assert ds.all_ts.shape == (n,)
    assert ds.all_rays.dtype == np.float32 and ds.all_ts.dtype == np.int32
    assert ds.white_back and ds.ray_format == "world"
    # near/far columns
    np.testing.assert_allclose(ds.all_rays[:, 6], 2.0)
    np.testing.assert_allclose(ds.all_rays[:, 7], 6.0)
    # directions are unit-norm
    np.testing.assert_allclose(
        np.linalg.norm(ds.all_rays[:, 3:6], axis=-1), 1.0, atol=1e-5)
    assert ds.all_ts.min() == 0 and ds.all_ts.max() == 3


def test_train_getitem(blender_scene):
    ds = BlenderDataset(blender_scene, "train", img_wh=(40, 40))
    s = ds[5]
    assert s["rays"].shape == (8,) and s["rgbs"].shape == (3,)


def test_val_sample(blender_scene):
    ds = BlenderDataset(blender_scene, "val", img_wh=(40, 40))
    assert len(ds) == 2
    s = ds[0]
    assert s["rays"].shape == (1600, 8)
    assert s["rgbs"].shape == (1600, 3)
    assert s["ts"].shape == (1600,) and (s["ts"] == 0).all()
    assert s["valid_mask"].shape == (1600,)
    assert s["c2w"].shape == (3, 4)
    # background blends to white
    bg = ~s["valid_mask"]
    if bg.any():
        np.testing.assert_allclose(s["rgbs"][bg], 1.0, atol=1e-6)


def test_camdir_format_for_pose_refinement(blender_scene):
    ds = BlenderDataset(blender_scene, "train", img_wh=(40, 40),
                        refine_pose=True)
    assert ds.ray_format == "camdir"
    assert ds.all_rays.shape[1] == 5
    assert ds.poses.shape == (4, 3, 4)
    # camera-frame dirs: all have z = -1 before rotation/normalization
    np.testing.assert_allclose(ds.all_rays[:, 2], -1.0, atol=1e-6)


def test_perturbation_determinism():
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (64, 64, 4), np.uint8),
        "RGBA")
    a = add_perturbation(img.copy(), ["color"], seed=3)
    b = add_perturbation(img.copy(), ["color"], seed=3)
    c = add_perturbation(img.copy(), ["color"], seed=4)
    assert np.array_equal(np.array(a), np.array(b))
    assert not np.array_equal(np.array(a), np.array(c))


def test_occ_perturbation_draws_stripes():
    img = Image.new("RGBA", (800, 800), (0, 0, 0, 255))
    out = np.array(add_perturbation(img, ["occ"], seed=1))
    # a 200x200 block of colored stripes appears inside [200, 600)
    region = out[200:600, 200:600, :3]
    assert (region.sum(-1) > 0).any()
    assert (np.array(out)[:180, :180, :3] == 0).all()


def test_first_train_image_never_perturbed(blender_scene):
    clean = BlenderDataset(blender_scene, "train", img_wh=(40, 40))
    pert = BlenderDataset(blender_scene, "train", img_wh=(40, 40),
                          perturbation=["color"])
    n_px = 40 * 40
    np.testing.assert_array_equal(clean.all_rgbs[:n_px], pert.all_rgbs[:n_px])
    assert not np.array_equal(clean.all_rgbs[n_px:2 * n_px],
                              pert.all_rgbs[n_px:2 * n_px])


def test_test_train_split_returns_originals(blender_scene):
    ds = BlenderDataset(blender_scene, "test_train", img_wh=(40, 40),
                        perturbation=["color"])
    s0, s1 = ds[0], ds[1]
    assert "original_rgbs" in s1
    # idx 0 never perturbed -> equals original
    np.testing.assert_array_equal(s0["rgbs"], s0["original_rgbs"])
    assert not np.array_equal(s1["rgbs"], s1["original_rgbs"])


def test_batcher_epoch_determinism_and_coverage(blender_scene):
    ds = BlenderDataset(blender_scene, "train", img_wh=(40, 40))
    b = RayBatcher(ds.all_rays, ds.all_ts, ds.all_rgbs, batch_size=512, seed=7)
    b1 = [x["rays"][:2].copy() for x in b.epoch(0)]
    b2 = [x["rays"][:2].copy() for x in b.epoch(0)]
    b3 = [x["rays"][:2].copy() for x in b.epoch(1)]
    assert all(np.array_equal(x, y) for x, y in zip(b1, b2))
    assert not all(np.array_equal(x, y) for x, y in zip(b1, b3))
    assert b.steps_per_epoch() == len(ds.all_rays) // 512
    batch = next(iter(b.epoch(0)))
    assert set(batch) == {"rays", "ts", "rgbs"}
    assert batch["rays"].shape == (512, 8)


def test_batcher_host_sharding(blender_scene):
    """The two hosts' slices of each batch concatenate to exactly the
    single-host batch (the multihost data contract), and unsupported
    configurations are rejected loudly."""
    import pytest

    ds = BlenderDataset(blender_scene, "train", img_wh=(40, 40))
    full = RayBatcher(ds.all_rays, ds.all_ts, ds.all_rgbs, 512, seed=7)
    h0 = RayBatcher(ds.all_rays, ds.all_ts, ds.all_rgbs, 512, seed=7,
                    host_index=0, host_count=2)
    h1 = RayBatcher(ds.all_rays, ds.all_ts, ds.all_rgbs, 512, seed=7,
                    host_index=1, host_count=2)
    for bf, b0, b1 in zip(full.epoch(3), h0.epoch(3), h1.epoch(3)):
        for k in bf:
            np.testing.assert_array_equal(
                np.concatenate([b0[k], b1[k]]), bf[k])
    with pytest.raises(ValueError, match="divisible"):
        RayBatcher(ds.all_rays, ds.all_ts, ds.all_rgbs, 511, host_count=2)
    with pytest.raises(ValueError, match="drop_last"):
        RayBatcher(ds.all_rays, ds.all_ts, ds.all_rgbs, 512,
                   drop_last=False, host_count=2)
