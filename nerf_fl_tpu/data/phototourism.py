"""Phototourism (COLMAP photo-collection) dataset — host NumPy pipeline.

Behavior follows reference datasets/phototourism.py:18-253:
  * scene *.tsv drives the train/test split; image ids come from images.bin
    (the tsv 'id' column is documented-broken and ignored),
  * per-image intrinsics rescaled by --img_downscale,
  * w2c -> c2w with the "right down front" -> "right up back" axis flip,
  * per-image near/far from the 0.1/99.9 percentiles of that image's visible
    3D points, globally rescaled so max far = 5,
  * train rays stored as camera-frame directions + [near, far] with the pose
    applied on device (the layout the fork's training loop expects),
  * val forces img_downscale >= 2 and replicates one image val_num times,
  * the pickle/npy cache contract of prepare_phototourism.py is preserved
    byte-for-byte (cache/rays{d}.npy keeps the reference 6-column layout).

Differences: ids live in an int32 ``all_ts`` array (split from the float ray
columns), and ``apply_refined_poses`` supports eval-time learned poses.
"""
from __future__ import annotations

import glob
import os
import pickle
from typing import Dict

import numpy as np
from PIL import Image

from .colmap import read_cameras_binary, read_images_binary
from .rays_np import get_ray_directions, get_rays


class PhototourismDataset:
    def __init__(self, root_dir: str, split: str = "train",
                 img_downscale: int = 1, val_num: int = 1,
                 use_cache: bool = False, refine_pose: bool = False):
        assert img_downscale >= 1, \
            "image can only be downsampled, please set img_downscale>=1!"
        self.root_dir = root_dir
        self.split = split
        self.refine_pose = refine_pose
        self.img_downscale = img_downscale
        if split == "val":  # downscale 1 at val would OOM host RAM
            self.img_downscale = max(2, self.img_downscale)
        self.val_num = max(1, val_num)
        self.use_cache = use_cache
        self.ray_format = "camdir"  # pose composed on device at train time
        self.read_meta()
        self.white_back = False

    # ------------------------------------------------------------------
    def _cache(self, name: str) -> str:
        return os.path.join(self.root_dir, "cache", name)

    def read_meta(self):
        tsv = glob.glob(os.path.join(self.root_dir, "*.tsv"))[0]
        self.scene_name = os.path.basename(tsv)[:-4]
        import pandas as pd
        self.files = pd.read_csv(tsv, sep="\t")
        self.files = self.files[~self.files["id"].isnull()]
        self.files.reset_index(inplace=True, drop=True)

        # image ids come from COLMAP images.bin — the tsv 'id' column is
        # documented-broken in the reference (phototourism.py:53-75)
        if self.use_cache:
            with open(self._cache("img_ids.pkl"), "rb") as f:
                self.img_ids = pickle.load(f)
            with open(self._cache("img_to_cam_id.pkl"), "rb") as f:
                self.image_to_cam = pickle.load(f)
            with open(self._cache("image_paths.pkl"), "rb") as f:
                self.image_paths = pickle.load(f)
        else:
            imdata = read_images_binary(
                os.path.join(self.root_dir, "dense/sparse/images.bin"))
            img_path_to_id = {v.name: v.id for v in imdata.values()}
            self.image_to_cam = {v.id: v.camera_id for v in imdata.values()}
            self.img_ids = []
            self.image_paths: Dict[int, str] = {}
            for filename in list(self.files["filename"]):
                id_ = img_path_to_id[filename]
                self.image_paths[id_] = filename
                self.img_ids.append(id_)

        # intrinsics, rescaled per image and keyed by camera id (a reference
        # quirk worth preserving for cache compatibility).
        # Scale-suffixed cache artifacts may not exist for THIS scale (val
        # forces img_downscale >= 2 while prepare_phototourism typically ran
        # at the train scale — a latent crash in the reference); fall back
        # to direct computation when missing.
        ks_cache = self._cache(f"Ks{self.img_downscale}.pkl")
        if self.use_cache and os.path.exists(ks_cache):
            with open(ks_cache, "rb") as f:
                self.Ks = pickle.load(f)
        else:
            self.Ks = {}
            camdata = read_cameras_binary(
                os.path.join(self.root_dir, "dense/sparse/cameras.bin"))
            for id_ in self.img_ids:
                cam_id = self.image_to_cam[id_]
                cam = camdata[cam_id]
                # COLMAP PINHOLE params = (fx, fy, cx, cy) with the
                # principal point at the image center, so cx*2 / cy*2
                # recover the full-resolution dimensions; each intrinsic
                # then scales by its axis's (downscaled dim / full dim)
                # ratio — kept in this exact arithmetic order so cached
                # K matrices stay bit-identical to the reference cache
                img_w, img_h = int(cam.params[2] * 2), int(cam.params[3] * 2)
                img_w_ = img_w // self.img_downscale
                img_h_ = img_h // self.img_downscale
                K = np.zeros((3, 3), dtype=np.float32)
                K[0, [0, 2]] = cam.params[[0, 2]] * img_w_ / img_w
                K[1, [1, 2]] = cam.params[[1, 3]] * img_h_ / img_h
                K[2, 2] = 1
                self.Ks[cam_id] = K

        # camera-to-world poses, flipped into the "right up back" convention
        if self.use_cache:
            self.poses = np.load(self._cache("poses.npy"))
        else:
            # COLMAP stores world->camera extrinsics (R|t); stack them as
            # homogeneous 4x4s, invert in one batched solve, keep the 3x4
            # top.  COLMAP's camera frame is right/down/front; NeRF wants
            # right/up/back, i.e. the y and z columns negate.
            w2c_mats = np.stack(
                [np.block([[imdata[i].qvec2rotmat(),
                            imdata[i].tvec.reshape(3, 1)],
                           [np.zeros((1, 3)), np.ones((1, 1))]])
                 for i in self.img_ids])
            self.poses = np.linalg.inv(w2c_mats)[:, :3]
            self.poses[..., 1:3] *= -1

        # per-image near/far from 0.1/99.9 percentiles of visible 3D points,
        # then one global rescale pinning the largest far plane to 5
        if self.use_cache:
            self.xyz_world = np.load(self._cache("xyz_world.npy"))
            with open(self._cache("nears.pkl"), "rb") as f:
                self.nears = pickle.load(f)
            with open(self._cache("fars.pkl"), "rb") as f:
                self.fars = pickle.load(f)
        else:
            from .colmap_native import read_points3d_arrays
            self.xyz_world = read_points3d_arrays(
                os.path.join(self.root_dir,
                             "dense/sparse/points3D.bin")).xyz
            xyz_h = np.concatenate(
                [self.xyz_world, np.ones((len(self.xyz_world), 1))], -1)
            self.nears, self.fars = {}, {}
            for i, id_ in enumerate(self.img_ids):
                xyz_cam = (xyz_h @ w2c_mats[i].T)[:, :3]
                xyz_cam = xyz_cam[xyz_cam[:, 2] > 0]  # in front of the camera
                self.nears[id_] = np.percentile(xyz_cam[:, 2], 0.1)
                self.fars[id_] = np.percentile(xyz_cam[:, 2], 99.9)
            max_far = np.fromiter(self.fars.values(), np.float32).max()
            scale = max_far / 5  # scale scene so max far = 5
            self.poses[..., 3] /= scale
            for k in self.nears:
                self.nears[k] /= scale
            for k in self.fars:
                self.fars[k] /= scale
            self.xyz_world /= scale

        self.poses_dict = {id_: self.poses[i]
                           for i, id_ in enumerate(self.img_ids)}

        # train/val membership comes from the scene tsv
        self.img_ids_train = [
            id_ for i, id_ in enumerate(self.img_ids)
            if self.files.loc[i, "split"] == "train"]
        self.img_ids_test = [
            id_ for i, id_ in enumerate(self.img_ids)
            if self.files.loc[i, "split"] == "test"]
        self.N_images_train = len(self.img_ids_train)
        self.N_images_test = len(self.img_ids_test)

        if self.split == "train":
            self._bake_train_rays()
        elif self.split in ("val", "test_train"):
            self.val_id = self.img_ids_train[0]
        # 'test': poses_test / test_K injected by eval.py

    def _bake_train_rays(self):
        if self.use_cache:
            # memory-map the big buffers: at img_downscale 1 the ray cache is
            # tens of GB (reference docstring phototourism.py:24-25); the
            # batch sampler's random gathers touch pages on demand
            all_rays = np.load(self._cache(f"rays{self.img_downscale}.npy"),
                               mmap_mode="r")
            all_rgbs = np.load(self._cache(f"rgbs{self.img_downscale}.npy"),
                               mmap_mode="r")
            # reference 6-col layout: [dir, near, far, id]
            self.all_rays = all_rays[:, :5]
            self.all_ts = np.asarray(all_rays[:, 5], np.int32)
            self.all_rgbs = all_rgbs
            return
        rays_list, rgb_list, ts_list = [], [], []
        for id_ in self.img_ids_train:
            img = Image.open(os.path.join(
                self.root_dir, "dense/images",
                self.image_paths[id_])).convert("RGB")
            img_w, img_h = img.size
            if self.img_downscale > 1:
                img_w //= self.img_downscale
                img_h //= self.img_downscale
                img = img.resize((img_w, img_h), Image.LANCZOS)
            rgb_list.append(
                np.asarray(img, np.float32).reshape(-1, 3) / 255.0)
            directions = get_ray_directions(
                img_h, img_w, self.Ks[self.image_to_cam[id_]]).reshape(-1, 3)
            n = len(directions)
            rays_list.append(np.concatenate([
                directions,
                np.full((n, 1), self.nears[id_], np.float32),
                np.full((n, 1), self.fars[id_], np.float32)], 1))
            ts_list.append(np.full((n,), id_, np.int32))
        self.all_rays = np.concatenate(rays_list, 0).astype(np.float32)
        self.all_rgbs = np.concatenate(rgb_list, 0).astype(np.float32)
        self.all_ts = np.concatenate(ts_list, 0)

    def reference_format_rays(self) -> np.ndarray:
        """(N, 6) [dir, near, far, id] — the cache file layout."""
        return np.concatenate(
            [self.all_rays, self.all_ts[:, None].astype(np.float32)], 1)

    def apply_refined_poses(self, poses_3x4: np.ndarray) -> None:
        """Replace poses with learned/refined ones (eval --refine_pose)."""
        self.poses = np.asarray(poses_3x4, np.float32)[:, :3, :4]
        self.poses_dict = {id_: self.poses[i]
                           for i, id_ in enumerate(self.img_ids)}

    # ------------------------------------------------------------------
    def __len__(self):
        if self.split == "train":
            return len(self.all_rays)
        if self.split == "test_train":
            return self.N_images_train
        if self.split == "val":
            return self.val_num
        return len(self.poses_test)

    def __getitem__(self, idx: int):
        if self.split == "train":
            return {"rays": self.all_rays[idx], "ts": self.all_ts[idx],
                    "rgbs": self.all_rgbs[idx]}

        if self.split in ("val", "test_train"):
            id_ = self.val_id if self.split == "val" \
                else self.img_ids_train[idx]
            c2w = self.poses_dict[id_].astype(np.float32)
            img = Image.open(os.path.join(
                self.root_dir, "dense/images",
                self.image_paths[id_])).convert("RGB")
            img_w, img_h = img.size
            if self.img_downscale > 1:
                img_w //= self.img_downscale
                img_h //= self.img_downscale
                img = img.resize((img_w, img_h), Image.LANCZOS)
            rgbs = np.asarray(img, np.float32).reshape(-1, 3) / 255.0
            directions = get_ray_directions(
                img_h, img_w, self.Ks[self.image_to_cam[id_]])
            rays_o, rays_d = get_rays(directions, c2w)
            n = len(rays_o)
            rays = np.concatenate([
                rays_o, rays_d,
                np.full((n, 1), self.nears[id_], np.float32),
                np.full((n, 1), self.fars[id_], np.float32)], 1)
            return {"rays": rays, "ts": np.full((n,), id_, np.int32),
                    "rgbs": rgbs, "c2w": c2w,
                    "img_wh": np.array([img_w, img_h], np.int64)}

        # 'test': parametric path injected by eval.py
        c2w = np.asarray(self.poses_test[idx], np.float32)
        directions = get_ray_directions(
            self.test_img_h, self.test_img_w, self.test_K)
        rays_o, rays_d = get_rays(directions, c2w)
        n = len(rays_o)
        near, far = 0.0, 5.0
        rays = np.concatenate([
            rays_o, rays_d,
            np.full((n, 1), near, np.float32),
            np.full((n, 1), far, np.float32)], 1)
        return {"rays": rays,
                "ts": np.full((n,), self.test_appearance_idx, np.int32),
                "c2w": c2w,
                "img_wh": np.array([self.test_img_w, self.test_img_h],
                                   np.int64)}
