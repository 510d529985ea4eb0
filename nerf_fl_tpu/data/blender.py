"""Blender-synthetic dataset (NeRF-W perturbed variant) — host NumPy pipeline.

Behavior follows reference datasets/blender.py:32-158: transforms_{split}.json
parsing, focal derived from camera_angle_x at the 800px native width, fixed
near/far = 2/6, white background, seeded color/occ perturbations applied to
every training frame except index 0, LANCZOS resize, alpha-blend to white,
and the pre-baked flat ray buffer for the train split.

Differences (documented fixes of fork regressions, SURVEY.md section 2.5):
  * ``ts`` ids live in their own int32 array instead of a float column.
  * ``ray_format`` is explicit: 'world' bakes world-space rays (upstream
    behavior, correct when pose refinement is off); with refine_pose=True the
    dataset emits camera-frame directions plus per-image poses so the train
    step can compose learned poses — the layout the fork's training loop
    assumed but its Blender loader never produced (train.py:96 vs
    blender.py:95-99).
"""
from __future__ import annotations

import json
import os
from typing import Dict, Sequence

import numpy as np
from PIL import Image

from .perturbations import add_perturbation
from .rays_np import blend_alpha_to_white, get_ray_directions, get_rays


def _load_image(path: str) -> Image.Image:
    img = Image.open(path)
    if img.mode != "RGBA":
        img = img.convert("RGBA")
    return img


def _to_rgba_floats(img: Image.Image) -> np.ndarray:
    return np.asarray(img, np.float32).reshape(-1, 4) / 255.0


class BlenderDataset:
    """Map-style dataset; train split exposes flat ray buffers for the
    random-gather batch sampler."""

    def __init__(self, root_dir: str, split: str = "train",
                 img_wh=(800, 800), perturbation: Sequence[str] = (),
                 refine_pose: bool = False):
        assert img_wh[0] == img_wh[1], "image width must equal image height!"
        assert set(perturbation).issubset({"color", "occ"}), \
            'Only "color" and "occ" perturbations are supported!'
        self.root_dir = root_dir
        self.split = split
        self.img_wh = tuple(img_wh)
        self.perturbation = list(perturbation)
        self.refine_pose = refine_pose
        self.ray_format = "camdir" if (refine_pose and split == "train") else "world"
        self.white_back = True
        self.read_meta()

    # ------------------------------------------------------------------
    def read_meta(self):
        name = f"transforms_{self.split.split('_')[-1]}.json"
        with open(os.path.join(self.root_dir, name)) as f:
            self.meta = json.load(f)

        w, h = self.img_wh
        # native focal at W=800, rescaled to img_wh (blender.py:55-58)
        self.focal = 0.5 * 800 / np.tan(0.5 * self.meta["camera_angle_x"])
        self.focal *= w / 800
        self.K = np.eye(3, dtype=np.float32)
        self.K[0, 0] = self.K[1, 1] = self.focal
        self.K[0, 2] = w / 2
        self.K[1, 2] = h / 2

        self.near, self.far = 2.0, 6.0
        self.bounds = np.array([self.near, self.far], np.float32)
        self.directions = get_ray_directions(h, w, self.K)  # (h, w, 3)

        # per-frame poses, exposed for the pose-refinement path
        self.poses = np.stack(
            [np.asarray(f["transform_matrix"], np.float32)[:3, :4]
             for f in self.meta["frames"]], 0)
        self.poses_dict: Dict[int, np.ndarray] = {
            t: self.poses[t] for t in range(len(self.poses))}
        self.Ks = {t: self.K for t in range(len(self.poses))}
        self.n_images = len(self.meta["frames"])

        if self.split == "train":
            self._bake_train_rays()

    def _bake_train_rays(self):
        w, h = self.img_wh
        n_px = h * w
        rays_list, rgbs_list = [], []
        flat_dirs = self.directions.reshape(-1, 3)
        for t, frame in enumerate(self.meta["frames"]):
            img = _load_image(
                os.path.join(self.root_dir, f"{frame['file_path']}.png"))
            if t != 0:  # first image never perturbed (blender.py:82-84)
                img = add_perturbation(img, self.perturbation, t)
            img = img.resize(self.img_wh, Image.LANCZOS)
            rgbs_list.append(blend_alpha_to_white(_to_rgba_floats(img)))

            if self.ray_format == "world":
                rays_o, rays_d = get_rays(flat_dirs, self.poses[t])
                rays = np.concatenate([
                    rays_o, rays_d,
                    np.full((n_px, 1), self.near, np.float32),
                    np.full((n_px, 1), self.far, np.float32)], 1)
            else:  # camdir: [cam-frame dir, near, far]; pose applied on device
                rays = np.concatenate([
                    flat_dirs,
                    np.full((n_px, 1), self.near, np.float32),
                    np.full((n_px, 1), self.far, np.float32)], 1)
            rays_list.append(rays)

        self.all_rays = np.concatenate(rays_list, 0).astype(np.float32)
        self.all_rgbs = np.concatenate(rgbs_list, 0).astype(np.float32)
        self.all_ts = np.repeat(
            np.arange(self.n_images, dtype=np.int32), n_px)

    # ------------------------------------------------------------------
    def apply_refined_poses(self, poses_3x4: np.ndarray) -> None:
        """Replace per-frame poses with learned/refined ones (used by eval
        --refine_pose; the reference could not do this, SURVEY.md 2.5.3)."""
        self.poses = np.asarray(poses_3x4, np.float32)[:, :3, :4]
        self.poses_dict = {t: self.poses[t] for t in range(len(self.poses))}
        self._refined = True

    def __len__(self):
        if self.split == "train":
            return len(self.all_rays)
        if self.split == "val":
            # reference blender.py:110-111 hardcodes 8; clamp to what exists
            return min(8, len(self.meta["frames"]))
        return len(self.meta["frames"])

    def __getitem__(self, idx: int):
        if self.split == "train":
            return {"rays": self.all_rays[idx], "ts": self.all_ts[idx],
                    "rgbs": self.all_rgbs[idx]}

        frame = self.meta["frames"][idx]
        if getattr(self, "_refined", False) and idx < len(self.poses):
            c2w = self.poses[idx]
        else:
            c2w = np.asarray(frame["transform_matrix"], np.float32)[:3, :4]
        t = 0  # no perturbation at val/test (blender.py:123)

        img = _load_image(
            os.path.join(self.root_dir, f"{frame['file_path']}.png"))
        if self.split == "test_train" and idx != 0:
            t = idx
            img = add_perturbation(img, self.perturbation, idx)
        img = img.resize(self.img_wh, Image.LANCZOS)
        rgba = _to_rgba_floats(img)
        valid_mask = rgba[:, 3] > 0

        rays_o, rays_d = get_rays(self.directions, c2w)
        n_px = len(rays_o)
        rays = np.concatenate([
            rays_o, rays_d,
            np.full((n_px, 1), self.near, np.float32),
            np.full((n_px, 1), self.far, np.float32)], 1)

        sample = {"rays": rays,
                  "ts": np.full((n_px,), t, np.int32),
                  "rgbs": blend_alpha_to_white(rgba),
                  "c2w": c2w,
                  "valid_mask": valid_mask}

        if self.split == "test_train" and self.perturbation:
            img = _load_image(
                os.path.join(self.root_dir, f"{frame['file_path']}.png"))
            img = img.resize(self.img_wh, Image.LANCZOS)
            rgba = _to_rgba_floats(img)
            sample["original_rgbs"] = blend_alpha_to_white(rgba)
            sample["original_valid_mask"] = rgba[:, 3] > 0
        return sample
