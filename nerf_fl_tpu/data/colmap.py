"""COLMAP sparse-reconstruction readers (binary + text).

Behavior-compatible with the reference's vendored parser
(datasets/colmap_utils.py:108-296) but written for host throughput: each file
is read once into memory and decoded with struct.unpack_from / np.frombuffer
instead of thousands of tiny file reads — phototourism scenes carry ~1e5-1e6
3D points and the parse sits on the startup path.
"""
from __future__ import annotations

import collections
import os
import struct
from typing import Dict

import numpy as np

CameraModel = collections.namedtuple(
    "CameraModel", ["model_id", "model_name", "num_params"])
Camera = collections.namedtuple(
    "Camera", ["id", "model", "width", "height", "params"])
BaseImage = collections.namedtuple(
    "Image", ["id", "qvec", "tvec", "camera_id", "name", "xys", "point3D_ids"])
Point3D = collections.namedtuple(
    "Point3D", ["id", "xyz", "rgb", "error", "image_ids", "point2D_idxs"])

CAMERA_MODELS = [
    CameraModel(0, "SIMPLE_PINHOLE", 3),
    CameraModel(1, "PINHOLE", 4),
    CameraModel(2, "SIMPLE_RADIAL", 4),
    CameraModel(3, "RADIAL", 5),
    CameraModel(4, "OPENCV", 8),
    CameraModel(5, "OPENCV_FISHEYE", 8),
    CameraModel(6, "FULL_OPENCV", 12),
    CameraModel(7, "FOV", 5),
    CameraModel(8, "SIMPLE_RADIAL_FISHEYE", 4),
    CameraModel(9, "RADIAL_FISHEYE", 5),
    CameraModel(10, "THIN_PRISM_FISHEYE", 12),
]
CAMERA_MODEL_IDS = {m.model_id: m for m in CAMERA_MODELS}
CAMERA_MODEL_NAMES = {m.model_name: m for m in CAMERA_MODELS}


class Image(BaseImage):
    def qvec2rotmat(self):
        return qvec2rotmat(self.qvec)


def qvec2rotmat(q) -> np.ndarray:
    """(w, x, y, z) quaternion -> 3x3 rotation (colmap_utils.py:272-282)."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * y**2 - 2 * z**2, 2 * x * y - 2 * w * z, 2 * z * x + 2 * w * y],
        [2 * x * y + 2 * w * z, 1 - 2 * x**2 - 2 * z**2, 2 * y * z - 2 * w * x],
        [2 * z * x - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x**2 - 2 * y**2]])


def rotmat2qvec(R) -> np.ndarray:
    """3x3 rotation -> (w, x, y, z) quaternion via the eigen decomposition of
    the symmetric K matrix (colmap_utils.py:285-295)."""
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = np.asarray(R).flat
    K = np.array([
        [Rxx - Ryy - Rzz, 0, 0, 0],
        [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
        [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
        [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz]]) / 3.0
    eigvals, eigvecs = np.linalg.eigh(K)
    qvec = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    if qvec[0] < 0:
        qvec *= -1
    return qvec


def read_cameras_binary(path: str) -> Dict[int, Camera]:
    buf = open(path, "rb").read()
    (n,) = struct.unpack_from("<Q", buf, 0)
    off = 8
    cameras = {}
    for _ in range(n):
        cid, model_id, w, h = struct.unpack_from("<iiQQ", buf, off)
        off += 24
        np_ = CAMERA_MODEL_IDS[model_id].num_params
        params = np.frombuffer(buf, "<f8", np_, off).copy()
        off += 8 * np_
        cameras[cid] = Camera(cid, CAMERA_MODEL_IDS[model_id].model_name,
                              w, h, params)
    return cameras


def read_images_binary(path: str) -> Dict[int, Image]:
    buf = open(path, "rb").read()
    (n,) = struct.unpack_from("<Q", buf, 0)
    off = 8
    images = {}
    for _ in range(n):
        vals = struct.unpack_from("<idddddddi", buf, off)
        off += 64
        iid, qvec, tvec, cam_id = vals[0], np.array(vals[1:5]), \
            np.array(vals[5:8]), vals[8]
        end = buf.index(b"\x00", off)
        name = buf[off:end].decode("utf-8")
        off = end + 1
        (n2d,) = struct.unpack_from("<Q", buf, off)
        off += 8
        rec = np.frombuffer(buf, np.dtype("<f8,<f8,<i8"), n2d, off)
        off += 24 * n2d
        xys = np.column_stack([rec["f0"], rec["f1"]])
        p3d = rec["f2"].astype(np.int64)
        images[iid] = Image(iid, qvec, tvec, cam_id, name, xys, p3d)
    return images


def read_points3d_binary(path: str) -> Dict[int, Point3D]:
    buf = open(path, "rb").read()
    (n,) = struct.unpack_from("<Q", buf, 0)
    off = 8
    points = {}
    head = struct.Struct("<QdddBBBd")
    for _ in range(n):
        pid, x, y, z, r, g, b, err = head.unpack_from(buf, off)
        off += 43
        (tl,) = struct.unpack_from("<Q", buf, off)
        off += 8
        track = np.frombuffer(buf, "<i4", 2 * tl, off)
        off += 8 * tl
        points[pid] = Point3D(pid, np.array([x, y, z]), np.array([r, g, b]),
                              np.array(err), track[0::2].astype(np.int64),
                              track[1::2].astype(np.int64))
    return points


def read_points3d_xyz(path: str) -> np.ndarray:
    """Fast path used by the dataset: only the xyz coordinates, skipping
    track decoding entirely — (N, 3) float64."""
    buf = open(path, "rb").read()
    (n,) = struct.unpack_from("<Q", buf, 0)
    off = 8
    xyz = np.empty((n, 3), np.float64)
    head = struct.Struct("<Qddd")
    for i in range(n):
        _, x, y, z = head.unpack_from(buf, off)
        xyz[i] = (x, y, z)
        (tl,) = struct.unpack_from("<Q", buf, off + 43)
        off += 51 + 8 * tl
    return xyz


# ---------------------------------------------------------------- text
def read_cameras_text(path: str) -> Dict[int, Camera]:
    cameras = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line[0] == "#":
                continue
            e = line.split()
            cameras[int(e[0])] = Camera(
                int(e[0]), e[1], int(e[2]), int(e[3]),
                np.array([float(v) for v in e[4:]]))
    return cameras


def read_images_text(path: str) -> Dict[int, Image]:
    images = {}
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip() and ln[0] != "#"]
    for i in range(0, len(lines), 2):
        e = lines[i].split()
        iid = int(e[0])
        pts = lines[i + 1].split() if i + 1 < len(lines) else []
        xys = np.array([[float(pts[j]), float(pts[j + 1])]
                        for j in range(0, len(pts), 3)])
        p3d = np.array([int(pts[j + 2]) for j in range(0, len(pts), 3)])
        images[iid] = Image(iid, np.array([float(v) for v in e[1:5]]),
                            np.array([float(v) for v in e[5:8]]),
                            int(e[8]), e[9], xys, p3d)
    return images


def read_points3D_text(path: str) -> Dict[int, Point3D]:
    points = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line[0] == "#":
                continue
            e = line.split()
            pid = int(e[0])
            points[pid] = Point3D(
                pid, np.array([float(v) for v in e[1:4]]),
                np.array([int(v) for v in e[4:7]]), float(e[7]),
                np.array([int(v) for v in e[8::2]]),
                np.array([int(v) for v in e[9::2]]))
    return points


def read_model(path: str, ext: str):
    if ext == ".txt":
        return (read_cameras_text(os.path.join(path, "cameras" + ext)),
                read_images_text(os.path.join(path, "images" + ext)),
                read_points3D_text(os.path.join(path, "points3D" + ext)))
    return (read_cameras_binary(os.path.join(path, "cameras" + ext)),
            read_images_binary(os.path.join(path, "images" + ext)),
            read_points3d_binary(os.path.join(path, "points3D" + ext)))
