"""ctypes loader for the native COLMAP decoders (csrc/colmap_fast.c).

``read_points3d_arrays`` returns columnar arrays (the layout the dataset
actually consumes) instead of a dict of per-point namedtuples — decoding a
million-point reconstruction drops from seconds (struct.unpack loop) to tens
of milliseconds.  Falls back to the pure-Python parser when the shared
library hasn't been built (tools/build_native.py).
"""
from __future__ import annotations

import ctypes
import os
from typing import NamedTuple, Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "_native", "libcolmap_fast.so")
_lib = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.colmap_points3d_count.restype = ctypes.c_longlong
        lib.colmap_points3d_count.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong]
        lib.colmap_points3d_decode.restype = ctypes.c_int
        lib.colmap_points3d_tracks.restype = ctypes.c_int
        _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


class Points3DArrays(NamedTuple):
    ids: np.ndarray        # (n,) int64
    xyz: np.ndarray        # (n, 3) float64
    rgb: np.ndarray        # (n, 3) uint8
    error: np.ndarray      # (n,) float64
    track_len: np.ndarray  # (n,) int64
    tracks: Optional[np.ndarray]  # (sum(track_len), 2) int32 or None


def read_points3d_arrays(path: str, *, with_tracks: bool = False
                         ) -> Points3DArrays:
    """Columnar points3D.bin decode; native when available."""
    buf = open(path, "rb").read()
    lib = _load()
    if lib is None:
        return _python_fallback(buf, with_tracks)

    n = lib.colmap_points3d_count(buf, len(buf))
    if n < 0:
        raise ValueError(f"corrupt points3D file: {path}")
    ids = np.empty(n, np.int64)
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    error = np.empty(n, np.float64)
    track_len = np.empty(n, np.int64)
    rc = lib.colmap_points3d_decode(
        buf, len(buf), n,
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        error.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        track_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        raise ValueError(f"corrupt points3D file: {path}")
    tracks = None
    if with_tracks:
        total = int(track_len.sum())
        tracks = np.empty(2 * total, np.int32)
        rc = lib.colmap_points3d_tracks(
            buf, len(buf), n,
            tracks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if rc != 0:
            raise ValueError(f"corrupt points3D file: {path}")
        tracks = tracks.reshape(-1, 2)
    return Points3DArrays(ids, xyz, rgb, error, track_len, tracks)


def _python_fallback(buf: bytes, with_tracks: bool) -> Points3DArrays:
    import struct
    (n,) = struct.unpack_from("<Q", buf, 0)
    off = 8
    ids = np.empty(n, np.int64)
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    error = np.empty(n, np.float64)
    track_len = np.empty(n, np.int64)
    track_chunks = []
    head = struct.Struct("<QdddBBBd")
    for i in range(n):
        pid, x, y, z, r, g, b, err = head.unpack_from(buf, off)
        ids[i] = pid
        xyz[i] = (x, y, z)
        rgb[i] = (r, g, b)
        error[i] = err
        (tl,) = struct.unpack_from("<Q", buf, off + 43)
        track_len[i] = tl
        off += 51
        if with_tracks:
            track_chunks.append(np.frombuffer(buf, "<i4", 2 * tl, off))
        off += 8 * tl
    tracks = (np.concatenate(track_chunks).reshape(-1, 2)
              if with_tracks and track_chunks else
              (np.empty((0, 2), np.int32) if with_tracks else None))
    return Points3DArrays(ids, xyz, rgb, error, track_len, tracks)
