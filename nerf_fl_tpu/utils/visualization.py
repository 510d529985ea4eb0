"""Depth-map visualization (reference utils/visualization.py:6-18)."""
from __future__ import annotations

import numpy as np


def visualize_depth(depth: np.ndarray) -> np.ndarray:
    """(H, W) depth -> (3, H, W) float32 JET colormap in [0, 1]."""
    import cv2
    x = np.nan_to_num(np.asarray(depth, np.float32))
    mi, ma = np.min(x), np.max(x)
    x = (x - mi) / (ma - mi + 1e-8)
    x = (255 * x).astype(np.uint8)
    colored = cv2.applyColorMap(x, cv2.COLORMAP_JET)  # BGR uint8
    colored = cv2.cvtColor(colored, cv2.COLOR_BGR2RGB)
    return colored.astype(np.float32).transpose(2, 0, 1) / 255.0
