"""Reproducible NeRF-W training perturbations for the Blender dataset.

This is framework-independent host code where BYTE-EXACT parity with the
reference is both achievable and required (the seeded perturbations define
the benchmark task itself): identical np.random.seed calls, identical
uniform/randint/choice draws, identical PIL rasterization
(reference blender.py:11-29; README.md:34).
"""
from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw


def add_perturbation(img: Image.Image, perturbation, seed: int) -> Image.Image:
    """Apply seeded color jitter and/or a 10-stripe occluder.

    color: scale s~U(0.8, 1.2), bias b~U(-0.2, 0.2) per channel under
    np.random.seed(seed); occ: 200x200 block of 10 20px stripes at
    (U{200..399}, U{200..399}), stripe i colored under seed 10*seed+i.
    """
    if "color" in perturbation:
        np.random.seed(seed)
        img_np = np.array(img) / 255.0
        s = np.random.uniform(0.8, 1.2, size=3)
        b = np.random.uniform(-0.2, 0.2, size=3)
        img_np[..., :3] = np.clip(s * img_np[..., :3] + b, 0, 1)
        img = Image.fromarray((255 * img_np).astype(np.uint8))
    if "occ" in perturbation:
        draw = ImageDraw.Draw(img)
        np.random.seed(seed)
        left = np.random.randint(200, 400)
        top = np.random.randint(200, 400)
        for i in range(10):
            np.random.seed(10 * seed + i)
            random_color = tuple(np.random.choice(range(256), 3))
            draw.rectangle(((left + 20 * i, top), (left + 20 * (i + 1), top + 200)),
                           fill=random_color)
    return img
