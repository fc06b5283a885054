"""Image pyramid + Gaussian blur.

Replaces the reference's ComputePyramid (reference: src/ORBextractor.cc
ComputePyramid, 8 levels, scale 1.2) with jax.image.resize; all per-level
shapes are static, so the full pyramid traces into one XLA program.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(h: int, w: int, n_levels: int, scale: float) -> List[Tuple[int, int]]:
    return [
        (int(round(h / scale**l)), int(round(w / scale**l))) for l in range(n_levels)
    ]


def build_pyramid(
    image: jax.Array, n_levels: int = 8, scale: float = 1.2
) -> List[jax.Array]:
    """image: (H,W) f32. Returns list of (Hl,Wl) f32, level 0 first."""
    h, w = image.shape
    shapes = level_shapes(h, w, n_levels, scale)
    out = [image]
    for l in range(1, n_levels):
        # resize from the previous level (like the reference) to keep the
        # anti-aliasing chain cheap
        out.append(
            jax.image.resize(out[-1], shapes[l], method="linear", antialias=False)
        )
    return out


def _gaussian_kernel1d(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(image: jax.Array, size: int = 7, sigma: float = 2.0) -> jax.Array:
    """Separable Gaussian blur with edge replication (matches the blur the
    reference applies before descriptor sampling, src/ORBextractor.cc
    GaussianBlur(..., Size(7,7), 2, 2, BORDER_REFLECT_101))."""
    k = jnp.asarray(_gaussian_kernel1d(size, sigma))
    pad = size // 2
    img = jnp.pad(image, ((pad, pad), (0, 0)), mode="reflect")
    img = jax.lax.conv_general_dilated(
        img[None, None, :, :],
        k[None, None, :, None],
        window_strides=(1, 1),
        padding="VALID",
    )[0, 0]
    img = jnp.pad(img, ((0, 0), (pad, pad)), mode="reflect")
    img = jax.lax.conv_general_dilated(
        img[None, None, :, :],
        k[None, None, None, :],
        window_strides=(1, 1),
        padding="VALID",
    )[0, 0]
    return img
