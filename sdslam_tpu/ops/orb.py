"""ORB orientation + binary descriptors, batched over keypoints.

Replaces ORBextractor's IC_Angle and computeOrbDescriptor
(/root/reference/src/ORBextractor.cc:78-143).  Design differences from the
reference (intentional, TPU-first):

  * The BRIEF point-pair pattern is NOT the OpenCV learned `bit_pattern_31_`
    table (we do not copy reference data).  We generate a deterministic
    pseudo-random Gaussian pattern (original BRIEF recipe: sigma = patch/5,
    norm-clipped) with a fixed seed.  The framework is self-consistent:
    descriptors are only ever matched against descriptors produced here.
  * Descriptor sampling uses true rotation of the pattern with
    nearest-pixel gather on the blurred level image — one big batched gather
    instead of per-keypoint pointer walks.
  * Descriptors are packed as [N, 8] uint32 so Hamming distance is 8
    XOR+popcounts (jax.lax.population_count / Pallas kernel).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

HALF_PATCH = 15  # orientation patch radius (31x31), as in the reference
PATTERN_BITS = 256
PATTERN_RADIUS = 13  # pattern points norm-clipped to this radius
DESC_WORDS = 8  # 256 bits / 32


@functools.lru_cache()
def _circular_mask() -> np.ndarray:
    d = np.arange(-HALF_PATCH, HALF_PATCH + 1)
    yy, xx = np.meshgrid(d, d, indexing="ij")
    return (yy * yy + xx * xx <= HALF_PATCH * HALF_PATCH).astype(np.float32)


@functools.lru_cache()
def brief_pattern(seed: int = 1234) -> np.ndarray:
    """[256, 2, 2] int32 point pairs (x, y), Gaussian sigma=patch/5, radius<=13."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, (2 * PATTERN_RADIUS + 1) / 5.0, size=(PATTERN_BITS, 2, 2))
    norm = np.linalg.norm(pts, axis=-1, keepdims=True)
    scale = np.minimum(1.0, PATTERN_RADIUS / np.maximum(norm, 1e-6))
    pts = np.round(pts * scale).astype(np.int32)
    # avoid degenerate identical pairs
    same = (pts[:, 0] == pts[:, 1]).all(axis=-1)
    pts[same, 1, 0] += 1
    return pts


def _gather2d(img, yy, xx):
    """Clamped nearest gather img[yy, xx] for integer index arrays."""
    H, W = img.shape
    yy = jnp.clip(yy, 0, H - 1)
    xx = jnp.clip(xx, 0, W - 1)
    return img[yy, xx]


def orientations(img, uv, valid):
    """Intensity-centroid angles (radians) for keypoints uv [N,2] on img [H,W].

    Equivalent of IC_Angle (ORBextractor.cc:78-102) with a circular mask.
    """
    d = jnp.arange(-HALF_PATCH, HALF_PATCH + 1)
    dy = d[:, None]
    dx = d[None, :]
    mask = jnp.asarray(_circular_mask())
    x0 = jnp.round(uv[:, 0]).astype(jnp.int32)
    y0 = jnp.round(uv[:, 1]).astype(jnp.int32)
    patch = _gather2d(img, y0[:, None, None] + dy[None], x0[:, None, None] + dx[None])
    patch = patch * mask[None]
    m10 = jnp.sum(patch * dx[None].astype(img.dtype), axis=(1, 2))
    m01 = jnp.sum(patch * dy[None].astype(img.dtype), axis=(1, 2))
    ang = jnp.arctan2(m01, m10)
    return jnp.where(valid, ang, 0.0)


def descriptors(img_blurred, uv, angle, valid):
    """Rotated-BRIEF 256-bit descriptors -> [N, 8] uint32.

    img_blurred: level image after Gaussian blur (sigma 2, 7x7).
    uv: keypoint coords at this level. angle: radians.
    """
    pat = jnp.asarray(brief_pattern())  # [256,2,2] (x,y)
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # [N]
    px = pat[None, :, :, 0].astype(jnp.float32)  # [1,256,2]
    py = pat[None, :, :, 1].astype(jnp.float32)
    rx = ca[:, None, None] * px - sa[:, None, None] * py
    ry = sa[:, None, None] * px + ca[:, None, None] * py
    xs = jnp.round(uv[:, 0, None, None] + rx).astype(jnp.int32)  # [N,256,2]
    ys = jnp.round(uv[:, 1, None, None] + ry).astype(jnp.int32)
    vals = _gather2d(img_blurred, ys, xs)  # [N,256,2]
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # [N,256]
    words = bits.reshape(bits.shape[0], DESC_WORDS, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    desc = jnp.sum(words * weights, axis=-1, dtype=jnp.uint32)
    return jnp.where(valid[:, None], desc, jnp.uint32(0))
