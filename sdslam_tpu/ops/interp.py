"""Bilinear sampling + image gradients (batched, mask-returning)."""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(img, uv):
    """Sample img [H,W] at float coords uv [...,2] (x,y).

    Returns (values [...], valid [...]) where valid marks samples whose 2x2
    support is fully inside the image; out-of-bounds values are 0.
    """
    H, W = img.shape
    x = uv[..., 0]
    y = uv[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    valid = (x0i >= 0) & (x0i < W - 1) & (y0i >= 0) & (y0i < H - 1)
    x0c = jnp.clip(x0i, 0, W - 2)
    y0c = jnp.clip(y0i, 0, H - 2)
    v00 = img[y0c, x0c]
    v01 = img[y0c, x0c + 1]
    v10 = img[y0c + 1, x0c]
    v11 = img[y0c + 1, x0c + 1]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    return jnp.where(valid, out, 0.0), valid


def bilinear_sample_with_grad(img, uv):
    """Sample value and central-difference gradient at uv.

    Returns (val, gx, gy, valid); gradient support needs a 1px margin more.
    """
    val, v0 = bilinear_sample(img, uv)
    ex = jnp.stack([jnp.ones_like(uv[..., 0]), jnp.zeros_like(uv[..., 0])], -1)
    ey = jnp.stack([jnp.zeros_like(uv[..., 0]), jnp.ones_like(uv[..., 0])], -1)
    vxp, v1 = bilinear_sample(img, uv + ex)
    vxm, v2 = bilinear_sample(img, uv - ex)
    vyp, v3 = bilinear_sample(img, uv + ey)
    vym, v4 = bilinear_sample(img, uv - ey)
    gx = 0.5 * (vxp - vxm)
    gy = 0.5 * (vyp - vym)
    valid = v0 & v1 & v2 & v3 & v4
    return val, gx, gy, valid
