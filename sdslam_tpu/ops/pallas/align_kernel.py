"""Pallas TPU kernel: patch-warp photometric residual accumulation.

The inner loop of the sparse image aligner (solvers/image_align.py): for N
reference points with cached 4x4 patches and 6-DoF Jacobians, project into
the current level image, bilinear-sample residuals, and accumulate the 6x6
Gauss-Newton system. The BASELINE north star names this kernel explicitly
("patch-warp photometric residuals").

Kernel design: the coarse pyramid levels the aligner runs on fit in VMEM
whole (level 2 of 640x480 is 160x120x4 B = 75 KB), so the image is a single
VMEM block and each grid step processes a tile of points with vectorized
16-pixel patch algebra; H and b are accumulated across grid steps in the
output refs (grid is sequential on TPU, so accumulation is race-free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PT_TILE = 128
PATCH = 16  # 4x4


def _kernel(img_ref, uvz_ref, patch_ref, J_ref, okpx_ref, H_ref, b_ref,
            chi_ref, *, fx, fy, cx, cy, patch_half):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        H_ref[:] = jnp.zeros_like(H_ref)
        b_ref[:] = jnp.zeros_like(b_ref)
        chi_ref[:] = jnp.zeros_like(chi_ref)

    Himg, Wimg = img_ref.shape
    x = uvz_ref[:, 0]
    y = uvz_ref[:, 1]
    z = uvz_ref[:, 2]
    zok = z > 0.01
    u = fx * x / jnp.maximum(z, 1e-6) + cx
    v = fy * y / jnp.maximum(z, 1e-6) + cy

    d = jax.lax.broadcasted_iota(jnp.float32, (1, PATCH), 1)
    dx = jnp.mod(d, 4.0) - patch_half
    dy = jnp.floor(d / 4.0) - patch_half
    px = u[:, None] + dx  # [T,16]
    py = v[:, None] + dy

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    inb = (x0i >= 0) & (x0i < Wimg - 1) & (y0i >= 0) & (y0i < Himg - 1)
    x0c = jnp.clip(x0i, 0, Wimg - 2)
    y0c = jnp.clip(y0i, 0, Himg - 2)

    img = img_ref[:]
    # Mosaic only lowers 2D gathers: flatten the image to [1, H*W] and keep
    # the index tensor 2D ([1, T*16]) via take_along_axis
    T = x0c.shape[0]
    flat2 = img.reshape(1, Himg * Wimg)
    idx = (y0c * Wimg + x0c).reshape(1, T * PATCH)

    def tap(off):
        g = jnp.take_along_axis(flat2, idx + off, axis=1)
        return g.reshape(T, PATCH)

    v00 = tap(0)
    v01 = tap(1)
    v10 = tap(Wimg)
    v11 = tap(Wimg + 1)
    cur = (v00 * (1 - wx) + v01 * wx) * (1 - wy) + (v10 * (1 - wx) + v11 * wx) * wy

    m = inb & (okpx_ref[:] > 0) & zok[:, None]
    r = jnp.where(m, (cur - patch_ref[:]) / 255.0, 0.0)  # [T,16]

    J = J_ref[:]  # [T, 16*6] flattened
    J = J.reshape(-1, PATCH, 6)
    Jm = jnp.where(m[:, :, None], J, 0.0)
    H_ref[:] += jnp.einsum(
        "tpi,tpj->ij", Jm, J, preferred_element_type=jnp.float32
    )
    b_ref[:] += jnp.einsum("tpi,tp->i", Jm, r, preferred_element_type=jnp.float32)[:, None]
    chi_ref[0, 0] += jnp.sum(r * r)
    chi_ref[0, 1] += jnp.sum(m.astype(jnp.float32))


@functools.partial(
    jax.jit, static_argnames=("fx", "fy", "cx", "cy", "patch_half", "interpret")
)
def accumulate_gn(
    img,  # [H,W] level image
    Xc,  # [N,3] points in the current camera frame (already transformed)
    ref_patch,  # [N,16]
    J,  # [N,16,6] cached reference Jacobians
    okpx,  # [N,16] per-pixel reference validity (point valid & in-border)
    fx: float, fy: float, cx: float, cy: float,
    patch_half: int = 2,
    interpret: bool = False,
):
    """Returns (H [6,6], b [6], chi2_sum, n_valid_px)."""
    N = Xc.shape[0]
    pad = (-N) % PT_TILE
    if pad:
        Xc = jnp.concatenate([Xc, jnp.ones((pad, 3), Xc.dtype)])
        ref_patch = jnp.concatenate([ref_patch, jnp.zeros((pad, PATCH), ref_patch.dtype)])
        J = jnp.concatenate([J, jnp.zeros((pad, PATCH, 6), J.dtype)])
        okpx = jnp.concatenate([okpx, jnp.zeros((pad, PATCH), bool)])
    M = Xc.shape[0]
    kern = functools.partial(
        _kernel, fx=fx, fy=fy, cx=cx, cy=cy, patch_half=float(patch_half)
    )
    H, b, chi = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((6, 6), jnp.float32),
            jax.ShapeDtypeStruct((6, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ),
        grid=(M // PT_TILE,),
        in_specs=[
            pl.BlockSpec(img.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PT_TILE, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PT_TILE, PATCH), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PT_TILE, PATCH * 6), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PT_TILE, PATCH), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((6, 6), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(img, Xc, ref_patch, J.reshape(M, PATCH * 6), okpx.astype(jnp.float32))
    return H, b[:, 0], chi[0, 0], chi[0, 1].astype(jnp.int32)
