"""Pallas TPU kernel: fused patch-warp photometric residual accumulation.

The inner loop of the sparse image aligner (solvers/image_align.py): for N
reference points with cached 4x4 patches and 6-DoF Jacobians, project into
the current level image, bilinear-sample residuals, and accumulate the
Gauss-Newton right-hand side. The BASELINE north star names this kernel
explicitly ("patch-warp photometric residuals"). Replaces the per-pixel
loops of ImageAlign::ComputeResiduals (/root/reference/src/ImageAlign.cc:
281-353) with one fused device kernel per GN iteration.

Mosaic-legal gather decomposition (the round-1 blocker was scattered
bilinear taps — Mosaic only lowers same-shape 2D gathers): the 4x4 patch
offsets are INTEGERS, so every tap of a point's patch shares one fractional
weight (wx, wy) = frac(u), frac(v), and all 25 pixels the patch's bilinear
support touches lie at rows floor(v)-2+r, cols floor(u)-2+c (r, c in 0..4).
That turns the scattered gather into structure:

    rows_r = onehot(floor(v)+r-2) [N,H] @ img [H,W]        (5 MXU matmuls)
    V[r,c] = sum_w rows_r * (w == floor(u)+c-2)            (masked reduce)
    patch  = bilinear(V, wx, wy)                           (elementwise)

— iota compares, matmuls, and lane reductions only; no gather anywhere.
This is also ~3x less matmul work than the XLA two-hot path (ops/sample.py)
which spends a [16N, H] @ [H, W] per iteration: the shared fraction shrinks
it to 5 x [N, H] @ [H, W], and the whole residual/accumulation pipeline
fuses into a single kernel with no HBM intermediates.

The coarse pyramid levels the aligner runs on fit in VMEM whole (level 2 of
640x480 is 160x120x4 B = 75 KB), so the image is a single VMEM block and
the kernel runs as one grid step over all points.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH = 16  # 4x4
PATCH_HALF = 2
_HI = jax.lax.Precision.HIGHEST


def _kernel(img_ref, Xc_ref, patch_ref, J_ref, okpx_ref, out_ref, *, fx, fy, cx, cy):
    # grid step 0 zeroes the accumulator; later steps add their tile's
    # contribution (TPU grids run sequentially, so += is race-free)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:, :] = jnp.zeros((1, 8), jnp.float32)

    H, W = img_ref.shape
    img = img_ref[:]
    x = Xc_ref[:, 0]
    y = Xc_ref[:, 1]
    z = Xc_ref[:, 2]
    zok = z > 0.01
    zi = 1.0 / jnp.maximum(z, 1e-6)
    u = fx * x * zi + cx
    v = fy * y * zi + cy

    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    wx = u - x0
    wy = v - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    N = x0i.shape[0]

    # 5 window rows per point via one-hot MXU matmuls
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (N, H), 1)
    rows = []
    for r in range(5):
        yr = jnp.clip(y0i + (r - 2), 0, H - 1)
        oh = (iota_h == yr[:, None]).astype(jnp.float32)
        rows.append(
            jax.lax.dot_general(
                oh, img, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )  # [N, W]

    # 5 window columns per row via masked lane reductions
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (N, W), 1)
    V = [[None] * 5 for _ in range(5)]
    for c in range(5):
        xc = jnp.clip(x0i + (c - 2), 0, W - 1)
        msk = (iota_w == xc[:, None]).astype(jnp.float32)
        for r in range(5):
            V[r][c] = jnp.sum(rows[r] * msk, axis=1)  # [N]

    # bilinear combine per patch pixel (pr, pc); per-pixel bounds from the
    # INTEGER offset identity floor(u + d) = floor(u) + d
    wx1 = 1.0 - wx
    wy1 = 1.0 - wy
    cur_cols = []
    m_cols = []
    zok_f = zok.astype(jnp.float32)
    for pr in range(4):
        yok = ((y0i + (pr - 2) >= 0) & (y0i + (pr - 2) < H - 1)).astype(
            jnp.float32
        )
        for pc in range(4):
            top = V[pr][pc] * wx1 + V[pr][pc + 1] * wx
            bot = V[pr + 1][pc] * wx1 + V[pr + 1][pc + 1] * wx
            cur_cols.append(top * wy1 + bot * wy)
            xok = ((x0i + (pc - 2) >= 0) & (x0i + (pc - 2) < W - 1)).astype(
                jnp.float32
            )
            # masks kept as f32 throughout: stacking i1 vectors makes
            # Mosaic emit an i1->i32 vreg bitcast it cannot lower
            m_cols.append(xok * yok * zok_f)
    cur = jnp.stack(cur_cols, axis=1)  # [N, 16] in pr*4+pc order
    m = jnp.stack(m_cols, axis=1) * okpx_ref[:]  # f32 0/1

    r_ = m * (cur - patch_ref[:]) / 255.0  # [N, 16], 0 where masked
    # b_f = sum_{n,k} J[f,n,k] * r[n,k]: six multiply-reduce passes over
    # [N,16]. Mosaic lowering constraints shape this code: no rank-changing
    # reshapes ("unsupported shape cast" — J arrives pre-transposed as
    # [6,N,16]), no scalar stores, and no jnp.stack of scalars ("invalid
    # vector register cast") — so the 8 outputs are accumulated into one
    # (1,8) row by broadcasting each scalar against a lane-index one-hot.
    # r_ is already zero at masked pixels, masking J again is redundant.
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    acc = jnp.zeros((1, 8), jnp.float32)
    for f in range(6):
        bf = jnp.sum(J_ref[f] * r_)
        acc = acc + jnp.where(iota8 == f, bf, 0.0)
    acc = acc + jnp.where(iota8 == 6, jnp.sum(r_ * r_), 0.0)
    acc = acc + jnp.where(iota8 == 7, jnp.sum(m), 0.0)
    out_ref[:, :] = out_ref[:, :] + acc


@functools.partial(
    jax.jit, static_argnames=("fx", "fy", "cx", "cy", "interpret")
)
def accumulate_gn(
    img,  # [H,W] level image, f32
    Xc,  # [N,3] points in the current camera frame (already transformed)
    ref_patch,  # [N,16] cached reference patches
    J,  # [N,16,6] cached reference Jacobians (constant under IC-LK)
    okpx,  # [N,16] per-pixel reference validity
    fx: float, fy: float, cx: float, cy: float,
    interpret: bool = False,
):
    """Returns (b [6], chi2_sum, n_valid_px) — the GN right-hand side at the
    current iterate (H is constant under inverse-compositional LK and is
    precomputed by the caller)."""
    N = Xc.shape[0]
    # point tiles over a sequential grid: the per-tile one-hot rows
    # ([TN, H] x 5) are the VMEM peak — one untiled N=1024 step at a
    # 160x120 level overflows scoped VMEM by ~4 MB
    TN = min(256, N)
    pad = (-N) % TN
    if pad:
        Xc = jnp.concatenate([Xc, jnp.ones((pad, 3), Xc.dtype)])
        ref_patch = jnp.concatenate(
            [ref_patch, jnp.zeros((pad, PATCH), ref_patch.dtype)])
        J = jnp.concatenate([J, jnp.zeros((pad, PATCH, 6), J.dtype)])
        okpx = jnp.concatenate([okpx, jnp.zeros((pad, PATCH), bool)])
    M = Xc.shape[0]
    H, W = img.shape
    kern = functools.partial(_kernel, fx=fx, fy=fy, cx=cx, cy=cy)
    out = pl.pallas_call(
        kern,
        grid=(M // TN,),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        in_specs=[
            pl.BlockSpec((H, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, PATCH), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, TN, PATCH), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, PATCH), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        jnp.asarray(img, jnp.float32),
        jnp.asarray(Xc, jnp.float32),
        jnp.asarray(ref_patch, jnp.float32),
        # [6, N, 16]: rank-changing reshapes are not lowerable INSIDE the
        # kernel, so the Jacobian is laid out kernel-ready on the XLA side
        jnp.transpose(jnp.asarray(J, jnp.float32), (2, 0, 1)),
        okpx.astype(jnp.float32),
    )
    return out[0, 0:6], out[0, 6], out[0, 7].astype(jnp.int32)
