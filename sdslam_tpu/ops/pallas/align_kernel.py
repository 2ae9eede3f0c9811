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


def _tile_terms(img, Xc_cols, patch_ref, J_ref, okpx_ref, sl, *, fx, fy, cx, cy):
    """Per-tile GN terms at the current iterate: returns 6 b-partials +
    chi2 partial + n partial as SCALARS (the Mosaic-legal shared-fraction
    one-hot decomposition of _kernel, over one static point slice `sl`)."""
    H, W = img.shape
    x, y, z = (c[sl] for c in Xc_cols)
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

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (N, W), 1)
    V = [[None] * 5 for _ in range(5)]
    for c in range(5):
        xc = jnp.clip(x0i + (c - 2), 0, W - 1)
        msk = (iota_w == xc[:, None]).astype(jnp.float32)
        for r in range(5):
            V[r][c] = jnp.sum(rows[r] * msk, axis=1)  # [N]

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
            m_cols.append(xok * yok * zok_f)
    cur = jnp.stack(cur_cols, axis=1)  # [N,16]
    m = jnp.stack(m_cols, axis=1) * okpx_ref[sl, :]

    r_ = m * (cur - patch_ref[sl, :]) / 255.0
    bs = [jnp.sum(J_ref[f, sl, :] * r_) for f in range(6)]
    return bs, jnp.sum(r_ * r_), jnp.sum(m)


def _exp_se3_scalars(d0, d1, d2, d3, d4, d5):
    """SE3 exp of xi = (rho=d0..d2, phi=d3..d5) in pure scalar math
    (Rodrigues; Mosaic-legal — no stacks, no reshapes). Returns
    (9 rotation entries row-major, 3 translation entries)."""
    th2 = d3 * d3 + d4 * d4 + d5 * d5
    th = jnp.sqrt(th2 + 1e-30)
    # series-safe coefficients (th can be ~0)
    small = th < 1e-5
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2)
    C = jnp.where(small, 1.0 / 6.0 - th2 / 120.0, (1.0 - A) / th2)
    # R = I + A hat(phi) + B hat(phi)^2
    p00, p11, p22 = -d4 * d4 - d5 * d5, -d3 * d3 - d5 * d5, -d3 * d3 - d4 * d4
    p01, p02, p12 = d3 * d4, d3 * d5, d4 * d5
    r00 = 1.0 + B * p00
    r11 = 1.0 + B * p11
    r22 = 1.0 + B * p22
    r01 = -A * d5 + B * p01
    r10 = A * d5 + B * p01
    r02 = A * d4 + B * p02
    r20 = -A * d4 + B * p02
    r12 = -A * d3 + B * p12
    r21 = A * d3 + B * p12
    # V = I + B hat + C hat^2 ; t = V rho
    v00 = 1.0 + C * p00
    v11 = 1.0 + C * p11
    v22 = 1.0 + C * p22
    v01 = -B * d5 + C * p01
    v10 = B * d5 + C * p01
    v02 = B * d4 + C * p02
    v20 = -B * d4 + C * p02
    v12 = -B * d3 + C * p12
    v21 = B * d3 + C * p12
    t0 = v00 * d0 + v01 * d1 + v02 * d2
    t1 = v10 * d0 + v11 * d1 + v12 * d2
    t2 = v20 * d0 + v21 * d1 + v22 * d2
    return (r00, r01, r02, r10, r11, r12, r20, r21, r22), (t0, t1, t2)


def _level_kernel(img_ref, X_ref, patch_ref, Jt_ref, okpx_ref, Hinv_ref,
                  T0_ref, out_ref, *, fx, fy, cx, cy, iters, tn):
    """Whole-level GN loop in ONE launch. Carries the SE3 iterate as 12
    scalars through a lax.while_loop (each per-iteration pallas launch
    costs ~20 us in good device regimes and ~0.5 ms in degraded ones —
    measured scripts/diag_ba_launch.py — so one launch per LEVEL instead
    of one per ITERATION removes up to 29/30 of the alignment's fixed
    cost; replaces ImageAlign::Optimize, ImageAlign.cc:234-279)."""
    img = img_ref[:]
    N = X_ref.shape[0]
    X0, X1, X2 = X_ref[:, 0], X_ref[:, 1], X_ref[:, 2]

    def gn_terms(Tsc):
        r00, r01, r02, r10, r11, r12, r20, r21, r22, t0, t1, t2 = Tsc
        xc = r00 * X0 + r01 * X1 + r02 * X2 + t0
        yc = r10 * X0 + r11 * X1 + r12 * X2 + t1
        zc = r20 * X0 + r21 * X1 + r22 * X2 + t2
        bs = [jnp.float32(0.0)] * 6
        chi = jnp.float32(0.0)
        n = jnp.float32(0.0)
        for t in range(N // tn):
            sl = slice(t * tn, (t + 1) * tn)
            bt, ct, nt = _tile_terms(
                img, (xc, yc, zc), patch_ref, Jt_ref, okpx_ref, sl,
                fx=fx, fy=fy, cx=cx, cy=cy,
            )
            bs = [a + b for a, b in zip(bs, bt)]
            chi = chi + ct
            n = n + nt
        n = jnp.maximum(n, 1.0)
        return bs, chi / n, n

    def solve_delta(bs):
        # delta = Hinv b: 6 row-slice reductions (no scalar stores)
        out = []
        for i in range(6):
            row = Hinv_ref[i, :]  # [8]
            acc = row[0] * bs[0]
            for j in range(1, 6):
                acc = acc + row[j] * bs[j]
            out.append(acc)
        return out

    Tinit = tuple(T0_ref[0, k] for k in range(12))

    def body(carry):
        T, bT, bchi, it, _ = carry
        bs, chi2, n = gn_terms(T)
        improved = chi2 < bchi
        bT = tuple(jnp.where(improved, a, b) for a, b in zip(T, bT))
        bchi = jnp.minimum(chi2, bchi)
        d = solve_delta(bs)
        E_R, E_t = _exp_se3_scalars(-d[0], -d[1], -d[2], -d[3], -d[4], -d[5])
        (r00, r01, r02, r10, r11, r12, r20, r21, r22, t0, t1, t2) = T
        (e00, e01, e02, e10, e11, e12, e20, e21, e22) = E_R
        (f0, f1, f2) = E_t
        Tn = (
            r00 * e00 + r01 * e10 + r02 * e20,
            r00 * e01 + r01 * e11 + r02 * e21,
            r00 * e02 + r01 * e12 + r02 * e22,
            r10 * e00 + r11 * e10 + r12 * e20,
            r10 * e01 + r11 * e11 + r12 * e21,
            r10 * e02 + r11 * e12 + r12 * e22,
            r20 * e00 + r21 * e10 + r22 * e20,
            r20 * e01 + r21 * e11 + r22 * e21,
            r20 * e02 + r21 * e12 + r22 * e22,
            r00 * f0 + r01 * f1 + r02 * f2 + t0,
            r10 * f0 + r11 * f1 + r12 * f2 + t1,
            r20 * f0 + r21 * f1 + r22 * f2 + t2,
        )
        dmax = jnp.abs(d[0])
        for j in range(1, 6):
            dmax = jnp.maximum(dmax, jnp.abs(d[j]))
        stop = (dmax < 1e-7) | ((it > 0) & (~improved))
        return Tn, bT, bchi, it + 1, stop

    def cond(carry):
        _, _, _, it, stop = carry
        return (it < iters) & (~stop)

    init = (Tinit, Tinit, jnp.float32(jnp.inf), jnp.int32(0),
            jnp.asarray(False))
    T, bT, bchi, _, _ = jax.lax.while_loop(cond, body, init)
    # the final iterate was never chi2-evaluated inside the loop
    _, chiT, nT = gn_terms(T)
    take = chiT <= bchi
    Tout = tuple(jnp.where(take, a, b) for a, b in zip(T, bT))
    chi_out = jnp.minimum(chiT, bchi)
    iota16 = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1)
    acc = jnp.zeros((1, 16), jnp.float32)
    for k in range(12):
        acc = acc + jnp.where(iota16 == k, Tout[k], 0.0)
    acc = acc + jnp.where(iota16 == 12, chi_out, 0.0)
    acc = acc + jnp.where(iota16 == 13, nT, 0.0)
    out_ref[:, :] = acc


@functools.partial(
    jax.jit,
    static_argnames=("fx", "fy", "cx", "cy", "iters", "interpret"),
)
def align_level(
    img,  # [H,W] current level image, f32
    X_ref,  # [N,3] reference-frame 3D points
    ref_patch,  # [N,16]
    J,  # [N,16,6]
    okpx,  # [N,16] bool
    Hinv,  # [6,6] inverse of the damped (constant, IC-LK) GN Hessian
    T_init,  # [4,4]
    fx: float, fy: float, cx: float, cy: float,
    iters: int = 30,
    interpret: bool = False,
):
    """One launch for a full GN level: returns (T [4,4], chi2, n_px)."""
    N = X_ref.shape[0]
    TN = min(256, N)
    pad = (-N) % TN
    if pad:
        X_ref = jnp.concatenate([X_ref, jnp.ones((pad, 3), X_ref.dtype)])
        ref_patch = jnp.concatenate(
            [ref_patch, jnp.zeros((pad, PATCH), ref_patch.dtype)])
        J = jnp.concatenate([J, jnp.zeros((pad, PATCH, 6), J.dtype)])
        okpx = jnp.concatenate([okpx, jnp.zeros((pad, PATCH), bool)])
    H, W = img.shape
    Hinv8 = jnp.zeros((8, 8), jnp.float32).at[:6, :6].set(Hinv)
    # T as a [1,16] row: 9 rotation entries row-major + 3 translation
    T0 = jnp.concatenate(
        [T_init[:3, :3].reshape(9), T_init[:3, 3].reshape(3),
         jnp.zeros((4,), jnp.float32)]
    ).reshape(1, 16)
    kern = functools.partial(
        _level_kernel, fx=fx, fy=fy, cx=cx, cy=cy, iters=iters,
        tn=TN,
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 16), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        jnp.asarray(img, jnp.float32),
        jnp.asarray(X_ref, jnp.float32),
        jnp.asarray(ref_patch, jnp.float32),
        jnp.transpose(jnp.asarray(J, jnp.float32), (2, 0, 1)),
        okpx.astype(jnp.float32),
        Hinv8,
        T0,
    )
    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[:3, :3].set(out[0, 0:9].reshape(3, 3))
    T = T.at[:3, 3].set(out[0, 9:12])
    return T, out[0, 12], out[0, 13].astype(jnp.int32)


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
