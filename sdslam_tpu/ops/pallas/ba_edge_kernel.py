"""Pallas TPU kernel: fused bundle-adjustment edge assembly.

One Gauss-Newton iteration of the Schur-complement BA
(solvers/ba._gn_iteration) spends most of its time in ~50 small elementwise
XLA fusions over flat per-edge [E] vectors (residuals, Jacobian products,
H/b components) — each pays fixed kernel-launch overhead, so the iteration
ran ~10x off the HBM roofline. This kernel computes ALL per-edge math in a
single pass:

    inputs  [27, R, 128]: camera row-major T (16), point world position (3),
            observed (u, v), observed u_r, information, stereo flag, edge
            mask, camera-active, point-active  — edges flattened to
            128-lane tiles (R = E/128)
    outputs [55, R, 128]: W = Jc^T w Jp (18), upper-tri Jc^T w Jc (21),
            -Jc^T w r (6), upper-tri Jp^T w Jp (6), -Jp^T w r (3),
            robust cost rho (1)

Everything in-kernel is 2D [TR, 128] vector-register math — no reshapes, no
matmuls, no gathers (the per-edge camera rows arrive via an MXU one-hot
matmul in the caller), which sidesteps every Mosaic v5e lowering limitation
hit by earlier kernels (3D shape casts, sublane concatenation, dim-1 dot
contractions).

Replaces the per-edge linearization of g2o's SE3 reprojection edges
(reference: src/extra/g2o/types/types_six_dof_expmap.h:80-205) — batched
over every edge at once instead of a per-edge virtual call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdslam_tpu.solvers import ba_const

N_IN = 27
N_OUT = 55
LANES = 128
# sublane tile per grid step: r1 shipped TR=8, which at 20k edges meant 20
# grid steps of 4 KB-per-channel DMAs — per-step issue latency dominated
# (measured 30 GB/s ~ 4% of roofline). TR=32 keeps VMEM modest (442 KB in
# + 901 KB out per step, ~2.7 MB double-buffered) with 4x fewer steps and
# 4x larger DMAs. r4 slope-timed sweep (scripts/diag_ba_launch.py): at the
# production 20k-edge size a SINGLE grid step (TR=160) reaches 81% of HBM
# roofline vs 62% for TR=32, so small problems run un-tiled; larger ones
# keep TR=32 (TR>=1024 fails to compile; 32 measured 51% at 131k edges).
TR = 32
# single-step threshold: problems up to this many sublane rows (R = E/128)
# run as one grid step
TR_SINGLE_MAX = 160


def _kernel(fx, fy, cx, cy, bf, use_huber, in_ref, out_ref):
    g = lambda c: in_ref[c, :, :]  # [TR, 128] f32
    r00, r01, r02, t0 = g(0), g(1), g(2), g(3)
    r10, r11, r12, t1 = g(4), g(5), g(6), g(7)
    r20, r21, r22, t2 = g(8), g(9), g(10), g(11)
    X0, X1, X2 = g(16), g(17), g(18)
    u_obs, v_obs, ur_obs = g(19), g(20), g(21)
    info, st, obs_ok = g(22), g(23), g(24)
    cam_act, pt_act = g(25), g(26)

    x = r00 * X0 + r01 * X1 + r02 * X2 + t0
    y = r10 * X0 + r11 * X1 + r12 * X2 + t1
    z = r20 * X0 + r21 * X1 + r22 * X2 + t2
    zi = 1.0 / jnp.maximum(z, 1e-6)
    zi2 = zi * zi
    u = fx * x * zi + cx
    v = fy * y * zi + cy
    ur = u - bf * zi

    res0 = u - u_obs
    res1 = v - v_obs
    res2 = st * (ur - ur_obs)
    ok = obs_ok * (z > 0.05).astype(jnp.float32)

    chi2 = (res0 * res0 + res1 * res1 + res2 * res2) * info
    hub = jnp.where(st > 0, ba_const.HUBER_STEREO, ba_const.HUBER_MONO)
    d2 = hub * hub
    sq = jnp.sqrt(chi2 + 1e-12)
    rho = jnp.where(chi2 <= d2, chi2, 2.0 * hub * sq - d2)

    w = info * ok
    if use_huber:
        w = w * jnp.minimum(1.0, hub / jnp.maximum(sq, 1e-9))

    # JX rows (d residual / d Xc)
    zero = jnp.zeros_like(zi)
    JX = (
        (fx * zi, zero, -fx * x * zi2),
        (zero, fy * zi, -fy * y * zi2),
        (st * fx * zi, zero, st * (-fx * x * zi2 + bf * zi2)),
    )
    # Jc[r] = [JX[r] | Xc x JX[r]] (left-perturbation), masked by cam_active
    # Jp[r] = JX[r] @ R, masked by pt_active
    Jc = []
    Jp = []
    for (a, b, c_) in JX:
        cx_ = c_ * y - b * z
        cy_ = a * z - c_ * x
        cz_ = b * x - a * y
        Jc.append(tuple(cam_act * q for q in (a, b, c_, cx_, cy_, cz_)))
        Jp.append(
            tuple(
                pt_act * q
                for q in (
                    a * r00 + b * r10 + c_ * r20,
                    a * r01 + b * r11 + c_ * r21,
                    a * r02 + b * r12 + c_ * r22,
                )
            )
        )
    res = (res0, res1, res2)

    o = 0
    # W18: w * Jc_i Jp_j
    for i in range(6):
        for j in range(3):
            out_ref[o, :, :] = w * (
                Jc[0][i] * Jp[0][j] + Jc[1][i] * Jp[1][j] + Jc[2][i] * Jp[2][j]
            )
            o += 1
    # G21: upper-tri w * Jc_i Jc_j
    for i in range(6):
        for j in range(i, 6):
            out_ref[o, :, :] = w * (
                Jc[0][i] * Jc[0][j] + Jc[1][i] * Jc[1][j] + Jc[2][i] * Jc[2][j]
            )
            o += 1
    # bc6: -w * Jc_i r
    for i in range(6):
        out_ref[o, :, :] = -w * (
            Jc[0][i] * res[0] + Jc[1][i] * res[1] + Jc[2][i] * res[2]
        )
        o += 1
    # hpp6: upper-tri w * Jp_i Jp_j
    for i in range(3):
        for j in range(i, 3):
            out_ref[o, :, :] = w * (
                Jp[0][i] * Jp[0][j] + Jp[1][i] * Jp[1][j] + Jp[2][i] * Jp[2][j]
            )
            o += 1
    # bp3: -w * Jp_i r
    for i in range(3):
        out_ref[o, :, :] = -w * (
            Jp[0][i] * res[0] + Jp[1][i] * res[1] + Jp[2][i] * res[2]
        )
        o += 1
    # rho (cost contribution)
    out_ref[o, :, :] = rho * ok


@functools.partial(
    jax.jit,
    static_argnames=("fx", "fy", "cx", "cy", "bf", "use_huber", "interpret",
                     "tr"),
)
def ba_edge_terms(
    packed,  # [27, E] f32 channel-major per-edge inputs
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    bf: float,
    use_huber: bool,
    interpret: bool = False,
    tr: int = 0,
):
    """Returns [55, E] f32 per-edge outputs (see module docstring for the
    channel map). E is padded internally to a tr*128 multiple; padded edges
    must carry mask channel 24 == 0. `tr` = sublanes per grid step
    (0 = auto: one grid step for problems up to TR_SINGLE_MAX rows)."""
    C, E = packed.shape
    assert C == N_IN
    if tr == 0:
        R_full = -(-E // LANES)
        tr = R_full if R_full <= TR_SINGLE_MAX else TR
    tile = tr * LANES
    pad = (-E) % tile
    if pad:
        packed = jnp.concatenate([packed, jnp.zeros((C, pad), packed.dtype)], 1)
    Ep = packed.shape[1]
    R = Ep // LANES
    x = packed.reshape(C, R, LANES)
    out = pl.pallas_call(
        functools.partial(_kernel, fx, fy, cx, cy, bf, use_huber),
        out_shape=jax.ShapeDtypeStruct((N_OUT, R, LANES), jnp.float32),
        grid=(R // tr,),
        in_specs=[
            pl.BlockSpec((N_IN, tr, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N_OUT, tr, LANES), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
    return out.reshape(N_OUT, Ep)[:, :E]
