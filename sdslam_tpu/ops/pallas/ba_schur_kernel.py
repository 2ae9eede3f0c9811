"""Pallas TPU kernel v2: BA edge pass + point elimination + Z-scatter in ONE
launch.

The r4/r5 edge kernel (ba_edge_kernel.ba_edge_terms) fused the per-edge
residual/Jacobian/H/b math, but left ~180 us/GN-iteration of XLA around it
(scripts/diag_profile_ba.py, r5): a 61 us point-batched one-hot matmul
scattering edge W blocks into the [6K, 3P] Schur factor Z, ~117 us of layout
copies/reshapes feeding it, and the [10,P,Mo] per-point reductions. This
kernel removes all of it by changing the EDGE LAYOUT from flat [C, P*Mo]
(obs-minor) to [C, Mo, P] (points on the 128-lane axis, a point's
observations stacked on sublanes), which makes every per-point quantity a
[1, P] row and every per-point reduction a sublane reduce:

    per-edge math  ->  W (6x3 per-edge blocks), Hcc/bc columns, cost
    sublane reduce ->  per-point Hpp (6 sym comps) + bp + rho
    row math       ->  LM damping, closed-form 3x3 Cholesky L^-1,
                       Hpp^-1 = Linv^T Linv, ybp = Hpp^-1 bp
    Z-scatter      ->  for each camera k: masked sublane reduce of W
                       (sum_m [cam==k] W[i,j]), then fold Linv rows into
                       Zt[j][k*6+i, p] — the per-(camera, point) output the
                       XLA path needed the batched matmul + transposes for

Outputs feed four plain 2D MXU matmuls on the XLA side (Hcc/bc columns and
V·ybp against the one-hot, S = -Z Z^T) plus the dense [6K,6K] Cholesky —
nothing else.

Mosaic recipes follow ops/pallas/{align,pose}_kernel.py: no rank-changing
reshapes in-kernel (the [C, Mo, P] operand is packed on the XLA side), no
scalar stores (all stores are [1, P] row slices or [Mo, P] planes), masks
stay f32, traced scalars (lm_lambda) arrive via a [1, 128] VMEM row.

Replaces g2o's BlockSolver_6_3 landmark elimination
(/root/reference/src/extra/g2o/core/block_solver.hpp:102-180) batched over
every landmark at once.

Channel maps
------------
input  [28, Mo, P]:
    0-15  camera row-major T (16)          16-18  point world position X
    19-20 observed (u, v)                  21     observed u_r
    22    inv_sigma2                       23     stereo flag (0/1)
    24    edge valid (0/1)                 25     camera-active (0/1)
    26    point-active (0/1)               27     camera index (f32)
edge out [51, Mo, P] (EMIT_ZT) or [69, Mo, P]:
    0-17  W = Jc^T w Jp (i*3+j)            18-38  upper-tri Jc^T w Jc (21)
    39-44 -Jc^T w r (6)                    45-50  V·ybp edge terms (6)
    51-68 (only when the Z-scatter is off) Ze = W Linv^T (18)
rows out [10, P]:
    0-5   Hpp^-1 sym comps (s00,s01,s02,s11,s12,s22)
    6-8   ybp = Hpp^-1 bp                  9      robust cost rho (per point)
zt out [18K, P] (EMIT_ZT only): Zt[j][k*6+i] at channel j*6K + k*6 + i.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdslam_tpu.solvers import ba_const

N_IN = 28
N_EDGE = 51  # with Z-scatter; +18 Ze channels without
LANES = 128
# in-kernel Z-scatter limit: the masked-reduce loop and the [18K, TPL] VMEM
# block scale with K; beyond this the caller falls back to the XLA batched
# one-hot scatter (dist BA with very large replicated camera sets)
ZT_MAX_K = 64
VMEM_BUDGET = 2.5 * 2**20  # per-step working set (double-buffered by Mosaic)


def _tile_lanes(Mo_pad: int, K: int, emit_zt: bool) -> int:
    n_edge = N_EDGE if emit_zt else N_EDGE + 18
    per_lane = 4 * (Mo_pad * (N_IN + n_edge) + 10 + (18 * K if emit_zt else 0))
    tpl = LANES
    while tpl * 2 * per_lane <= VMEM_BUDGET and tpl < 8 * LANES:
        tpl *= 2
    return tpl


def _kernel(misc_ref, in_ref, edge_ref, rows_ref, zt_ref, *,
            fx, fy, cx, cy, bf, use_huber, K, emit_zt):
    g = lambda c: in_ref[c, :, :]  # [Mo, T] f32
    r00, r01, r02, t0 = g(0), g(1), g(2), g(3)
    r10, r11, r12, t1 = g(4), g(5), g(6), g(7)
    r20, r21, r22, t2 = g(8), g(9), g(10), g(11)
    X0, X1, X2 = g(16), g(17), g(18)
    u_obs, v_obs, ur_obs = g(19), g(20), g(21)
    info, st, obs_ok = g(22), g(23), g(24)
    cam_act, pt_act, cam_id = g(25), g(26), g(27)
    lam = misc_ref[0, 0]

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

    zero = jnp.zeros_like(zi)
    JX = (
        (fx * zi, zero, -fx * x * zi2),
        (zero, fy * zi, -fy * y * zi2),
        (st * fx * zi, zero, st * (-fx * x * zi2 + bf * zi2)),
    )
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

    # W18 (kept in registers for the Z-scatter below, stored for back-sub)
    W = [[None] * 3 for _ in range(6)]
    o = 0
    for i in range(6):
        for j in range(3):
            W[i][j] = w * (
                Jc[0][i] * Jp[0][j] + Jc[1][i] * Jp[1][j] + Jc[2][i] * Jp[2][j]
            )
            edge_ref[o, :, :] = W[i][j]
            o += 1
    # G21 (upper-tri Jc^T w Jc) + bc6
    for i in range(6):
        for j in range(i, 6):
            edge_ref[o, :, :] = w * (
                Jc[0][i] * Jc[0][j] + Jc[1][i] * Jc[1][j] + Jc[2][i] * Jc[2][j]
            )
            o += 1
    for i in range(6):
        edge_ref[o, :, :] = -w * (
            Jc[0][i] * res[0] + Jc[1][i] * res[1] + Jc[2][i] * res[2]
        )
        o += 1

    def prow(e):  # per-point sublane reduce -> [1, T]
        return jnp.sum(e, axis=0, keepdims=True)

    # per-point Hpp (6 sym comps) + bp + rho
    hpp = []
    for i in range(3):
        for j in range(i, 3):
            hpp.append(prow(w * (
                Jp[0][i] * Jp[0][j] + Jp[1][i] * Jp[1][j] + Jp[2][i] * Jp[2][j]
            )))
    bp = [
        prow(-w * (Jp[0][i] * res[0] + Jp[1][i] * res[1] + Jp[2][i] * res[2]))
        for i in range(3)
    ]
    rows_ref[9:10, :] = prow(rho * ok)

    # LM damping on the point blocks (trace-scaled, matching the XLA path)
    h00, h01, h02, h11, h12, h22 = hpp
    damp = lam * jnp.maximum((h00 + h11 + h22) / 3.0, 1e-8) + 1e-9
    h00 = h00 + damp
    h11 = h11 + damp
    h22 = h22 + damp
    # closed-form Cholesky of the damped 3x3 + lower-triangular inverse
    l00 = jnp.sqrt(jnp.maximum(h00, 1e-30))
    l10 = h01 / l00
    l20 = h02 / l00
    l11 = jnp.sqrt(jnp.maximum(h11 - l10 * l10, 1e-30))
    l21 = (h12 - l10 * l20) / l11
    l22 = jnp.sqrt(jnp.maximum(h22 - l20 * l20 - l21 * l21, 1e-30))
    i00 = 1.0 / l00
    i11 = 1.0 / l11
    i22 = 1.0 / l22
    i10 = -l10 * i00 * i11
    i20 = (l10 * l21 - l20 * l11) * i00 * i11 * i22
    i21 = -l21 * i11 * i22
    # Hpp^-1 = Linv^T Linv (sym comps)
    s00 = i00 * i00 + i10 * i10 + i20 * i20
    s01 = i10 * i11 + i20 * i21
    s02 = i20 * i22
    s11 = i11 * i11 + i21 * i21
    s12 = i21 * i22
    s22 = i22 * i22
    rows_ref[0:1, :] = s00
    rows_ref[1:2, :] = s01
    rows_ref[2:3, :] = s02
    rows_ref[3:4, :] = s11
    rows_ref[4:5, :] = s12
    rows_ref[5:6, :] = s22
    y0 = s00 * bp[0] + s01 * bp[1] + s02 * bp[2]
    y1 = s01 * bp[0] + s11 * bp[1] + s12 * bp[2]
    y2 = s02 * bp[0] + s12 * bp[1] + s22 * bp[2]
    rows_ref[6:7, :] = y0
    rows_ref[7:8, :] = y1
    rows_ref[8:9, :] = y2

    # V·ybp edge terms (rows broadcast over the Mo sublanes)
    for i in range(6):
        edge_ref[45 + i, :, :] = W[i][0] * y0 + W[i][1] * y1 + W[i][2] * y2

    if emit_zt:
        # Z-scatter: per camera k, masked sublane reduce of W, then fold the
        # Linv rows — Zt[j][k*6+i] = sum_{j'} Linv[j][j'] (sum_m [cam==k] W[i][j'])
        K6 = 6 * K
        for k in range(K):
            mk = (cam_id == float(k)).astype(jnp.float32)
            for i in range(6):
                mw0 = prow(mk * W[i][0])
                mw1 = prow(mk * W[i][1])
                mw2 = prow(mk * W[i][2])
                r = k * 6 + i
                zt_ref[r:r + 1, :] = mw0 * i00
                zt_ref[K6 + r:K6 + r + 1, :] = mw0 * i10 + mw1 * i11
                zt_ref[2 * K6 + r:2 * K6 + r + 1, :] = (
                    mw0 * i20 + mw1 * i21 + mw2 * i22
                )
    else:
        # edge-level Ze = W Linv^T for the XLA batched scatter (large K)
        for i in range(6):
            edge_ref[51 + i, :, :] = W[i][0] * i00
            edge_ref[57 + i, :, :] = W[i][0] * i10 + W[i][1] * i11
            edge_ref[63 + i, :, :] = (
                W[i][0] * i20 + W[i][1] * i21 + W[i][2] * i22
            )


@functools.partial(
    jax.jit,
    static_argnames=("fx", "fy", "cx", "cy", "bf", "use_huber", "K",
                     "emit_zt", "interpret", "tpl", "mo_align"),
)
def ba_edge_schur(
    packed,  # [28, Mo, P] f32 channel-major per-edge inputs (see module doc)
    lm_lambda,  # traced scalar: LM damping for the point blocks
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    bf: float,
    use_huber: bool,
    K: int,
    emit_zt: bool = True,
    interpret: bool = False,
    tpl: int = 0,
    mo_align: int = 1,
):
    """Returns (edge [51|69, Mo, P], rows [10, P], zt [18K, P] | None).

    P is padded to the lane-tile multiple internally; padded edges
    contribute exact zeros (w = 0). Mosaic accepts non-8-multiple sublane
    blocks directly (A/B at Mo=10: 27.6 us unpadded vs 28.3 us padded to
    16, identical outputs) — mo_align is kept for re-measuring if a future
    toolchain changes that."""
    C, Mo, P = packed.shape
    assert C == N_IN
    mo_pad = (-Mo) % mo_align
    if mo_pad:
        packed = jnp.pad(packed, ((0, 0), (0, mo_pad), (0, 0)))
    Mo_p = Mo + mo_pad
    if tpl == 0:
        tpl = _tile_lanes(Mo_p, K, emit_zt)
    p_pad = (-P) % tpl
    if p_pad:
        packed = jnp.pad(packed, ((0, 0), (0, 0), (0, p_pad)))
    Pp = P + p_pad
    misc = jnp.zeros((1, LANES), jnp.float32).at[0, 0].set(
        jnp.asarray(lm_lambda, jnp.float32)
    )
    n_edge = N_EDGE if emit_zt else N_EDGE + 18
    out_shapes = [
        jax.ShapeDtypeStruct((n_edge, Mo_p, Pp), jnp.float32),
        jax.ShapeDtypeStruct((10, Pp), jnp.float32),
        jax.ShapeDtypeStruct((18 * K if emit_zt else 1, Pp), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((n_edge, Mo_p, tpl), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((10, tpl), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((18 * K if emit_zt else 1, tpl), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    kern = functools.partial(
        _kernel, fx=fx, fy=fy, cx=cx, cy=cy, bf=bf,
        use_huber=use_huber, K=K, emit_zt=emit_zt,
    )
    if not emit_zt:
        # zt output unused: shrink it to one dummy row (still passed — a
        # conditional ref arity would mean two kernel bodies)
        kern2 = kern

        def kern(misc_ref, in_ref, edge_ref, rows_ref, zt_ref):
            zt_ref[0:1, :] = jnp.zeros((1, tpl), jnp.float32)
            kern2(misc_ref, in_ref, edge_ref, rows_ref, zt_ref)

    edge, rows, zt = pl.pallas_call(
        kern,
        out_shape=tuple(out_shapes),
        grid=(Pp // tpl,),
        in_specs=[
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_IN, Mo_p, tpl), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(misc, packed)
    edge = edge[:, :Mo, :P]
    rows = rows[:, :P]
    return edge, rows, (zt[:, :P] if emit_zt else None)
