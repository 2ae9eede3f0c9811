"""Pallas TPU kernel: dense SPD Cholesky factor + solve in ONE launch.

The reduced camera system of the Schur BA is a small dense SPD matrix
([6K, 6K]; K=24 locals -> [144,144]). XLA's cho_factor/cho_solve lower to
3-4 library custom-calls whose fixed latencies total ~46 us/GN-iteration —
the single largest block of the r5 v2 BA iteration (BENCH_TABLE.md,
scripts/diag_profile_ba.py) and far above the arithmetic cost (~1 MFLOP).
This kernel runs the whole solve x = S^-1 b as one Mosaic program:

  factor   blocked right-looking Cholesky, 8-row panels: within a panel,
           full-row forward recurrences ([1,N] row MACs; panel scalars are
           re-read from the factor ref, which keeps every operand either a
           scalar ref read or a row); the trailing rank-8 update is one
           MXU dot_general (panel^T panel) subtracted below the panel.
  forward  L y = b (L = U^T) blocked the same way: 8 in-panel scalar
           recurrences + 8 row MACs pushing the residual right.
  backward U x = y by row-dots: x_r = (y_r - U_row_r . x) / U_rr — the
           [1,N] multiply + full-row reduce is Mosaic-legal (2D row
           reduce), avoiding any need for U columns.

U (= L^T) rows are masked at write (col >= row), so later reads never see
the sub-diagonal garbage the full-row recurrences leave behind.

Replaces g2o's LinearSolverDense/CholmodExt for the reduced system
(/root/reference/src/extra/g2o/solvers/linear_solver_dense.h) — one fused
on-chip solve instead of a host library call per LM iteration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 8
# VMEM bound: the factor scratch is [N, N] f32 (plus the lane padding
# Mosaic adds); 384 = K=64 dist-scale systems at ~0.6 MB
N_MAX = 384


def _kernel(S_ref, b_ref, U_ref, x_ref, *, N):
    NB = N // BLOCK
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    f32 = jnp.float32

    # ---- factor: U upper (= L^T), blocked right-looking ----
    U_ref[:, :] = S_ref[:, :]
    for bidx in range(NB):
        r0 = bidx * BLOCK
        for j in range(BLOCK):
            r = r0 + j
            row = U_ref[r:r + 1, :]
            for k in range(j):
                # L[j,k] of this panel = U[r0+k, r], already final
                row = row - U_ref[r0 + k, r] * U_ref[r0 + k:r0 + k + 1, :]
            U_ref[r:r + 1, :] = row  # unscaled, to read the pivot scalar
            inv = 1.0 / jnp.sqrt(jnp.maximum(U_ref[r, r], 1e-20))
            U_ref[r:r + 1, :] = row * inv * (iota >= r).astype(f32)
        # trailing rank-8 update below the panel (rows <= r0+7 are final;
        # panel rows are col-masked so the product is zero left of r0)
        panel = U_ref[r0:r0 + BLOCK, :]
        upd = jax.lax.dot_general(
            panel, panel, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # [N, N]
        rmask = (
            jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0) >= r0 + BLOCK
        ).astype(f32)
        U_ref[:, :] = U_ref[:, :] - rmask * upd

    # ---- forward: L y = b, blocked; residual lives in x_ref row 0 ----
    x_ref[0:1, :] = b_ref[0:1, :]
    y_row = jnp.zeros((1, N), f32)
    for bidx in range(NB):
        r0 = bidx * BLOCK
        ys = []
        for j in range(BLOCK):
            r = r0 + j
            acc = x_ref[0, r]
            for k in range(j):
                acc = acc - U_ref[r0 + k, r] * ys[k]
            ys.append(acc / U_ref[r, r])
        upd = ys[0] * U_ref[r0:r0 + 1, :]
        for j in range(1, BLOCK):
            upd = upd + ys[j] * U_ref[r0 + j:r0 + j + 1, :]
        x_ref[0:1, :] = x_ref[0:1, :] - upd
        for j in range(BLOCK):
            y_row = y_row + jnp.where(iota == r0 + j, ys[j], 0.0)
    x_ref[1:2, :] = y_row  # park y for scalar reads

    # ---- backward: U x = y by row-dots ----
    x_row = jnp.zeros((1, N), f32)
    for r in range(N - 1, -1, -1):
        urow = U_ref[r:r + 1, :]
        s = jnp.sum(urow * x_row)  # cols > r of x are set; others 0
        xr = (x_ref[1, r] - s) / U_ref[r, r]
        x_row = x_row + jnp.where(iota == r, xr, 0.0)
    x_ref[0:1, :] = x_row


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_solve_dense(S, b, interpret: bool = False):
    """x = S^-1 b for SPD S [N,N], b [N]. N is padded to a BLOCK multiple
    with an identity diagonal (block-diagonal: the solution is unchanged).
    Caller gates on N <= N_MAX (use jax.scipy cho_factor/cho_solve above)."""
    N = S.shape[0]
    pad = (-N) % BLOCK
    if pad:
        S = jnp.pad(S, ((0, pad), (0, pad)))
        ii = N + jnp.arange(pad)
        S = S.at[ii, ii].set(1.0)
        b = jnp.pad(b, (0, pad))
    Np = N + pad
    assert Np <= N_MAX, "chol_solve_dense: system too large (gate on N_MAX)"
    out_U, out_x = pl.pallas_call(
        functools.partial(_kernel, N=Np),
        out_shape=(
            jax.ShapeDtypeStruct((Np, Np), jnp.float32),
            jax.ShapeDtypeStruct((2, Np), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(S, b.reshape(1, Np))
    return out_x[0, :N]
