"""Pallas TPU kernel: 256-bit Hamming distance matrix on the MXU.

The XLA path (ops/hamming.py) computes XOR+popcount on the VPU. This kernel
maps the same computation onto the MXU via the +-1 trick:

    pop(a XOR b) = (256 - dot(s_a, s_b)) / 2,   s in {-1, +1}^256

Each grid step unpacks a [TM, 8]x[TN, 8] uint32 tile pair into +-1 bf16
on-chip (VMEM) and issues one 256-deep matmul — the unpack fuses with the
MXU feed instead of materializing [N, 256] operands in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
BITS = 256
WORDS = 8


def _unpack_pm1(words):
    """[T, 8] uint32 -> [T, 256] f32 in {-1, +1}.

    Stays in 2D vector layouts throughout (mosaic rejects 3D->2D bf16
    shape casts and uint32->bf16 casts on v5e): each word unpacks to a
    [T, 32] slice via a broadcast shift, concatenated along the lane dim.
    """
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (1, 32), 1)
    parts = []
    for w in range(WORDS):
        bits = (words[:, w][:, None] >> shifts) & jnp.uint32(1)  # [T,32]
        parts.append(bits.astype(jnp.int32))
    return jnp.concatenate(parts, axis=1).astype(jnp.float32) * 2.0 - 1.0


def _kernel(a_ref, b_ref, out_ref):
    sa = _unpack_pm1(a_ref[:])  # [TILE, 256]
    # mosaic rejects dot_general contracting dim 1 with dim 1; transpose the
    # rhs tile explicitly so the contraction is a standard [M,K]x[K,N]
    sbT = jnp.transpose(_unpack_pm1(b_ref[:]))  # [256, TILE]
    dot = jax.lax.dot_general(
        sa, sbT,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = ((BITS - dot) * 0.5).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_matrix_pallas(da, db, interpret: bool = False):
    """[Na, 8] x [Nb, 8] uint32 -> [Na, Nb] int32 Hamming distances.

    Na/Nb are padded up to the 128 tile internally.
    """
    Na, Nb = da.shape[0], db.shape[0]
    pa = (-Na) % TILE
    pb = (-Nb) % TILE
    if pa:
        da = jnp.concatenate([da, jnp.zeros((pa, WORDS), jnp.uint32)])
    if pb:
        db = jnp.concatenate([db, jnp.zeros((pb, WORDS), jnp.uint32)])
    Ma, Mb = da.shape[0], db.shape[0]
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((Ma, Mb), jnp.int32),
        grid=(Ma // TILE, Mb // TILE),
        in_specs=[
            pl.BlockSpec((TILE, WORDS), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, WORDS), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(da, db)
    return out[:Na, :Nb]
