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
    """[T, 8] uint32 -> [T, 256] bf16 in {-1, +1}."""
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 32), 2)
    bits = (words[:, :, None] >> shifts) & jnp.uint32(1)  # [T,8,32]
    pm1 = bits.astype(jnp.bfloat16) * 2.0 - 1.0
    return pm1.reshape(words.shape[0], BITS)


def _kernel(a_ref, b_ref, out_ref):
    sa = _unpack_pm1(a_ref[:])  # [TILE, 256]
    sb = _unpack_pm1(b_ref[:])
    dot = jax.lax.dot_general(
        sa, sb,
        dimension_numbers=(((1,), (1,)), ((), ())),
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
