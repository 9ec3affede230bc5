"""Scalar quantization of stored vectors: f16 / i8 / 1-bit.

The reference's ``quant_bits`` index option (options.c:137-158) stores
vectors as f32/f16/i8/b1 inside the node tape and computes distances in that
scalar kind. Here the storage dtype lives in the DeviceGraph:

- f16/bf16: plain dtype cast of the vectors array (MXU-native for bf16)
- i8: symmetric per-vector scaling codes = round(x * 127 / max|x|); the
  device keeps codes + a per-vector f32 scale; distance kernels dequantize
  on the fly (int8 gathers are 4x lighter on HBM than f32 — the win)
- b1: sign bits packed into uint32 words; distances become hamming
  (XOR+popcount), 32x lighter than f32
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lantern_tpu.ops.distance import pack_bits


def quantize_i8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-vector int8 quantization -> (codes [n,d] i8, scales [n] f32)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scales = jnp.maximum(amax, 1e-30) / 127.0
    codes = jnp.clip(jnp.round(xf / scales[..., None]), -127, 127).astype(jnp.int8)
    return codes, scales


def dequantize_i8(codes: jax.Array, scales: jax.Array) -> jax.Array:
    return codes.astype(jnp.float32) * scales[..., None]


def binarize(x: jax.Array) -> jax.Array:
    """1-bit quantization: sign bits packed to uint32 words (b1 storage)."""
    return pack_bits(x)
