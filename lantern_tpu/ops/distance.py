"""Distance kernels: squared L2, cosine, hamming — batched, MXU-friendly.

Functional parity with the reference's SQL distance functions
(lantern_hnsw/src/hnsw.c:354-405: l2sq_dist / cos_dist / hamming_dist and the
pgvector-typed variants) and usearch_distance semantics:

- l2sq: sum((a-b)^2)                 (NOT square-rooted, matches `<->`)
- cos:  1 - dot(a,b)/(|a||b|)        (matches `<=>`)
- hamming: popcount(a XOR b) over the *bits* of integer arrays; an
  integer[] of length L is a (32*L)-bit vector (reference: build.c:504-509).

TPU-first design: batch distances are expressed as one matmul against the
query block plus rank-1 corrections, so XLA tiles them onto the MXU:
    l2sq(Q, X) = |q|^2 - 2 Q X^T + |x|^2
    cos(Q, X)  = 1 - (Q X^T) / (|q| |x|)
Hamming runs on the VPU as XOR + popcount over packed uint32 words.
Accumulation is always float32 (preferred_element_type) regardless of the
storage dtype (bf16/int8 inputs are fine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lantern_tpu.config import Metric


# ---------------------------------------------------------------------------
# pairwise (single pair) distances — parity with SQL UDFs
# ---------------------------------------------------------------------------

def l2sq_dist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared euclidean distance between two vectors (hnsw.c:354-364)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    d = a - b
    return jnp.sum(d * d, axis=-1)


def cos_dist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Cosine distance 1 - cos_sim (hnsw.c:366-381)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    num = jnp.sum(a * b, axis=-1)
    den = jnp.sqrt(jnp.sum(a * a, axis=-1) * jnp.sum(b * b, axis=-1))
    return 1.0 - num / jnp.maximum(den, 1e-30)


def hamming_dist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Bit-level hamming distance between integer arrays (hnsw.c:383-395).

    Inputs are int32/uint32 arrays; distance = popcount over XOR of all words.
    """
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    x = jnp.bitwise_xor(a, b)
    return jnp.sum(_popcount_u32(x), axis=-1).astype(jnp.float32)


def _popcount_u32(x: jax.Array) -> jax.Array:
    """Vectorized popcount for uint32 (SWAR, VPU-friendly)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


# ---------------------------------------------------------------------------
# batched query-block × base-block distances (the MXU hot path)
# ---------------------------------------------------------------------------

def _sq_norms(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    return jnp.sum(xf * xf, axis=-1)


def pairwise_dist(
    queries: jax.Array,
    base: jax.Array,
    metric: Metric | int = Metric.L2SQ,
    *,
    base_sq_norms: jax.Array | None = None,
    precision: jax.lax.Precision | str = jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """All-pairs distances: queries [Q, d] × base [N, d] -> [Q, N] float32.

    For hamming, inputs are packed uint32 words ([Q, W], [N, W]).
    ``base_sq_norms`` can be precomputed (float32 [N]) to skip the norm pass.
    ``precision`` controls the MXU pass count: HIGHEST = full f32 (used by the
    exact oracle); 'default' = single-pass bf16 inputs (fine for graph-search
    candidate ranking, ~6x faster on the MXU).
    """
    metric = Metric(metric)
    if metric == Metric.HAMMING:
        return _pairwise_hamming(queries, base)
    qf = queries.astype(jnp.float32)
    dots = jax.lax.dot_general(
        qf,
        base,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if metric == Metric.L2SQ:
        qn = _sq_norms(queries)[:, None]
        bn = (base_sq_norms if base_sq_norms is not None else _sq_norms(base))[None, :]
        # clamp: fp cancellation can produce tiny negatives
        return jnp.maximum(qn - 2.0 * dots + bn, 0.0)
    if metric == Metric.COS:
        qn = jnp.sqrt(_sq_norms(queries))[:, None]
        bn = jnp.sqrt(
            base_sq_norms if base_sq_norms is not None else _sq_norms(base)
        )[None, :]
        return 1.0 - dots / jnp.maximum(qn * bn, 1e-30)
    raise ValueError(f"unknown metric {metric}")


def _pairwise_hamming(queries: jax.Array, base: jax.Array) -> jax.Array:
    """[Q, W] × [N, W] packed-u32 hamming. VPU XOR+popcount, blocked over N."""
    q = queries.astype(jnp.uint32)
    b = base.astype(jnp.uint32)
    # [Q, 1, W] xor [1, N, W] -> [Q, N, W]; fine for moderate Q*N, the graph
    # search only ever materializes small candidate blocks.
    x = jnp.bitwise_xor(q[:, None, :], b[None, :, :])
    return jnp.sum(_popcount_u32(x), axis=-1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# exact search (brute force) — the recall oracle
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k", "metric", "block"))
def exact_search(
    queries: jax.Array,
    base: jax.Array,
    k: int,
    metric: Metric | int = Metric.L2SQ,
    block: int = 65536,
) -> tuple[jax.Array, jax.Array]:
    """Exact k-NN: returns (dists [Q,k], ids [Q,k]), ascending by distance.

    This is the ground-truth oracle the reference computes with a seq scan
    (lantern_cli/src/index_autotune/mod.rs:188-218, test recall utilities).
    Blocked over the base so multi-million-row bases don't materialize a
    [Q, N] matrix; running top-k is merged per block.
    """
    metric = int(Metric(metric))
    n = base.shape[0]
    q = queries.shape[0]
    if n == 0:  # empty base: no neighbors (not a ZeroDivisionError below)
        return (jnp.full((q, 0), jnp.inf, jnp.float32),
                jnp.full((q, 0), -1, jnp.int32))
    k = min(k, n)
    block = min(block, n)
    nblocks = -(-n // block)
    pad_n = nblocks * block
    if pad_n != n:
        pad = jnp.full((pad_n - n,) + base.shape[1:], 0, dtype=base.dtype)
        base = jnp.concatenate([base, pad], axis=0)

    def body(carry, i):
        best_d, best_i = carry
        start = i * block
        blk = jax.lax.dynamic_slice_in_dim(base, start, block, axis=0)
        d = pairwise_dist(queries, blk, metric)  # [Q, block]
        # mask padded tail rows, then block-local top-k and a tiny [Q, 2k]
        # merge — keeps the compiled program small ([1, block] iota instead
        # of [Q, k+block] concatenated index constants)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
        d = jnp.where(start + col < n, d, jnp.inf)
        neg, loc = jax.lax.top_k(-d, k)
        ids = start + loc
        bd = -neg
        cat_d = jnp.concatenate([best_d, bd], axis=1)
        cat_i = jnp.concatenate([best_i, ids], axis=1)
        neg_top, arg = jax.lax.top_k(-cat_d, k)
        return (-neg_top, jnp.take_along_axis(cat_i, arg, axis=1)), None

    init = (
        jnp.full((q, k), jnp.inf, dtype=jnp.float32),
        jnp.full((q, k), -1, dtype=jnp.int32),
    )
    (dists, ids), _ = jax.lax.scan(body, init, jnp.arange(nblocks))
    return dists, ids


# ---------------------------------------------------------------------------
# bit packing for hamming / b1 quantization
# ---------------------------------------------------------------------------

def pack_bits(x: jax.Array) -> jax.Array:
    """Pack a [..., dim] 0/1 (or sign) float/int array into [..., ceil(dim/32)]
    uint32 words, little-endian within a word (bit i of word w = dim 32w+i).

    Mirrors the reference's b1 quantization where positive components set
    bits (quant_bits=1 storage, options.c:137-158).
    """
    bits = (x > 0).astype(jnp.uint32)
    dim = bits.shape[-1]
    words = -(-dim // 32)
    pad = words * 32 - dim
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros(bits.shape[:-1] + (pad,), jnp.uint32)], axis=-1
        )
    bits = bits.reshape(bits.shape[:-1] + (words, 32))
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts, axis=-1, dtype=jnp.uint32)


def unpack_bits(packed: jax.Array, dim: int) -> jax.Array:
    """Inverse of pack_bits -> float32 0/1 array of size dim."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[..., :, None] >> shifts) & jnp.uint32(1)
    flat = bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 32,))
    return flat[..., :dim].astype(jnp.float32)
