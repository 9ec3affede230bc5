"""Pallas TPU kernels for ops XLA handles poorly.

Design policy (pallas_guide.md): let XLA own what it compiles well (row
gathers, matmuls, top-k) and hand-write only the ops with no good XLA
lowering. Currently:

- ``hamming_block``: all-pairs XOR+popcount distances. The jnp formulation
  materializes a [Q, N, W] u32 intermediate (4 GB for Q=256 x N=1M x 128-bit
  vectors); this kernel tiles the base into VMEM blocks and accumulates on
  the VPU with SWAR popcount — O(Q*N) output, no blowup. Used by the exact
  oracle and rerank paths for the hamming metric (`<+>` operator parity).

Each kernel has an interpret-mode path so the CPU test mesh exercises the
same code the TPU runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _popcount_u32(x):
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _hamming_kernel(q_ref, b_ref, out_ref):
    """One (Q-block, N-block) tile: out[i, j] = popcount(q[i] ^ b[j])."""
    q = q_ref[:]  # [QB, W] u32
    b = b_ref[:]  # [NB, W] u32
    # [QB, 1, W] xor [1, NB, W] stays in VMEM at tile size
    x = jnp.bitwise_xor(q[:, None, :], b[None, :, :])
    out_ref[:] = jnp.sum(_popcount_u32(x), axis=-1).astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_n", "interpret")
)
def hamming_block(
    queries: jax.Array,
    base: jax.Array,
    block_q: int = 128,
    block_n: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """All-pairs hamming distances: [Q, W] x [N, W] packed u32 -> [Q, N] f32.

    Tiled Pallas kernel; pads Q/N up to block multiples internally.
    """
    q, w = queries.shape
    n = base.shape[0]
    block_q = min(block_q, max(8, q))
    block_n = min(block_n, max(128, n))
    qp = -(-q // block_q) * block_q
    np_ = -(-n // block_n) * block_n
    queries = jnp.pad(queries, ((0, qp - q), (0, 0)))
    base = jnp.pad(base, ((0, np_ - n), (0, 0)))

    out = pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((qp, np_), jnp.float32),
        grid=(qp // block_q, np_ // block_n),
        in_specs=[
            pl.BlockSpec((block_q, w), lambda i, j: (i, 0)),
            pl.BlockSpec((block_n, w), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((block_q, block_n), lambda i, j: (i, j)),
        interpret=interpret,
    )(queries, base)
    return out[:q, :n]


def hamming_exact_topk(
    queries: jax.Array,
    base: jax.Array,
    k: int,
    block_n: int = 65536,
    interpret: bool = False,
):
    """Exact hamming k-NN over a large packed base without materializing
    [Q, N]: per-block pallas distances + running top-k merge."""
    q = queries.shape[0]
    n = base.shape[0]
    k = min(k, n)
    best_d = jnp.full((q, k), jnp.inf, jnp.float32)
    best_i = jnp.full((q, k), -1, jnp.int32)
    for start in range(0, n, block_n):
        blk = base[start : start + block_n]
        d = hamming_block(queries, blk, interpret=interpret)
        neg, loc = jax.lax.top_k(-d, min(k, blk.shape[0]))
        ids = start + loc
        cat_d = jnp.concatenate([best_d, -neg], axis=1)
        cat_i = jnp.concatenate([best_i, ids], axis=1)
        neg_top, arg = jax.lax.top_k(-cat_d, k)
        best_d = -neg_top
        best_i = jnp.take_along_axis(cat_i, arg, axis=1)
    return best_d, best_i


# ---------------------------------------------------------------------------
# PQ decode on the MXU
# ---------------------------------------------------------------------------

def _pq_decode_kernel(codes_ref, cb_ref, exp_ref, colc_ref, out_ref):
    """One row tile: out[r, :] = concat_s centroids[s, codes[r, s], :].

    The one-hot [TB, S*K] is built in VMEM (never touches HBM) and
    contracted against the block-diagonal codebook [S*K, dim] in ONE
    MXU-shaped matmul. The XLA formulation (per-subspace batched matmuls
    with output dim d_sub=4) runs the MXU at ~3% utilization and
    materializes a [B, S, K] one-hot in HBM (~1 GB per 64k block at S=32,
    K=256) — profiled 22 ms per 1M-row scan vs ~27 ms for this kernel's
    whole scan at Q=256 and ~35 ms at Q=1024.

    The kernel is VPU-bound on the one-hot build (compare+select over
    TB x S*K elements; the [TB,8192]@[8192,128] dot itself is ~11 ms/1M),
    so the spread step codes[r, s(col)] runs on the MXU via a 0/1 expander
    matrix (measured 7 ms/1M faster than jnp.repeat's lane relayout) and
    the compare runs in f32 against a precomputed per-column code id.
    """
    c = codes_ref[0].astype(jnp.bfloat16)      # [TB, G]; codes < 256 exact
    rep = jnp.dot(c, exp_ref[:], preferred_element_type=jnp.float32)
    oh = (rep == colc_ref[:]).astype(jnp.bfloat16)
    out_ref[0] = jnp.dot(
        oh, cb_ref[0], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _make_hilo_kernel(grp: int, lo_w: int):
    """Hi/lo-decomposed decode: out[r, :] = concat_s centroids[s, codes[r, s]].

    The flat one-hot formulation (_pq_decode_kernel) pays, per row, a dense
    [1, G*K] @ [G*K, G*dsub] contraction (2.1 MFLOP at S=32/K=256/dim=128 —
    16x the useful FLOPs) plus a G*K-wide VPU compare to build the one-hot.
    Splitting the 8-bit code into two halves c = lo_w*hi + lo replaces the
    K=256-wide one-hot with a hi_w-wide and a lo_w-wide one, per subspace
    GROUP g:

        p1[r, (l,s,j)]  = cent[s, lo_w*hi(r,s) + l, j]    (ohh @ C1, MXU)
        dec[r, (s,j)]   = p1 at l = lo(r,s)               (select tree, VPU)

    Stage 1's output columns are L-MAJOR (l, s, j), and the lo selection is
    a log2(lo_w)-level SELECT TREE: at each level the remaining l-range
    halves, driven by a threshold compare on a remainder operand. Two
    earlier stage-2 formulations were measured and replaced (exp_hilo_v2 /
    v3, 1M x (S=32, dim=128) decode sweep, r3-r4):
      - 0/1 reduction matmul: paid 4x MXU output-lane padding — as many
        executed FLOPs as stage 1 (11.55 ms)
      - one-hot mask + slice-halving adds over [T, w2]: needed the lo code
        SPREAD to all w2 columns, and that spread matmul
        [T, grp] @ [grp, w2] pads its contraction dim 8 -> 128 — again
        nearly stage-1 cost (8.26 ms; 7.95 this hardware epoch)
      - select tree (current): the remainder is spread to ONE 128-lane
        tile only ([T, grp] @ [grp, 128]); wider conditions are concats of
        identical full-lane tiles (layout-friendly copies), and the
        full-width remainder update keeps every column copy consistent so
        one spread serves all levels (6.10 ms — benchmarks/exp_hilo_v3.py)

    The (hi_w, lo_w) split is a free parameter minimized by _hilo_plan;
    the 32/8 split was re-measured WITH the select tree (8.04 ms) and the
    16/16 split stays pinned.

    The grid runs over ROW TILES only; the group loop is unrolled inside
    the kernel with the whole grouped codebook VMEM-resident (512*G*dim
    bytes for every split), and each group writes its gd output columns of
    the row tile. Codes enter as uint8 and widen in-kernel (the host-side
    pad+int32 convert profiled at 0.9 ms/1M).

    All stages are 2-D MXU/VPU ops (Mosaic-safe). Output is bit-identical
    to _pq_decode_kernel: stage 1 selects exactly one bf16 codebook value
    per (l, s, j) (f32 accumulation of a single nonzero is exact; the
    hi/lo rep/compare values are < 256 hence exact in bf16), and the
    select tree picks exactly the matching l entry, so callers see the
    same decoded block (exactness asserted on TPU in exp_hilo_v3 and in
    tests/test_pallas.py on the interpret path).
    """

    def kernel(codes_ref, c1_ref, exph_ref, colh_ref, exps_ref, out_ref):
        ng = c1_ref.shape[0]
        w2 = c1_ref.shape[2]
        gd = w2 // lo_w
        c = codes_ref[:].astype(jnp.int32)              # [T, S] u8 -> i32
        outs = []
        for g in range(ng):
            cg = c[:, g * grp:(g + 1) * grp]
            chi = (cg // lo_w).astype(jnp.bfloat16)     # < 256: exact in bf16
            clo = (cg % lo_w).astype(jnp.bfloat16)
            # Mosaic requires 32-bit matmul accumulators and f32 vector
            # compares (bf16 cmpf is unsupported); the values are exact.
            rep_h = jnp.dot(chi, exph_ref[:],
                            preferred_element_type=jnp.float32)
            ohh = (rep_h == colh_ref[:]).astype(jnp.bfloat16)  # [T, G*hi_w]
            p1 = jnp.dot(ohh, c1_ref[g], preferred_element_type=jnp.float32)
            # remainder spread to min(128, w2/2) lanes: column c has
            # subspace s(c) = (c // dsub) % grp, repeating every gd lanes
            rem = jnp.dot(clo, exps_ref[:],
                          preferred_element_type=jnp.float32)
            acc = p1
            width = w2
            while width > gd:                           # select over l
                half = width // 2
                lev = jnp.float32(half // gd)
                if rem.shape[1] >= half:
                    cond = rem[:, :half] >= lev
                else:
                    c0 = rem >= lev
                    cond = jnp.concatenate(
                        [c0] * (half // rem.shape[1]), axis=1)
                acc = jnp.where(cond, acc[:, half:width], acc[:, :half])
                rem = rem - lev * (rem >= lev).astype(jnp.float32)
                width = half
            outs.append(acc.astype(out_ref.dtype))      # [T, G*dsub]
        out_ref[:] = outs[0] if ng == 1 else jnp.concatenate(outs, axis=1)

    return kernel


def codebook_blockdiag(centroids: jax.Array) -> jax.Array:
    """[S, K, dsub] f32 codebook -> block-diagonal [S*K, S*dsub] bf16 so a
    flat one-hot of (subspace, code) decodes the full vector in one dot."""
    s, kc, dsub = centroids.shape
    eye = jnp.eye(s, dtype=jnp.bfloat16)
    blk = eye[:, None, :, None] * centroids.astype(jnp.bfloat16)[:, :, None, :]
    return blk.reshape(s * kc, s * dsub)


# VMEM budget for the hi/lo kernel's resident grouped codebook (bytes).
# The whole-kernel guard in pq_decode_mxu_hilo allows ~14 MB; cap the
# codebook term at 8 MB so row tiles keep useful sizes.
HILO_CB_VMEM_BUDGET = 8 * 2**20


def _hilo_plan(s: int, dsub: int = 4):
    """Choose the (hi_w, lo_w, grp) hi/lo decomposition for K=256 codes.

    The 16/16 split at the largest VMEM-feasible group (grp*16 <= 128, one
    contraction tile) is the MEASURED optimum: a 32/8 split at grp=4
    executes half the padded stage-1 MXU tiles on paper
    (ng * roundup(grp*hi_w,128) * roundup(grp*lo_w*dsub,128)) but ran
    12.9 ms vs 8.26 ms per 1M x (S=32, dim=128) sweep — doubling the group
    count doubles the per-grid-step unroll of narrow VPU ops (compares,
    selects, sub-lane halving adds, an 8-way concat of [T,16] slices),
    which dominates the saved MXU padding (r4 measurement,
    benchmarks/exp_pq_qps.py). Don't re-litigate without profiling.

    Constraints: grp | S and the grouped codebook (ng*w1*w2 bf16 =
    512*grp*dim bytes for EVERY split, VMEM-resident across every grid
    step) fits HILO_CB_VMEM_BUDGET. Returns None when no configuration
    fits (dim >= ~16k): callers must fall back to the subspace-tiled
    pq_decode_mxu path, whose grid CAN tile the codebook (ADVICE r3: the
    grouped operand alone exceeds VMEM at large dim and the kernel cannot
    compile).
    """
    dim = s * dsub
    cands = [
        g for g in range(1, min(s, 8) + 1)
        if s % g == 0 and 512 * g * dim <= HILO_CB_VMEM_BUDGET
    ]
    if not cands:
        return None
    return 16, 16, max(cands)


def _hilo_group(s: int, dsub: int = 4) -> int:
    """Subspaces per grid group under the chosen _hilo_plan split; 0 when
    no VMEM-feasible configuration exists (see _hilo_plan)."""
    plan = _hilo_plan(s, dsub)
    return plan[2] if plan else 0


def codebook_hilo(centroids: jax.Array) -> jax.Array:
    """[S, K=256, dsub] f32 codebook -> grouped hi/lo stage-1 operand
    C1[g, (s,h), (l,s',j)] = cent[g*G+s, lo_w*h+l, j] * (s==s'), bf16,
    shape [ng, G*hi_w, lo_w*G*dsub] at the _hilo_plan split. Pair with
    pq_decode_mxu_hilo."""
    s, kc, dsub = centroids.shape
    if kc != 256:
        raise ValueError("codebook_hilo requires K == 256 (8-bit codes)")
    plan = _hilo_plan(s, dsub)
    if plan is None:
        raise ValueError(
            "codebook_hilo: dim too large for a VMEM-resident grouped "
            "codebook; use codebook_blockdiag/pq_decode_mxu"
        )
    hi_w, lo_w, grp = plan
    ng = s // grp
    cent_r = centroids.astype(jnp.bfloat16).reshape(ng, grp, hi_w, lo_w, dsub)
    eye = jnp.eye(grp, dtype=jnp.bfloat16)
    # stage-1 output layout is L-MAJOR (l, s', j) — see _make_hilo_kernel
    # [ng, s, h, l, t, j] -> flatten (s,h) / (l,t,j)
    c1 = jnp.einsum("gshlj,st->gshltj", cent_r, eye)
    return c1.reshape(ng, grp * hi_w, lo_w * grp * dsub)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pq_decode_mxu_hilo(
    codes: jax.Array,        # [N, S] integer codes (8-bit: K == 256)
    c1: jax.Array,           # [ng, G*hi_w, lo_w*G*dsub] from codebook_hilo
    tile: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Decode 8-bit PQ codes to bf16 vectors [N, dim] — hi/lo kernel.

    Same contract as pq_decode_mxu (bit-identical bf16 output) at a
    fraction of the device time (see _make_hilo_kernel). ``c1`` is
    data-dependent and must be built OUTSIDE the per-block score function
    (one codebook prep per search, not per scanned block); the iota-built
    expander/column matrices are data-independent and constant-fold at
    compile. The (hi_w, lo_w, grp) split is recovered from the operand
    shapes, so c1 from codebook_hilo is self-describing.
    """
    n, s = codes.shape
    ng, w1, w2 = c1.shape
    if s % ng:
        raise ValueError("c1 grouping does not match codes' subspace count")
    grp = s // ng
    hi_w = w1 // grp
    lo_w = 256 // hi_w
    dsub = w2 // (lo_w * grp)
    gd = grp * dsub
    dim = s * dsub
    if grp * hi_w != w1 or lo_w * grp * dsub != w2 or hi_w * lo_w != 256:
        raise ValueError("c1 shape is not a valid hi/lo grouped codebook")
    tile = min(tile, max(16, n))
    # per-step VMEM: one group's p1 f32 + rep/mask bf16 [tile, w2]
    # (~10 B/elt live at once) + the per-group outs list (ng*gd, doubled
    # for the final concat's stack copy) + a double-buffered output block
    # + codes + the WHOLE grouped codebook (resident across steps).
    # Calibrated against a measured TPU compile: s=240/ng=30/tile=1024
    # allocated 22.07 M scoped VMEM (r4), which the previous
    # w2*10+dim*2+s*4 model put at 12.1 M — the missing terms scale with
    # ng*gd (outs+concat) and dim (output buffering).
    while tile > 32 and (
        tile * (w2 * 10 + dim * 6 + s * 4 + ng * gd * 4)
        + ng * w1 * w2 * 2 > 14 * 2**20
    ):
        tile //= 2
    npad = -(-n // tile) * tile
    codes_u8 = jnp.pad(codes.astype(jnp.uint8), ((0, npad - n), (0, 0)))
    # hi spread/compare tables: rep_h[r, (s,h)] = code_hi[r, s]
    i0 = jax.lax.broadcasted_iota(jnp.int32, (grp, w1), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (grp, w1), 1)
    exp_h = (i0 == i1 // hi_w).astype(jnp.bfloat16)
    colh = (
        jax.lax.broadcasted_iota(jnp.int32, (1, w1), 1) % hi_w
    ).astype(jnp.float32)
    # lo remainder spread table at the L-MAJOR p1 layout (l, s, j):
    # column c -> subspace s = (c // dsub) % grp (repeats every gd lanes).
    # spread_w = largest gd*2^t <= 128 so it divides every select-tree
    # width above it (wider conditions are concats of identical tiles);
    # below it the condition is a slice. gd >= 128 degrades to a
    # half-width spread (correct, never hit at production shapes).
    if gd >= 128:
        spread_w = w2 // 2
    else:
        spread_w = gd
        while spread_w * 2 <= min(128, w2 // 2):
            spread_w *= 2
    j0 = jax.lax.broadcasted_iota(jnp.int32, (grp, spread_w), 0)
    j1 = jax.lax.broadcasted_iota(jnp.int32, (grp, spread_w), 1)
    exp_s = (j0 == (j1 // dsub) % grp).astype(jnp.bfloat16)
    out = pl.pallas_call(
        _make_hilo_kernel(grp, lo_w),
        out_shape=jax.ShapeDtypeStruct((npad, dim), jnp.bfloat16),
        grid=(npad // tile,),
        in_specs=[
            pl.BlockSpec((tile, s), lambda i: (i, 0)),
            pl.BlockSpec((ng, w1, w2), lambda i: (0, 0, 0)),
            pl.BlockSpec((grp, w1), lambda i: (0, 0)),
            pl.BlockSpec((1, w1), lambda i: (0, 0)),
            pl.BlockSpec((grp, spread_w), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, dim), lambda i: (i, 0)),
        interpret=interpret,
    )(codes_u8, c1, exp_h, colh, exp_s)
    return out[:n]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pq_decode_mxu(
    codes: jax.Array,        # [N, S] integer codes
    cb_flat: jax.Array,      # [S*K, dim] block-diagonal bf16 codebook
    tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Decode PQ codes to bf16 vectors [N, dim] with a Pallas MXU kernel.

    Large codebooks (e.g. 960d, S=240: block-diagonal [61440, 960] = 118 MB)
    cannot live in VMEM whole, so the grid also tiles the SUBSPACE axis into
    groups of G subspaces: group g's one-hot only touches its own
    [G*K, G*dsub] diagonal block. G is the LARGEST divisor of S with
    G*dsub <= 128 (output exactly one MXU lane tile — minimum padded
    decode FLOPs); the row tile shrinks if the per-step footprint would
    exceed VMEM.
    """
    n, s = codes.shape
    sk, dim = cb_flat.shape
    kc = sk // s
    dsub = dim // s
    if kc > 256:
        raise ValueError("pq_decode_mxu: codes must be 8-bit (K <= 256)")
    # decode FLOPs per row = S*K*roundup128(G*dsub): the MXU pads each
    # group's output to 128 lanes, so the cheapest G is the LARGEST divisor
    # of S with G*dsub <= 128 (output exactly one lane tile, minimal VMEM)
    cands = [g for g in range(1, s + 1) if s % g == 0 and g * dsub <= 128]
    grp = max(cands) if cands else 1
    tile = min(tile, max(16, n))
    gk = grp * kc
    gd = grp * dsub
    # per-step VMEM: one-hot bf16 + rep f32 (6 B per [tile, gk] element) +
    # the group's codebook block
    while tile > 32 and tile * gk * 6 + gk * gd * 2 > 15 * 2**20:
        tile //= 2
    ng = s // grp
    npad = -(-n // tile) * tile
    codes_i = jnp.pad(codes.astype(jnp.int32), ((0, npad - n), (0, 0)))
    # group-major 3-D layouts: Mosaic constrains only the LAST TWO block
    # dims (divisible by (8, 128) or equal to the array dims), so the group
    # axis leads and each block spans a full [tile, grp]/[tile, gd] slab
    codes_g = codes_i.reshape(npad, ng, grp).transpose(1, 0, 2)
    # group g's diagonal block of the block-diagonal codebook
    cbg = jnp.stack([
        jax.lax.slice(cb_flat, (g * gk, g * gd), ((g + 1) * gk, (g + 1) * gd))
        for g in range(ng)
    ])
    # expander spreads codes to their subspace's K columns on the MXU;
    # colc holds each flat column's centroid id for the equality test.
    # Built from iota compares (a scatter here would serialize on TPU and,
    # sitting inside the caller's jit, re-run on every query batch).
    rows = jax.lax.broadcasted_iota(jnp.int32, (grp, gk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (grp, gk), 1)
    exp = (cols // kc == rows).astype(jnp.bfloat16)
    colc = (
        jax.lax.broadcasted_iota(jnp.int32, (1, gk), 1) % kc
    ).astype(jnp.float32)
    out = pl.pallas_call(
        _pq_decode_kernel,
        out_shape=jax.ShapeDtypeStruct((ng, npad, gd), jnp.bfloat16),
        # group-major order: the codebook block stays VMEM-resident across
        # the inner row sweep
        grid=(ng, npad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, grp), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, gk, gd), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((grp, gk), lambda g, i: (0, 0)),
            pl.BlockSpec((1, gk), lambda g, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, gd), lambda g, i: (g, i, 0)),
        interpret=interpret,
    )(codes_g, cbg, exp, colc)
    return out.transpose(1, 0, 2).reshape(npad, dim)[:n]
