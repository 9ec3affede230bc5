"""Product quantization: codebook k-means training + encode/decode + ADC LUTs.

Reference parity:
- codebook training = per-subvector k-means (in-DB C version
  product_quantization.c:40-193: random init, assign, mean update, conv
  threshold 0.1, <=200 iters; out-of-DB Rust version codebook.rs:41-278:
  rayon per-subvector, tol 1e-1, <=20 iters, sharded BY SUBVECTOR on GCP).
  Here: one jitted Lloyd iteration vmapped over subspaces — the vmap IS the
  reference's per-subvector parallelism, on MXU instead of rayon threads.
- codebook shape [num_subvectors, num_centroids, dsub] — the reference's
  `real[][][]` SQL table `_lantern_internal.pq_<table>_<col>` (pqtable.c).
- search uses asymmetric distance: per-query LUT [S, K] of partial
  distances, candidate distance = sum over subspaces of LUT[s, code].
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from lantern_tpu.config import Metric


@dataclasses.dataclass(frozen=True)
class PQCodebook:
    """Trained codebook: centroids [S, K, dsub] float32.

    ``rotation`` (optional, OPQ): an orthogonal [dim, dim] matrix learned so
    the rotated data quantizes with lower error (Optimized Product
    Quantization: alternate k-means with an orthogonal Procrustes update).
    When set, codes/centroids live in the ROTATED space; encode applies R,
    decode applies R^T, and searches rotate the query once (distances are
    preserved exactly — R is an isometry). The reference trains plain
    per-subvector k-means only (product_quantization.c:40-192,
    codebook.rs:248-278); the rotation is a quality improvement over it at
    identical code bytes and search cost.
    """

    centroids: np.ndarray
    rotation: np.ndarray | None = None

    @property
    def num_subvectors(self) -> int:
        return self.centroids.shape[0]

    @property
    def num_centroids(self) -> int:
        return self.centroids.shape[1]

    @property
    def dsub(self) -> int:
        return self.centroids.shape[2]

    @property
    def dim(self) -> int:
        return self.num_subvectors * self.dsub


def _kmeans_one_subspace(x, init, iters):
    """Lloyd iterations for one subspace. x [n, d], init [k, d] -> [k, d]."""
    n = x.shape[0]
    k = init.shape[0]
    x_sq = jnp.sum(x * x, axis=1)

    def step(cent, _):
        # assign: argmin ||x - c||^2 = argmin -2 x.c + |c|^2
        dots = jnp.dot(x, cent.T, preferred_element_type=jnp.float32)
        c_sq = jnp.sum(cent * cent, axis=1)
        assign = jnp.argmin(c_sq[None, :] - 2.0 * dots, axis=1)  # [n]
        oh = jax.nn.one_hot(assign, k, dtype=jnp.float32)  # [n, k]
        counts = jnp.sum(oh, axis=0)  # [k]
        sums = jnp.dot(oh.T, x, preferred_element_type=jnp.float32)  # [k, d]
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        # empty clusters keep their previous centroid (reference keeps random
        # init point; equivalent stability-wise)
        new = jnp.where((counts > 0)[:, None], new, cent)
        return new, None

    cent, _ = jax.lax.scan(step, init, None, length=iters)
    del n, x_sq
    return cent


@functools.partial(jax.jit, static_argnames=("num_subvectors", "num_centroids", "iters"))
def _train_jit(data, seed, num_subvectors, num_centroids, iters):
    n, dim = data.shape
    dsub = dim // num_subvectors
    xs = data.reshape(n, num_subvectors, dsub).transpose(1, 0, 2)  # [S, n, dsub]
    key = jax.random.PRNGKey(seed)
    # random-sample init (product_quantization.c:51-70)
    idx = jax.random.choice(key, n, shape=(num_centroids,), replace=n < num_centroids)
    init = xs[:, idx, :]  # [S, k, dsub]
    return jax.vmap(_kmeans_one_subspace, in_axes=(0, 0, None))(xs, init, iters)


def _assign_decode(xr, cent):
    """Encode+decode in one shot: xr [n, dim] (rotated space) -> [n, dim].

    lax.scan over subspaces bounds the one-hot intermediate at [n, K]
    (a flat [n, S, K] would be GBs at training-set scale); the decode is a
    gather-free one-hot contraction on the MXU.
    """
    n, dim = xr.shape
    s, k, dsub = cent.shape
    xs = xr.reshape(n, s, dsub).transpose(1, 0, 2)  # [S, n, dsub]

    def one(carry, sc):
        x, c = sc  # [n, dsub], [K, dsub]
        c_sq = jnp.sum(c * c, axis=1)
        dots = jnp.dot(x, c.T, preferred_element_type=jnp.float32)
        oh = jax.nn.one_hot(jnp.argmin(c_sq[None] - 2.0 * dots, axis=1),
                            k, dtype=jnp.bfloat16)
        dec = jnp.dot(oh, c.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        return carry, dec  # [n, dsub]

    _, decs = jax.lax.scan(one, 0, (xs, cent))
    return decs.transpose(1, 0, 2).reshape(n, dim)


@functools.partial(
    jax.jit,
    static_argnames=("num_subvectors", "num_centroids", "iters", "opq_iters"),
)
def _train_opq_jit(data, seed, num_subvectors, num_centroids, iters, opq_iters):
    """OPQ: alternate per-subspace k-means with an orthogonal Procrustes
    update of the rotation (Ge et al., OPQ non-parametric solution):

        min_{R orthogonal, C} ||X R - decode(encode(X R; C); C)||_F^2

    Each outer step: (a) a few Lloyd iterations on X R warm-started from the
    previous centroids, (b) Y = decode(encode(X R)), (c) R <- U V^T from the
    SVD of X^T Y. All on-device; the SVD is [dim, dim] (tiny).
    """
    n, dim = data.shape
    dsub = dim // num_subvectors
    key = jax.random.PRNGKey(seed)
    idx = jax.random.choice(key, n, shape=(num_centroids,), replace=n < num_centroids)
    xs0 = data.reshape(n, num_subvectors, dsub).transpose(1, 0, 2)
    cent0 = xs0[:, idx, :]  # [S, K, dsub] — R starts at identity
    inner = 4  # Lloyd iterations per alternation

    def step(carry, _):
        rot, cent = carry
        xr = jnp.dot(data, rot, preferred_element_type=jnp.float32)
        xs = xr.reshape(n, num_subvectors, dsub).transpose(1, 0, 2)
        cent = jax.vmap(_kmeans_one_subspace, in_axes=(0, 0, None))(
            xs, cent, inner
        )
        y = _assign_decode(xr, cent)  # [n, dim] reconstruction (rotated space)
        mat = jnp.dot(data.T, y, preferred_element_type=jnp.float32)
        u, _, vt = jnp.linalg.svd(mat, full_matrices=False)
        return (jnp.dot(u, vt), cent), None

    rot0 = jnp.eye(dim, dtype=jnp.float32)
    (rot, cent), _ = jax.lax.scan(step, (rot0, cent0), None, length=opq_iters)
    # polish: full Lloyd pass at the final rotation
    xr = jnp.dot(data, rot, preferred_element_type=jnp.float32)
    xs = xr.reshape(n, num_subvectors, dsub).transpose(1, 0, 2)
    cent = jax.vmap(_kmeans_one_subspace, in_axes=(0, 0, None))(xs, cent, iters)
    return cent, rot


def train_codebook(
    data: np.ndarray,
    num_subvectors: int,
    num_centroids: int = 256,
    iters: int = 25,
    seed: int = 0,
    rotate: bool = False,
    opq_iters: int = 16,
) -> PQCodebook:
    """Train a PQ codebook with per-subspace k-means (vmapped on device).

    ``rotate=True`` learns an OPQ rotation jointly (see PQCodebook.rotation)
    — same code bytes and search cost, lower quantization error on data with
    correlated dimensions (clustered/real embeddings; isotropic gaussian
    data gains nothing by symmetry).
    """
    data = np.asarray(data, np.float32)
    n, dim = data.shape
    if dim % num_subvectors:
        raise ValueError(f"dim {dim} not divisible by num_subvectors {num_subvectors}")
    if num_centroids > 256:
        raise ValueError("codes are uint8; num_centroids must be <= 256")
    if rotate:
        cent, rot = _train_opq_jit(
            jnp.asarray(data), seed, num_subvectors, num_centroids, iters,
            opq_iters,
        )
        return PQCodebook(centroids=np.asarray(cent), rotation=np.asarray(rot))
    cent = _train_jit(jnp.asarray(data), seed, num_subvectors, num_centroids, iters)
    return PQCodebook(centroids=np.asarray(cent))


@functools.partial(jax.jit, static_argnames=("want_xty",))
def _chunk_stats(x, mask, cent, rot, want_xty: bool):
    """One streamed Lloyd pass step over a row chunk.

    x [B, dim] f32 (pad rows arbitrary), mask [B] f32 (0 = pad),
    cent [S, K, dsub], rot [dim, dim] or None ->
    (sums [S, K, dsub], counts [S, K], xty [dim, dim] or 0).
    lax.scan over subspaces bounds the one-hot at [B, K] (the streaming
    analog of _assign_decode); all contractions ride the MXU.
    """
    n, dim = x.shape
    s, k, dsub = cent.shape
    xr = x if rot is None else jnp.dot(x, rot, preferred_element_type=jnp.float32)
    xs = xr.reshape(n, s, dsub).transpose(1, 0, 2)  # [S, B, dsub]

    def one(carry, sc):
        xsub, c = sc  # [B, dsub], [K, dsub]
        c_sq = jnp.sum(c * c, axis=1)
        dots = jnp.dot(xsub, c.T, preferred_element_type=jnp.float32)
        assign = jnp.argmin(c_sq[None] - 2.0 * dots, axis=1)
        oh = jax.nn.one_hot(assign, k, dtype=jnp.float32) * mask[:, None]
        cnt = jnp.sum(oh, axis=0)                     # [K]
        sm = jnp.dot(oh.T, xsub, preferred_element_type=jnp.float32)
        dec = jnp.dot(
            jax.nn.one_hot(assign, k, dtype=jnp.bfloat16),
            c.astype(jnp.bfloat16), preferred_element_type=jnp.float32,
        )                                             # [B, dsub]
        return carry, (sm, cnt, dec)

    _, (sums, counts, decs) = jax.lax.scan(one, 0, (xs, cent))
    if want_xty:
        y = decs.transpose(1, 0, 2).reshape(n, dim)   # rotated-space recon
        xty = jnp.dot(
            (x * mask[:, None]).T, y, preferred_element_type=jnp.float32
        )
    else:
        xty = jnp.zeros((), jnp.float32)
    return sums, counts, xty


def train_codebook_chunked(
    chunks,
    num_subvectors: int,
    num_centroids: int = 256,
    iters: int = 8,
    seed: int = 0,
    rotate: bool = False,
    resume_path: str | None = None,
    chunk_rows: int = 65536,
) -> PQCodebook:
    """Streamed/resumable PQ training: exact Lloyd iterations over row
    chunks, never holding the dataset in memory.

    ``chunks`` is re-iterable row storage: a ``.fvecs``/``.fvecs.gz`` path
    (streamed via io.dotvecs.iter_fvecs), a ``.npy`` path (memory-mapped),
    or a zero-arg callable returning an iterator of [B, dim] float32
    blocks (one fresh iterator per pass).

    Each pass accumulates per-subspace assignment sums/counts (and, with
    ``rotate=True``, the X^T Y cross matrix for the orthogonal Procrustes
    rotation update) chunk by chunk in one jitted step per chunk; the
    centroid/rotation update happens at pass end, so the math is EXACTLY
    in-RAM Lloyd/OPQ — not an approximation — at O(chunk) memory.

    ``resume_path``: after every pass the full training state is written
    atomically (tmp + rename). Re-running with the same arguments resumes
    from the last completed pass and produces bit-identical results — the
    analog of the reference's resumable PQ task sharding
    (codebook.rs:168-278, --subvector-id / skip flags in pq/cli.rs:83-137;
    here the subvector axis is vmapped on one device, so the resume unit
    is the data pass instead).
    """
    import os

    if num_centroids > 256:
        raise ValueError("codes are uint8; num_centroids must be <= 256")
    factory = _chunk_factory(chunks, chunk_rows)

    start_pass = 0
    cent = rot = None
    if resume_path and os.path.exists(resume_path):
        with np.load(resume_path, allow_pickle=False) as st:
            if int(st["seed"]) != seed or int(st["num_centroids"]) != num_centroids \
                    or int(st["num_subvectors"]) != num_subvectors:
                raise ValueError(
                    "resume state does not match the training arguments"
                )
            cent = st["centroids"].copy()
            rot = st["rotation"].copy() if bool(st["has_rotation"]) else None
            start_pass = int(st["next_pass"])

    first = None
    if cent is None:
        # init: random rows from the first chunk(s) (the reference's random
        # sample init, product_quantization.c:51-70)
        rows = []
        got = 0
        for blk in factory():
            rows.append(np.asarray(blk, np.float32))
            got += len(blk)
            if got >= max(num_centroids, 4096):
                break
        if not rows:
            raise ValueError("empty training stream")
        first = np.concatenate(rows)[: max(num_centroids, 4096)]
        n0, dim = first.shape
        if dim % num_subvectors:
            raise ValueError(
                f"dim {dim} not divisible by num_subvectors {num_subvectors}"
            )
        dsub = dim // num_subvectors
        rng = np.random.default_rng(seed)
        idx = rng.choice(n0, num_centroids, replace=n0 < num_centroids)
        cent = (
            first[idx].reshape(num_centroids, num_subvectors, dsub)
            .transpose(1, 0, 2).copy()
        )
        rot = np.eye(dim, dtype=np.float32) if rotate else None

    dim = cent.shape[0] * cent.shape[2]
    for p in range(start_pass, iters):
        sums = np.zeros(cent.shape, np.float32)
        counts = np.zeros(cent.shape[:2], np.float32)
        xty = np.zeros((dim, dim), np.float32)
        cent_dev = jnp.asarray(cent)
        rot_dev = jnp.asarray(rot) if rot is not None else None
        for blk in factory():
            blk = np.ascontiguousarray(blk, np.float32)
            b = len(blk)
            bpad = max(8, 1 << int(np.ceil(np.log2(b))))  # bound jit shapes
            if bpad != b:
                blk = np.concatenate(
                    [blk, np.zeros((bpad - b, dim), np.float32)]
                )
            mask = np.zeros(bpad, np.float32)
            mask[:b] = 1.0
            sm, cnt, xy = _chunk_stats(
                jnp.asarray(blk), jnp.asarray(mask), cent_dev, rot_dev,
                rotate,
            )
            sums += np.asarray(sm)
            counts += np.asarray(cnt)
            if rotate:
                xty += np.asarray(xy)
        new = sums / np.maximum(counts, 1.0)[:, :, None]
        cent = np.where((counts > 0)[:, :, None], new, cent).astype(np.float32)
        if rotate:
            u, _, vt = np.linalg.svd(xty, full_matrices=False)
            rot = (u @ vt).astype(np.float32)
        if resume_path:
            tmp = resume_path + ".tmp"
            np.savez(
                tmp if not tmp.endswith(".npz") else tmp,
                centroids=cent,
                rotation=rot if rot is not None else np.zeros(0, np.float32),
                has_rotation=rot is not None,
                next_pass=p + 1,
                seed=seed,
                num_centroids=num_centroids,
                num_subvectors=num_subvectors,
            )
            # np.savez appends .npz when missing — normalize before rename
            src = tmp if os.path.exists(tmp) else tmp + ".npz"
            os.replace(src, resume_path)
    return PQCodebook(centroids=cent, rotation=rot)


def _chunk_factory(chunks, chunk_rows: int):
    """Normalize the chunk source to a zero-arg re-iterable factory."""
    if callable(chunks):
        return chunks
    path = str(chunks)
    if path.endswith((".fvecs", ".fvecs.gz")):
        from lantern_tpu.io.dotvecs import iter_fvecs

        return lambda: iter_fvecs(path, chunk_rows)
    if path.endswith(".npy"):
        def npy_iter():
            mm = np.load(path, mmap_mode="r")
            for i in range(0, len(mm), chunk_rows):
                yield np.asarray(mm[i : i + chunk_rows], np.float32)

        return npy_iter
    raise ValueError(
        "chunks must be a callable, an .fvecs(.gz) path, or an .npy path"
    )


@functools.partial(jax.jit, static_argnames=())
def _encode_jit(data, centroids, rotation=None):
    n, dim = data.shape
    s, k, dsub = centroids.shape
    if rotation is not None:
        data = jnp.dot(data, rotation, preferred_element_type=jnp.float32)
    xs = data.reshape(n, s, dsub)
    c_sq = jnp.sum(centroids * centroids, axis=2)  # [S, K]
    dots = jnp.einsum("nsd,skd->nsk", xs, centroids, preferred_element_type=jnp.float32)
    return jnp.argmin(c_sq[None, :, :] - 2.0 * dots, axis=2).astype(jnp.uint8)


def pq_encode(data, codebook: PQCodebook) -> np.ndarray:
    """Vectors [n, dim] -> codes [n, S] uint8 (the pqvec payload).

    With an OPQ rotation the data is rotated first (codes live in the
    rotated space)."""
    rot = (jnp.asarray(codebook.rotation, jnp.float32)
           if codebook.rotation is not None else None)
    return np.asarray(_encode_jit(jnp.asarray(data, jnp.float32),
                                  jnp.asarray(codebook.centroids), rot))


def pq_decode(codes, codebook: PQCodebook) -> np.ndarray:
    """Codes [n, S] -> reconstructed vectors [n, dim] (dequantize_vector).

    Reconstruction returns to the ORIGINAL space (rotation undone)."""
    codes = np.asarray(codes)
    cent = codebook.centroids  # [S, K, dsub]
    n, s = codes.shape
    out = cent[np.arange(s)[None, :], codes]  # [n, S, dsub]
    out = out.reshape(n, s * cent.shape[2]).astype(np.float32)
    if codebook.rotation is not None:
        out = out @ np.asarray(codebook.rotation, np.float32).T
    return out


def adc_lut(queries: jax.Array, centroids: jax.Array, metric: Metric) -> jax.Array:
    """Per-query ADC lookup tables.

    queries [Q, dim], centroids [S, K, dsub] ->
      l2sq: LUT[q,s,k] = ||q_s - c_sk||^2     (sum over s = full distance)
      cos:  LUT[q,s,k] = q_s · c_sk           (dot; combine with norms)
    """
    qn, dim = queries.shape
    s, k, dsub = centroids.shape
    qs = queries.astype(jnp.float32).reshape(qn, s, dsub)
    dots = jnp.einsum("qsd,skd->qsk", qs, centroids, preferred_element_type=jnp.float32)
    if metric == Metric.COS:
        return dots
    c_sq = jnp.sum(centroids * centroids, axis=2)  # [S, K]
    q_sq = jnp.sum(qs * qs, axis=2)  # [Q, S]
    return q_sq[:, :, None] - 2.0 * dots + c_sq[None, :, :]


def adc_distances(lut: jax.Array, codes: jax.Array) -> jax.Array:
    """Sum LUT entries for candidate codes.

    lut [Q, S, K], codes [Q, C, S] -> partial-distance sums [Q, C] f32.

    TPU-first formulation: instead of Q*C*S scalar LUT gathers (terrible HBM
    granularity), expand codes to one-hot and contract on the MXU:
        dist[q, c] = sum_{s,k} onehot(codes[q,c,s])[k] * lut[q,s,k]
    The K-fold FLOP blowup is free next to the gather it replaces (the
    Quick-ADC insight mapped to a systolic array).
    """
    q, s, k = lut.shape
    c = codes.shape[1]
    if q * c * s * k <= (1 << 27):
        # small problems: one fused contraction (one-hot [Q, C, S, K])
        oh = jax.nn.one_hot(codes, k, dtype=jnp.bfloat16)
        return jax.lax.dot_general(
            oh.reshape(q, c, s * k),
            lut.reshape(q, s * k),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    # big Q*C: the full one-hot would materialize Q*C*S*K elements (1 GB at
    # Q=1024, C=64, S=32, K=256) — scan over subspaces instead, bounding the
    # intermediate at [Q, C, K] per step with identical MXU FLOPs
    return _adc_distances_scan(lut, codes)


def _adc_distances_scan(lut: jax.Array, codes: jax.Array) -> jax.Array:
    """Memory-bounded ADC: lax.scan over subspaces ([Q, C, K] per step)."""
    q, s, k = lut.shape
    c = codes.shape[1]
    codes_s = jnp.transpose(codes, (2, 0, 1))  # [S, Q, C]
    lut_s = jnp.transpose(lut, (1, 0, 2))      # [S, Q, K]

    def body(acc, xs):
        cd, lt = xs
        oh = jax.nn.one_hot(cd, k, dtype=jnp.bfloat16)  # [Q, C, K]
        part = jax.lax.dot_general(
            oh, lt[:, :, None],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, :, 0]
        return acc + part, None

    acc, _ = jax.lax.scan(body, jnp.zeros((q, c), jnp.float32),
                          (codes_s, lut_s))
    return acc


# ---- pqvec codecs (C13: pqvec SQL type + casts, pqvec.c:16-60) ----------
# The reference's `pqvec` is a varlena of u8 codes with casts to/from
# integer[]. Here: a tiny length-prefixed byte codec plus array casts, so
# codes round-trip through storage/wire layers unambiguously.

_PQVEC_MAGIC = 0x7051  # 'Pq'


def array_to_pqvec(codes) -> bytes:
    """[S] (or [n, S]) uint8 codes -> packed pqvec bytes (one vector only)."""
    import struct as _struct

    codes = np.asarray(codes, np.uint8)
    if codes.ndim != 1:
        raise ValueError("array_to_pqvec packs one vector; got shape "
                         f"{codes.shape}")
    return _struct.pack("<HH", _PQVEC_MAGIC, codes.shape[0]) + codes.tobytes()


def pqvec_to_array(raw: bytes) -> np.ndarray:
    """Packed pqvec bytes -> [S] uint8 codes."""
    import struct as _struct

    magic, s = _struct.unpack("<HH", raw[:4])
    if magic != _PQVEC_MAGIC:
        raise ValueError(f"not a pqvec value (magic {magic:#x})")
    codes = np.frombuffer(raw[4 : 4 + s], np.uint8)
    if len(codes) != s:
        raise ValueError("pqvec value truncated")
    return codes.copy()


def quantize_vector(vec, codebook: PQCodebook) -> bytes:
    """SQL quantize_vector analog: one vector -> pqvec bytes."""
    return array_to_pqvec(pq_encode(np.asarray(vec, np.float32)[None], codebook)[0])


def dequantize_vector(raw: bytes, codebook: PQCodebook) -> np.ndarray:
    """SQL dequantize_vector analog: pqvec bytes -> reconstructed vector."""
    return pq_decode(pqvec_to_array(raw)[None], codebook)[0]
