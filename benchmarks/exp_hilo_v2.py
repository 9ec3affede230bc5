"""Experiment: ADC decode kernel variants (VERDICT r3 #2).

The r3 profile (profile_hot.py PROF_TARGET=pq, Q=1024, 1M x 128d) showed
the flat_pq batch is decode-kernel-bound: 9.15 ms of the 12.2 ms device
time is pq_decode_mxu_hilo, 1.4 ms the scoring matmul, 0.9 ms the codes
pad+int32 convert. Inside the kernel, stage 2 (select lo via mask + 0/1
reduce matmul [T,512]@[512,32]) pays 4x MXU output-lane padding (32 of
128 lanes useful) — as many executed FLOPs as stage 1.

Variants measured here (all must be bit-identical to the baseline):
  A: current pq_decode_mxu_hilo (baseline)
  B: l-major stage-1 output layout (l, s, j) + VPU reduction over l via
     lane rolls (pltpu.roll); codes enter as uint8 (convert in-kernel)
  C: same as B but reduction via slice-halving adds (no pltpu.roll)

Timing discipline: one jitted lax.scan over >= 48 iterations with the
input varied per iter (codes ^ i), scalar fetch, best-of-2.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

import lantern_tpu  # noqa: F401, E402  (compile cache)
from lantern_tpu.ops.pallas_kernels import (  # noqa: E402
    _hilo_group,
    codebook_hilo,
    pq_decode_mxu_hilo,
)

N = int(os.environ.get("EXP_N", 1 << 20))
S, KC, DSUB = 32, 256, 4
DIM = S * DSUB
ITERS = int(os.environ.get("EXP_ITERS", 48))


def codebook_hilo_v2(centroids: jax.Array) -> jax.Array:
    """[S, 256, dsub] -> [ng, G*16, 16*G*dsub] with stage-1 output layout
    (l, s, j): column (l*G*dsub + s*dsub + j) of group g holds
    cent[g*G+s, 16h+l, j] for stage-1 row (s, h)."""
    s, kc, dsub = centroids.shape
    grp = _hilo_group(s, dsub)
    ng = s // grp
    cent_r = centroids.astype(jnp.bfloat16).reshape(ng, grp, 16, 16, dsub)
    eye = jnp.eye(grp, dtype=jnp.bfloat16)
    # [g, s, h, l, j] x [s, t] -> [g, s, h, l, t, j]
    c1 = jnp.einsum("gshlj,st->gshltj", cent_r, eye)
    return c1.reshape(ng, grp * 16, 16 * grp * dsub)


def _make_kernel(reduce_kind: str, interpret: bool):
    def kernel(codes_ref, c1_ref, exph_ref, colh_ref, expl_ref, coll_ref,
               out_ref):
        ng = c1_ref.shape[0]
        grp = c1_ref.shape[1] // 16
        w2 = c1_ref.shape[2]
        gd = w2 // 16
        c = codes_ref[:].astype(jnp.int32)
        outs = []
        for g in range(ng):
            cg = c[:, g * grp:(g + 1) * grp]
            chi = (cg // 16).astype(jnp.bfloat16)
            clo = (cg % 16).astype(jnp.bfloat16)
            rep_h = jnp.dot(chi, exph_ref[:],
                            preferred_element_type=jnp.float32)
            ohh = (rep_h == colh_ref[:]).astype(jnp.bfloat16)
            p1 = jnp.dot(ohh, c1_ref[g],
                         preferred_element_type=jnp.float32)  # [T, w2] (l,s,j)
            rep_l = jnp.dot(clo, expl_ref[:],
                            preferred_element_type=jnp.float32)
            acc = jnp.where(rep_l == coll_ref[:], p1, 0.0)
            if reduce_kind == "roll":
                shift = w2 // 2
                while shift >= gd:
                    if interpret:
                        acc = acc + jnp.roll(acc, -shift, axis=1)
                    else:
                        # left-rotate by shift == right-rotate by w2-shift
                        # (pltpu.roll requires a non-negative shift)
                        acc = acc + pltpu.roll(acc, w2 - shift, axis=1)
                    shift //= 2
                outs.append(acc[:, :gd].astype(out_ref.dtype))
            else:  # halving slices
                width = w2
                while width > gd:
                    half = width // 2
                    acc = acc[:, :half] + acc[:, half:width]
                    width = half
                outs.append(acc.astype(out_ref.dtype))
        out_ref[:] = outs[0] if ng == 1 else jnp.concatenate(outs, axis=1)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("tile", "interpret", "reduce_kind")
)
def pq_decode_hilo_v2(codes, c1, tile=1024, interpret=False,
                      reduce_kind="roll"):
    n, s = codes.shape
    ng, w1, w2 = c1.shape
    grp = w1 // 16
    dsub = w2 // (grp * 16)
    gd = grp * dsub
    dim = s * dsub
    tile = min(tile, max(16, n))
    while tile > 32 and (
        tile * (w2 * 10 + dim * 2 + s * 4) + ng * w1 * w2 * 2 > 14 * 2**20
    ):
        tile //= 2
    npad = -(-n // tile) * tile
    codes_u8 = jnp.pad(codes.astype(jnp.uint8), ((0, npad - n), (0, 0)))
    i0 = jax.lax.broadcasted_iota(jnp.int32, (grp, w1), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (grp, w1), 1)
    exp_h = (i0 == i1 // 16).astype(jnp.bfloat16)
    colh = (
        jax.lax.broadcasted_iota(jnp.int32, (1, w1), 1) % 16
    ).astype(jnp.float32)
    # lo tables at the (l, s, j) layout
    j0 = jax.lax.broadcasted_iota(jnp.int32, (grp, w2), 0)
    j1 = jax.lax.broadcasted_iota(jnp.int32, (grp, w2), 1)
    exp_l = (j0 == (j1 // dsub) % grp).astype(jnp.bfloat16)
    coll = (
        jax.lax.broadcasted_iota(jnp.int32, (1, w2), 1) // gd
    ).astype(jnp.float32)
    out = pl.pallas_call(
        _make_kernel(reduce_kind, interpret),
        out_shape=jax.ShapeDtypeStruct((npad, dim), jnp.bfloat16),
        grid=(npad // tile,),
        in_specs=[
            pl.BlockSpec((tile, s), lambda i: (i, 0)),
            pl.BlockSpec((ng, w1, w2), lambda i: (0, 0, 0)),
            pl.BlockSpec((grp, w1), lambda i: (0, 0)),
            pl.BlockSpec((1, w1), lambda i: (0, 0)),
            pl.BlockSpec((grp, w2), lambda i: (0, 0)),
            pl.BlockSpec((1, w2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, dim), lambda i: (i, 0)),
        interpret=interpret,
    )(codes_u8, c1, exp_h, colh, exp_l, coll)
    return out[:n]


def timed(fn, codes, iters=ITERS):
    @jax.jit
    def run(codes):
        def body(acc, i):
            dec = fn(codes ^ i.astype(codes.dtype))
            return acc + jnp.sum(dec[:, 0].astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(iters, dtype=jnp.int32))
        return acc

    _ = float(run(codes))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _ = float(run(codes))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    interp = jax.default_backend() == "cpu"
    key = jax.random.PRNGKey(0)
    codes = jax.random.randint(key, (N, S), 0, 256, jnp.uint8)
    cents = jax.random.normal(jax.random.PRNGKey(1), (S, KC, DSUB),
                              jnp.float32)
    c1a = codebook_hilo(cents)
    c1b = codebook_hilo_v2(cents)

    # exactness first (on a slice)
    ref = np.asarray(pq_decode_mxu_hilo(codes[:4096], c1a, interpret=interp))
    for kind in ("roll", "slice"):
        got = np.asarray(pq_decode_hilo_v2(codes[:4096], c1b,
                                           interpret=interp,
                                           reduce_kind=kind))
        ok = (got == ref).all()
        print(f"exactness v2/{kind}: {'OK' if ok else 'MISMATCH'}")
        if not ok:
            bad = np.nonzero(got != ref)
            print("first mismatches:", bad[0][:5], bad[1][:5])
            print(got[bad][:5], ref[bad][:5])

    if interp:
        print("cpu backend: skipping timing")
        return
    t_a = timed(lambda c: pq_decode_mxu_hilo(c, c1a), codes)
    print(f"A baseline hilo:      {t_a*1e3:8.2f} ms / {N} rows")
    for kind in ("roll", "slice"):
        t = timed(
            lambda c, k=kind: pq_decode_hilo_v2(c, c1b, reduce_kind=k), codes
        )
        print(f"B v2 ({kind:5s}):      {t*1e3:8.2f} ms / {N} rows")


if __name__ == "__main__":
    main()
