"""Experiment: ADC decode kernel v3 — select-tree lo reduce (VERDICT r3 #2).

The r4 profile put the 1M flat_pq batch at 9.0 ms device = decode 6.6 +
scoring 1.4 + x_sq/copies 0.9. Inside the decode kernel the lo-spread
matmul rep_l = [T, grp] @ [grp, w2=512] pads its contraction dim 8 -> 128
on the MXU — as many executed FLOPs as stage 1 itself (~2.7 ms/1M).

Variants (exactness-checked against the production kernel):
  A:  production pq_decode_mxu_hilo (baseline; mask + slice-halving adds)
  C:  select-tree lo reduce — the one-hot mask+add over [T, w2] becomes
      log2(lo_w) SELECTS driven by a remainder operand spread only to
      w2/2 columns (matmul spread: [T, grp] @ [grp, w2/2], half the
      padded FLOPs of rep_l; the remainder update keeps all column
      copies consistent so one spread serves every level)
  Cb: same but the spread is a broadcast+reshape (no matmul) — relies on
      Mosaic lane relayout being cheaper than the padded dot
  Cx: C + in-kernel x_sq second output ([T, 8] f32, col 0) — removes the
      separate XLA square-reduce pass over the decoded block (0.31 ms HBM
      read + kernel overhead)
  E:  32/8 hi/lo split (grp=4, ng=8) with the select tree — stage 1 halves
      to [T,128]@[128,128] x 8; r3 measured 32/8 SLOWER with the mask+add
      reduce (VPU-bound); the select tree shifts the balance

Timing: one jitted lax.scan >= 48 iters, input varied per iter (codes ^ i),
scalar fetch, best-of-2 (CLAUDE.md measurement discipline).
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

import lantern_tpu  # noqa: F401, E402  (compile cache)
from lantern_tpu.ops.pallas_kernels import (  # noqa: E402
    codebook_hilo,
    pq_decode_mxu_hilo,
)

N = int(os.environ.get("EXP_N", 1 << 20))
S, KC, DSUB = 32, 256, 4
DIM = S * DSUB
ITERS = int(os.environ.get("EXP_ITERS", 48))


def codebook_hilo_gen(centroids, hi_w, lo_w, grp):
    """[S, 256, dsub] -> [ng, grp*hi_w, lo_w*grp*dsub], stage-1 output
    layout (l, s, j) — generalized over the (hi_w, lo_w, grp) split."""
    s, kc, dsub = centroids.shape
    assert hi_w * lo_w == kc and s % grp == 0
    ng = s // grp
    cent_r = centroids.astype(jnp.bfloat16).reshape(ng, grp, hi_w, lo_w, dsub)
    eye = jnp.eye(grp, dtype=jnp.bfloat16)
    c1 = jnp.einsum("gshlj,st->gshltj", cent_r, eye)
    return c1.reshape(ng, grp * hi_w, lo_w * grp * dsub)


def _make_kernel_v3(grp, lo_w, spread, want_xsq):
    def kernel(codes_ref, c1_ref, exph_ref, colh_ref, exps_ref, *out_refs):
        out_ref = out_refs[0]
        ng = c1_ref.shape[0]
        w1 = c1_ref.shape[1]
        w2 = c1_ref.shape[2]
        hi_w = w1 // grp
        gd = w2 // lo_w
        dsub = gd // grp
        half0 = w2 // 2
        c = codes_ref[:].astype(jnp.int32)
        outs = []
        for g in range(ng):
            cg = c[:, g * grp:(g + 1) * grp]
            chi = (cg // lo_w).astype(jnp.bfloat16)
            clo = (cg % lo_w).astype(jnp.float32)       # [T, grp] f32
            rep_h = jnp.dot(chi, exph_ref[:],
                            preferred_element_type=jnp.float32)
            ohh = (rep_h == colh_ref[:]).astype(jnp.bfloat16)
            p1 = jnp.dot(ohh, c1_ref[g],
                         preferred_element_type=jnp.float32)  # [T, w2] (l,s,j)
            # remainder operand at HALF width: col c < w2/2 has
            # s(c) = (c // dsub) % grp; copies repeat every gd columns,
            # so one spread + a full-width remainder update serves every
            # select level.
            if spread == "dot":
                rem = jnp.dot(clo.astype(jnp.bfloat16), exps_ref[:],
                              preferred_element_type=jnp.float32)
            elif spread == "dot128":
                # spread only to ONE 128-lane tile; wider conds are concats
                # of identical full-lane tiles (layout-friendly copies)
                rem = jnp.dot(clo.astype(jnp.bfloat16), exps_ref[:],
                              preferred_element_type=jnp.float32)  # [T,128]
            else:  # broadcast+reshape relayout
                t_rows = clo.shape[0]
                rem = jnp.broadcast_to(
                    clo[:, None, :, None],
                    (t_rows, half0 // gd, grp, dsub),
                ).reshape(t_rows, half0)
            acc = p1
            width = w2
            while width > gd:
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
            outs.append(acc.astype(out_ref.dtype))
        dec = outs[0] if ng == 1 else jnp.concatenate(outs, axis=1)
        out_ref[:] = dec
        if want_xsq:
            xf = dec.astype(jnp.float32)
            xsq = jnp.sum(xf * xf, axis=1, keepdims=True)   # [T, 1]
            out_refs[1][:] = jnp.broadcast_to(xsq, (xsq.shape[0], 8))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("lo_w", "grp", "tile", "interpret", "spread", "xsq"),
)
def pq_decode_hilo_v3(codes, c1, lo_w=16, grp=8, tile=2048, interpret=False,
                      spread="dot", xsq=False):
    n, s = codes.shape
    ng, w1, w2 = c1.shape
    dsub = w2 // (lo_w * grp)
    gd = grp * dsub
    dim = s * dsub
    tile = min(tile, max(16, n))
    while tile > 32 and (
        tile * (w2 * 10 + dim * 6 + s * 4 + ng * gd * 4)
        + ng * w1 * w2 * 2 > 14 * 2**20
    ):
        tile //= 2
    npad = -(-n // tile) * tile
    codes_u8 = jnp.pad(codes.astype(jnp.uint8), ((0, npad - n), (0, 0)))
    hi_w = w1 // grp
    i0 = jax.lax.broadcasted_iota(jnp.int32, (grp, w1), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (grp, w1), 1)
    exp_h = (i0 == i1 // hi_w).astype(jnp.bfloat16)
    colh = (
        jax.lax.broadcasted_iota(jnp.int32, (1, w1), 1) % hi_w
    ).astype(jnp.float32)
    half0 = w2 // 2
    spread_w = min(128, half0) if spread == "dot128" else half0
    j0 = jax.lax.broadcasted_iota(jnp.int32, (grp, spread_w), 0)
    j1 = jax.lax.broadcasted_iota(jnp.int32, (grp, spread_w), 1)
    exp_s = (j0 == (j1 // dsub) % grp).astype(jnp.bfloat16)
    out_shapes = [jax.ShapeDtypeStruct((npad, dim), jnp.bfloat16)]
    out_specs = [pl.BlockSpec((tile, dim), lambda i: (i, 0))]
    if xsq:
        out_shapes.append(jax.ShapeDtypeStruct((npad, 8), jnp.float32))
        out_specs.append(pl.BlockSpec((tile, 8), lambda i: (i, 0)))
    out = pl.pallas_call(
        _make_kernel_v3(grp, lo_w, spread, xsq),
        out_shape=out_shapes,
        grid=(npad // tile,),
        in_specs=[
            pl.BlockSpec((tile, s), lambda i: (i, 0)),
            pl.BlockSpec((ng, w1, w2), lambda i: (0, 0, 0)),
            pl.BlockSpec((grp, w1), lambda i: (0, 0)),
            pl.BlockSpec((1, w1), lambda i: (0, 0)),
            pl.BlockSpec((grp, spread_w), lambda i: (0, 0)),
        ],
        out_specs=out_specs,
        interpret=interpret,
    )(codes_u8, c1, exp_h, colh, exp_s)
    if xsq:
        return out[0][:n], out[1][:n, 0]
    return out[0][:n]


def timed(fn, codes, iters=ITERS):
    @jax.jit
    def run(codes):
        def body(acc, i):
            dec = fn(codes ^ i.astype(codes.dtype))
            if isinstance(dec, tuple):
                extra = jnp.sum(dec[1])
                dec = dec[0]
            else:
                extra = jnp.float32(0)
            return acc + jnp.sum(dec[:, 0].astype(jnp.float32)) + extra, None
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
    c1_16 = codebook_hilo_gen(cents, 16, 16, 8)
    c1_32 = codebook_hilo_gen(cents, 32, 8, 4)

    ref = np.asarray(pq_decode_mxu_hilo(codes[:4096], c1a, interpret=interp))
    variants = {
        "C  (dot spread)": dict(c1=c1_16, lo_w=16, grp=8, spread="dot"),
        "C2 (dot128 spread)": dict(c1=c1_16, lo_w=16, grp=8, spread="dot128"),
    }
    if os.environ.get("EXP_ALL") == "1":
        variants.update({
            "Cb (bcast spread)": dict(c1=c1_16, lo_w=16, grp=8,
                                      spread="bcast"),
            "Cx (dot + xsq)": dict(c1=c1_16, lo_w=16, grp=8, spread="dot",
                                   xsq=True),
            "E  (32/8 dot)": dict(c1=c1_32, lo_w=8, grp=4, spread="dot"),
            "Eb (32/8 bcast)": dict(c1=c1_32, lo_w=8, grp=4, spread="bcast"),
        })
    ok_variants = {}
    for name, kw in variants.items():
        kw = dict(kw)
        c1 = kw.pop("c1")
        try:
            got = pq_decode_hilo_v3(codes[:4096], c1, interpret=interp, **kw)
        except Exception as e:  # noqa: BLE001
            print(f"exactness {name}: COMPILE FAIL — {str(e)[:200]}")
            continue
        xs = None
        if isinstance(got, tuple):
            got, xs = np.asarray(got[0]), np.asarray(got[1])
        else:
            got = np.asarray(got)
        ok = (got == ref).all()
        if xs is not None:
            rf = ref.astype(np.float32)
            ok = ok and np.allclose(xs, (rf * rf).sum(1), rtol=1e-6)
        print(f"exactness {name}: {'OK' if ok else 'MISMATCH'}")
        if ok:
            ok_variants[name] = (c1, kw)

    if interp:
        print("cpu backend: skipping timing")
        return
    t_a = timed(lambda c: pq_decode_mxu_hilo(c, c1a), codes)
    print(f"A production hilo:   {t_a*1e3:8.2f} ms / {N} rows")
    for name, (c1, kw) in ok_variants.items():
        t = timed(lambda c, c1=c1, kw=kw: pq_decode_hilo_v3(c, c1, **kw),
                  codes)
        print(f"{name:20s} {t*1e3:8.2f} ms / {N} rows")


if __name__ == "__main__":
    main()
