#!/usr/bin/env python
"""Prototype: streaming Pallas run-length decode vs the XLA diff-scatter.

The binning expansion materializes per-run-constant int32 columns over the
instance domain by scatter-adding differences at run starts + cumsum
(ops/binning._expand_runs). The XLA scatter is serial per ROW (~44 ns for
F>=2: 4.4 ms at 100k gaussians, ~220 ms at 5M). This kernel streams runs
once on the single v5e core: per output block, scatter diffs into a VMEM
(L, 128) buffer with sublane-dynamic row adds (serial per RUN, a few
cycles), then one vectorized in-VMEM cumsum + a carry rides across blocks.

Measures: correctness vs _expand_runs, and chained ms for both at
800^2-like (100k runs -> 640k slots) and garden-like (5M -> 8.4M) shapes.
"""

import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/ngs-jax-cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.chain_bench import chain
from neuralgaussiansplatting_tpu.ops.binning import _expand_runs

L = 4096          # output slots per block
RCH = 2048        # run rows per DMA chunk


def _decode_kernel(r0_ref, starts_ref, diffs_ref, out_ref,
                   buf, rchunk_s, rchunk_d, sem_s, sem_d, carry_ref,
                   *, f, domain, n):
    b = pl.program_id(0)
    base = b * L

    @pl.when(b == 0)
    def _():
        carry_ref[0:1] = jnp.zeros((1, 128), jnp.int32)

    r0 = r0_ref[b]
    r1 = r0_ref[b + 1]
    # DMA slices need aligned offsets: round the window down to a chunk
    # multiple; leading rows (start < base) land in padding rows like the
    # trailing ones.
    rbase = pl.multiple_of((r0 // RCH) * RCH, RCH)
    buf[:] = jnp.zeros((L + 8, 128), jnp.int32)

    nch = pl.cdiv(r1 - rbase, RCH)

    def dma_s(c):
        slot = jax.lax.rem(c, 2)
        return pltpu.make_async_copy(
            starts_ref.at[:, pl.ds(rbase + c * RCH, RCH)],
            rchunk_s.at[slot], sem_s.at[slot])

    def dma_d(c):
        slot = jax.lax.rem(c, 2)
        return pltpu.make_async_copy(
            diffs_ref.at[pl.ds(rbase + c * RCH, RCH)],
            rchunk_d.at[slot], sem_d.at[slot])

    @pl.when(nch > 0)
    def _():
        dma_s(jnp.int32(0)).start()
        dma_d(jnp.int32(0)).start()

    def chunk_body(c, _):
        @pl.when(c + 1 < nch)
        def _():
            dma_s(c + 1).start()
            dma_d(c + 1).start()
        dma_s(c).wait()
        dma_d(c).wait()
        slot = jax.lax.rem(c, 2)
        lim = jnp.minimum(r1 - rbase - c * RCH, RCH)

        def run_body(i, _):
            rel = rchunk_s[slot, 0, i] - base
            rel = jnp.where((rel >= 0) & (rel < L), rel, L)  # spill->padding
            row = rchunk_d[slot, pl.ds(i, 1), :]     # (1, 128)
            buf[pl.ds(rel, 1), :] += row
            return 0

        jax.lax.fori_loop(0, lim, run_body, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, nch, chunk_body, 0)

    # vectorized inclusive cumsum down the L rows (Hillis-Steele doubling
    # via sublane roll; Pallas has no cumsum primitive) + carry in
    x = buf[0:L, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, 128), 0)
    k = 1
    while k < L:
        sh = pltpu.roll(x, k, 0)
        x = x + jnp.where(rows >= k, sh, 0)
        k *= 2
    x = x + carry_ref[0:1]
    carry_ref[0:1] = x[L - 1:L, :]
    out_ref[0] = x


def decode_runs(starts, diffs, domain, f):
    """starts (N,) sorted int32; diffs (N, 128) int32 (cols beyond f zero).
    Returns (domain, 128) decoded rows."""
    n = starts.shape[0]
    nb = domain // L
    bounds = jnp.arange(nb + 1, dtype=jnp.int32) * L
    r0 = jnp.searchsorted(starts, bounds, side="left").astype(jnp.int32)
    # pad rows so full-RCH DMA slices never run off the end
    pad = RCH
    npad_rows = -(-(n + pad) // RCH) * RCH
    starts_p = jnp.concatenate(
        [starts, jnp.full((npad_rows - n,), domain + L, jnp.int32)]
    ).reshape(1, npad_rows)
    diffs_p = jnp.concatenate([diffs, jnp.zeros((pad, 128), jnp.int32)])
    kernel = functools.partial(_decode_kernel, f=f, domain=domain, n=n)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, L, 128), lambda b, s: (b, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((L + 8, 128), jnp.int32),
                pltpu.SMEM((2, 1, RCH), jnp.int32),
                pltpu.VMEM((2, RCH, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((1, 128), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nb, L, 128), jnp.int32),
        interpret=jax.default_backend() == "cpu",
    )(r0, starts_p, diffs_p)
    return out.reshape(nb * L, 128)


def make_case(n, domain, f, seed=0):
    rng = np.random.default_rng(seed)
    lens = rng.poisson(max(domain // n - 1, 1) - 0.5, n).astype(np.int64)
    scale = (domain * 0.95) / max(lens.sum(), 1)
    lens = (lens * scale).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int32)
    fields = rng.integers(-2**30, 2**30, (n, f), dtype=np.int32)
    return jnp.asarray(starts), jnp.asarray(fields)


def main():
    for name, n, domain in [("800p", 100_000, 640 * 1024),
                            ("garden", 5_000_000, 1 << 23)]:
        f = 6
        starts, fields = make_case(n, domain, f)
        diffs_f = jnp.concatenate(
            [fields[:1], fields[1:] - fields[:-1]], axis=0)
        diffs = jnp.zeros((n, 128), jnp.int32).at[:, :f].set(diffs_f)

        ref = _expand_runs(fields, starts, domain)
        got = decode_runs(starts, diffs, domain, f)[:, :f]
        ok = bool(jnp.all(got == ref))
        print(f"[{name}] correct={ok}")
        if not ok:
            bad = int(jnp.argmax(jnp.any(got != ref, axis=1)))
            print("  first bad slot", bad, got[bad], ref[bad])
            continue

        def mk_xla():
            def body(carry, s):
                st, acc = carry
                ex = _expand_runs(fields + acc.astype(jnp.int32) % 2, st,
                                  domain)
                return ((st, acc + jnp.sum(ex[:, 0]).astype(jnp.float32)
                         * 1e-30), s)
            return lambda c, s: body(c, s)[0]

        def mk_pal():
            def body(carry, s):
                st, acc = carry
                d2 = diffs.at[0, 0].add(acc.astype(jnp.int32) % 2)
                ex = decode_runs(st, d2, domain, f)
                return (st, acc + jnp.sum(ex[:, 0].astype(jnp.float32))
                        * 1e-30)
            return body

        t_x = chain(mk_xla, ((starts, jnp.zeros(())), ), iters=4, reps=2) \
            if False else chain(mk_xla, (starts, jnp.zeros(())), iters=4,
                                reps=2)
        t_p = chain(mk_pal, (starts, jnp.zeros(())), iters=4, reps=2)
        print(f"  xla expand {t_x:8.2f} ms | pallas decode {t_p:8.2f} ms")


if __name__ == "__main__":
    main()
