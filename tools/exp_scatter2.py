#!/usr/bin/env python
"""Scatter-cost bisection for the run-length expansion's diff scatter.

buf(capacity, F).at[starts].add(diffs): measures column-count scaling and the
unique_indices / promise_in_bounds lowering paths (duplicates removed by
pre-combining equal-start groups, which the telescoping tolerates exactly).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/ngs-jax-cache")

import jax
import jax.numpy as jnp
import numpy as np

from tools.chain_bench import chain

N = 100_000
CAP = 1216 * 1024


def main():
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 23, size=N)
    counts = np.minimum(counts, 40).astype(np.int32)
    starts_np = (np.cumsum(counts) - counts).astype(np.int32)
    starts = jnp.asarray(starts_np)

    # deduplicated variant: keep only the last gaussian of each equal-start
    # group; its diff absorbs the group's telescoped sum
    last = np.ones(N, bool)
    last[:-1] = starts_np[:-1] != starts_np[1:]
    uniq_idx = np.nonzero(last)[0].astype(np.int32)
    pad_to = 1 << int(np.ceil(np.log2(len(uniq_idx))))
    uniq_idx_p = np.full(pad_to, CAP + 5, np.int32)  # OOB => dropped
    uniq_idx_p[:len(uniq_idx)] = uniq_idx
    print(f"runs={N} unique_starts={len(uniq_idx)}")

    def mk(f, mode):
        diffs = jnp.asarray(rng.integers(-5, 5, (N, f)).astype(np.int32))
        ui = jnp.asarray(uniq_idx_p)

        def body(carry, s):
            x, acc = carry
            d = diffs + (s * 1e-30).astype(jnp.int32)
            if mode == "plain":
                buf = jnp.zeros((CAP, f), jnp.int32).at[starts].add(
                    d, mode="drop")
            elif mode == "uniq":
                dd = jnp.concatenate([d[1:] - 0, d[:1]])  # placeholder mix
                st = jnp.where(ui < CAP, starts[jnp.clip(ui, 0, N - 1)], CAP + 5)
                du = d[jnp.clip(ui, 0, N - 1)]
                buf = jnp.zeros((CAP, f), jnp.int32).at[st].add(
                    du, mode="drop", unique_indices=True)
            elif mode == "flat":
                dest = (starts[:, None] * f
                        + jnp.arange(f, dtype=jnp.int32)[None, :]).ravel()
                buf = jnp.zeros((CAP * f,), jnp.int32).at[dest].add(
                    d.ravel(), mode="drop").reshape(CAP, f)
            return (x, acc + buf.sum())
        return body

    rows = [("plain F=1", mk(1, "plain")),
            ("plain F=2", mk(2, "plain")),
            ("plain F=4", mk(4, "plain")),
            ("plain F=6", mk(6, "plain")),
            ("uniq  F=4", mk(4, "uniq")),
            ("flat  F=4", mk(4, "flat"))]
    sel = sys.argv[1:]
    for i, (name, body) in enumerate(rows):
        if sel and str(i) not in sel:
            continue
        ms = chain(lambda b=body: b, (jnp.zeros(()), jnp.zeros(())),
                   iters=8, reps=2)
        print(f"  [{i}] {name:10s} {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
