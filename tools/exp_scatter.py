#!/usr/bin/env python
"""Experiments: alternatives for the per-Gaussian gradient reduction.

(16, K) per-instance grads + (K,) gid -> (9, N+1) per-Gaussian sums.
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(f, *a, iters=20):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


K = 1 << 21
N = 100_000
key = jax.random.PRNGKey(0)
gp = jax.random.normal(key, (16, K), jnp.float32)
# realistic gid: sorted by tile => random-ish ids, padding = N
gid = jax.random.randint(jax.random.PRNGKey(1), (K,), 0, N).astype(jnp.int32)
gid = jnp.where(jnp.arange(K) < int(K * 0.7), gid, N)

ref = jax.jit(lambda gp, gid: jnp.zeros((9, N + 1), jnp.float32).at[:, gid].add(gp[:9]))
t = bench(ref, gp, gid)
print(f"(9,N) col scatter       {t:8.2f} ms")
ref_val = ref(gp, gid)

# (K, 9) row scatter
rows = jax.jit(lambda gp, gid: jnp.zeros((N + 1, 9), jnp.float32).at[gid].add(gp[:9].T))
t = bench(rows, gp, gid)
print(f"(N,9) row scatter       {t:8.2f} ms")
print("  allclose:", bool(jnp.allclose(rows(gp, gid).T, ref_val, atol=1e-3)))

# 1-row scatter (index-bound probe)
one = jax.jit(lambda gp, gid: jnp.zeros((1, N + 1), jnp.float32).at[:, gid].add(gp[:1]))
t = bench(one, gp, gid)
print(f"1-row col scatter       {t:8.2f} ms")

one_r = jax.jit(lambda gp, gid: jnp.zeros((N + 1,), jnp.float32).at[gid].add(gp[0]))
t = bench(one_r, gp, gid)
print(f"1-row flat scatter      {t:8.2f} ms")

# segment_sum
seg = jax.jit(lambda gp, gid: jax.ops.segment_sum(gp[:9].T, gid, num_segments=N + 1))
t = bench(seg, gp, gid)
print(f"segment_sum (K,9)       {t:8.2f} ms")

# sort by gid + cumsum-diff
@jax.jit
def sort_cumsum(gp, gid):
    ops = (gid,) + tuple(gp[i] for i in range(9))
    s = jax.lax.sort(ops, num_keys=1)
    sgid = s[0]
    vals = jnp.stack(s[1:], axis=1)            # (K, 9)
    cs = jnp.cumsum(vals, axis=0)              # f32 prefix
    # boundaries: last slot of each gid segment
    idx = jnp.searchsorted(sgid, jnp.arange(N + 1, dtype=jnp.int32),
                           side="right") - 1
    start = jnp.searchsorted(sgid, jnp.arange(N + 1, dtype=jnp.int32),
                             side="left") - 1
    tot = cs[idx] - jnp.where(start >= 0, cs[jnp.maximum(start, 0)], 0.0) \
        + jnp.where(start >= 0, 0.0, 0.0)
    # simpler: sum[g] = cs[end_g] - cs[end_{g-1}] with end_{-1} = -1
    return tot

@jax.jit
def sort_cumsum2(gp, gid):
    ops = (gid,) + tuple(gp[i] for i in range(9))
    s = jax.lax.sort(ops, num_keys=1)
    sgid = s[0]
    vals = jnp.stack(s[1:], axis=1)            # (K, 9)
    cs = jnp.cumsum(vals, axis=0)
    ends = jnp.searchsorted(sgid, jnp.arange(N + 1, dtype=jnp.int32),
                            side="right") - 1   # inclusive end per gid
    csz = jnp.concatenate([jnp.zeros((1, 9), jnp.float32), cs], axis=0)
    tot = csz[ends + 1] - csz[
        jnp.searchsorted(sgid, jnp.arange(N + 1, dtype=jnp.int32),
                         side="left")]
    return tot.T

t = bench(sort_cumsum2, gp, gid)
print(f"sort+cumsum diff        {t:8.2f} ms")
err = jnp.max(jnp.abs(sort_cumsum2(gp, gid) - ref_val))
rel = err / (jnp.max(jnp.abs(ref_val)) + 1e-9)
print(f"  max abs err {float(err):.3e}  rel {float(rel):.3e}")

# sort only cost (1 key + 9 payloads)
sort_only = jax.jit(lambda gp, gid: jax.lax.sort(
    (gid,) + tuple(gp[i] for i in range(9)), num_keys=1)[0])
t = bench(sort_only, gp, gid)
print(f"  sort 10-col           {t:8.2f} ms")

# sort 2-col (key + one payload)
sort2 = jax.jit(lambda gp, gid: jax.lax.sort((gid, gp[0]), num_keys=1)[0])
t = bench(sort2, gp, gid)
print(f"  sort 2-col            {t:8.2f} ms")

# bf16 scatter
bf = jax.jit(lambda gp, gid: jnp.zeros((9, N + 1), jnp.bfloat16)
             .at[:, gid].add(gp[:9].astype(jnp.bfloat16)))
t = bench(bf, gp, gid)
print(f"bf16 col scatter        {t:8.2f} ms")

# half-K probe (is it linear in K?)
gph = gp[:, : K // 2]
gidh = gid[: K // 2]
t = bench(ref, gph, gidh)
print(f"(9,N) col scatter K/2   {t:8.2f} ms")

print("--- data-dependence probes ---")
# (a) duplicates: each gid repeated 14x consecutively
gid_dup = jnp.repeat(jnp.arange(K // 14 + 1, dtype=jnp.int32) % N, 14)[:K]
t = bench(ref, gp, gid_dup)
print(f"dup14-consecutive       {t:8.2f} ms")

# (b) tile-like: unique within 565-blocks, heavy overlap between blocks
rng = np.random.RandomState(0)
blocks = []
base = rng.randint(0, N - 600)
for b in range(K // 512):
    base = max(0, min(N - 600, base + rng.randint(-30, 30)))
    blocks.append(base + rng.permutation(512))
gid_tile = jnp.asarray(np.concatenate(blocks)[:K], jnp.int32)
t = bench(ref, gp, gid_tile)
print(f"tile-like overlap       {t:8.2f} ms")

# (c) interleaved padding: ~30% of slots = N, spread through the array
gid_pad = jnp.where(jax.random.uniform(jax.random.PRNGKey(2), (K,)) < 0.3,
                    N, gid)
t = bench(ref, gp, gid_pad)
print(f"30% padding->N spread   {t:8.2f} ms")

# (d) all-same index
t = bench(ref, gp, jnp.full((K,), N, jnp.int32))
print(f"all-same index          {t:8.2f} ms")
