#!/usr/bin/env python
"""Measure candidate primitives for the expansion-order gradient reduction.

Decides the backward per-Gaussian reduction design (DESIGN.md 4.1): the
current XLA scatter-add vs sort-inversion + row-gather + blocked-cumsum +
difference-at-known-boundaries. Each primitive is one jit with the repeat
loop inside (lax.fori_loop with a data dependency), so per-call dispatch
noise amortizes and each primitive costs exactly one compile.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp

from neuralgaussiansplatting_tpu.ops.binning import _blocked_cumsum

ITERS = 24


def timed(name, body, x0):
    """body: (carry, eps) -> carry with eps folded in to defeat CSE."""

    @jax.jit
    def run(x, s, n):
        def step(i, x):
            return body(x, s + i.astype(jnp.float32) * 1e-30)
        out = jax.lax.fori_loop(0, n, step, x)
        return sum(jnp.sum(l.ravel()[:: max(1, l.size // 16)].astype(
            jnp.float32)) for l in jax.tree.leaves(out))

    float(run(x0, 0.0, ITERS))          # compile + warm
    t0 = time.perf_counter()
    float(run(x0, 1.0, ITERS))
    tn = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(x0, 2.0, 1))
    t1 = time.perf_counter() - t0
    ms = (tn - t1) / (ITERS - 1) * 1e3
    print(f"  {name:38s} {ms:8.2f} ms", flush=True)
    return ms


def _blocked_cumsum_f32(x, block=1024):
    k = x.shape[0]
    nb = -(-k // block)
    pad = nb * block - k
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    xb = x.reshape((nb, block) + x.shape[1:])
    within = jnp.cumsum(xb, axis=1)
    totals = within[:, -1]
    prefix = jnp.cumsum(totals, axis=0) - totals
    out = within + prefix[:, None]
    return out.reshape((nb * block,) + x.shape[1:])[:k]


def run_suite(tag, cap, K, N):
    print(f"[{tag}] cap={cap} K={K} N={N}", flush=True)
    key = jax.random.PRNGKey(0)
    gp = jax.random.normal(key, (16, K), jnp.float32)
    gid = jax.random.randint(jax.random.PRNGKey(1), (K,), 0, N)
    gid = jnp.where(jnp.arange(K) < int(K * 0.9), gid, N).astype(jnp.int32)
    k_of_e = jax.random.randint(jax.random.PRNGKey(2), (cap,), 0, K)
    k_of_e = jnp.where(jnp.arange(cap) < int(cap * 0.6), k_of_e,
                       K).astype(jnp.int32)
    bounds = jnp.sort(jax.random.randint(
        jax.random.PRNGKey(4), (N,), 0, cap)).astype(jnp.int32)
    gpT = jnp.concatenate(
        [gp.T, jnp.zeros((1, 16), jnp.float32)], axis=0)  # (K+1, 16)
    iota = jnp.arange(cap, dtype=jnp.int32)
    se = jax.random.permutation(jax.random.PRNGKey(5), iota)
    tile = jnp.sort(jax.random.randint(
        jax.random.PRNGKey(7), (cap,), 0, 8000)).astype(jnp.int32)
    d2 = jax.random.randint(
        jax.random.PRNGKey(6), (cap,), 0, 1 << 30).astype(jnp.int32)

    # baseline: col scatter-add (current backward reduction)
    def col_scatter(c, s):
        g, acc = c
        out = jnp.zeros((9, N + 1), jnp.float32).at[:, gid].add(g[:9] + s)
        return (g, acc + out)
    timed("col scatter-add (9,N) [baseline]", col_scatter,
          (gp, jnp.zeros((9, N + 1), jnp.float32)))

    # row-gather of (K+1,16) by (cap,) arbitrary indices
    def row_gather(c, s):
        g, acc = c
        return (g, acc + (g + s)[k_of_e])
    timed("row gather (cap rows of 16)", row_gather,
          (gpT, jnp.zeros((cap, 16), jnp.float32)))

    # FULL proposed backward: gather + f32 cumsum + boundary diff
    def full_f32(c, s):
        g, acc = c
        ve = (g + s)[k_of_e][:, :9]
        cs = _blocked_cumsum_f32(ve)
        out = cs[bounds] - cs[jnp.maximum(bounds - 7, 0)]
        return (g, acc + out)
    timed("FULL f32: gather+cumsum+bounds", full_f32,
          (gpT, jnp.zeros((N, 9), jnp.float32)))

    # FULL exact: gather + hi/lo int32 split cumsum + boundary diff
    def full_int(c, s):
        g, acc = c
        ve = (g + s)[k_of_e][:, :9]
        maxabs = jnp.maximum(jnp.max(jnp.abs(ve), axis=0, keepdims=True),
                             1e-30)
        scale = jnp.float32(2.0 ** 30) / maxabs
        v = ve * scale
        hi = jnp.round(v * jnp.float32(2.0 ** -15)).astype(jnp.int32)
        lo = jnp.round(v - hi.astype(jnp.float32)
                       * jnp.float32(2.0 ** 15)).astype(jnp.int32)
        cs = _blocked_cumsum(jnp.concatenate([hi, lo], axis=1))
        d = cs[bounds] - cs[jnp.maximum(bounds - 7, 0)]
        out = (d[:, :9].astype(jnp.float32) * jnp.float32(2.0 ** 15)
               + d[:, 9:].astype(jnp.float32)) / scale
        return (g, acc + out)
    timed("FULL exact-int: gather+2x cumsum", full_int,
          (gpT, jnp.zeros((N, 9), jnp.float32)))

    # sort 2-op int32 over cap (fwd inversion sort)
    def sort2(c, s):
        k, acc = c
        kk = k + jnp.int32(s * 1e-30)
        a, b = jax.lax.sort((kk, iota), num_keys=1)
        return (k, acc + b)
    timed("sort 2-op int32 over cap", sort2,
          (se, jnp.zeros((cap,), jnp.int32)))

    # marginal cost of a 4th operand on the main binning sort
    def sort3(c, s):
        k, acc = c
        kk = k + jnp.int32(s * 1e-30)
        o = jax.lax.sort((tile, kk, iota), num_keys=2)
        return (k, acc + o[2])
    timed("sort 3-op int32 over cap", sort3,
          (d2, jnp.zeros((cap,), jnp.int32)))

    def sort4(c, s):
        k, acc = c
        kk = k + jnp.int32(s * 1e-30)
        o = jax.lax.sort((tile, kk, iota, se), num_keys=2)
        return (k, acc + o[3])
    timed("sort 4-op int32 over cap", sort4,
          (d2, jnp.zeros((cap,), jnp.int32)))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "800"
    if which == "800":
        run_suite("800^2", cap=1 << 21, K=1344 * 1024, N=100_000)
    elif which == "1080":
        run_suite("1080p", cap=1 << 22, K=4608 * 1024, N=100_000)
