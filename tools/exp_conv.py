#!/usr/bin/env python
"""Conv strategy shootout for the UNet's pathological 64-channel 800p layers.

Candidates: XLA conv as-is, channel-padded-to-128 conv, tap-matmul (9 shifted
GEMMs), each in f32 and bf16; fwd and fwd+bwd.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/ngs-jax-cache")

import jax
import jax.numpy as jnp
import numpy as np

from tools.chain_bench import chain

H = W = 800
CIN = COUT = 64


def conv_ref(x, k, dtype, precision=None):
    return jax.lax.conv_general_dilated(
        x.astype(dtype)[None], k.astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision)[0]


def conv_padded(x, k, dtype, precision=None):
    cpad = 128 - CIN
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, cpad)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, cpad), (0, 128 - COUT)))
    y = jax.lax.conv_general_dilated(
        xp.astype(dtype)[None], kp.astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision)[0]
    return y[..., :COUT]


def conv_tapmm(x, k, dtype, precision=None):
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0))).astype(dtype)
    acc = jnp.zeros((H * W, COUT), dtype)
    for dy in range(3):
        for dx in range(3):
            sl = xp[dy:dy + H, dx:dx + W, :].reshape(H * W, CIN)
            acc = acc + jax.lax.dot_general(
                sl, k[dy, dx].astype(dtype), (((1,), (0,)), ((), ())),
                precision=precision)
    return acc.reshape(H, W, COUT)


def main():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(H, W, CIN)).astype(np.float32) * 0.1)
    k0 = jnp.asarray(rng.normal(size=(3, 3, CIN, COUT)).astype(np.float32)
                     * 0.05)

    P = jax.lax.Precision
    cands = [
        ("conv f32 default", conv_ref, jnp.float32, None),
        ("conv bf16", conv_ref, jnp.bfloat16, None),
        ("conv pad128 f32", conv_padded, jnp.float32, None),
        ("conv pad128 bf16", conv_padded, jnp.bfloat16, None),
        ("tapmm f32 HIGHEST", conv_tapmm, jnp.float32, P.HIGHEST),
        ("tapmm f32 default", conv_tapmm, jnp.float32, None),
        ("tapmm bf16", conv_tapmm, jnp.bfloat16, None),
    ]
    sel = sys.argv[1:]
    for i, (name, fn, dtype, prec) in enumerate(cands):
        if sel and str(i) not in sel:
            continue

        def fwd_body(carry, s, fn=fn, dtype=dtype, prec=prec):
            x, acc = carry
            y = fn(x + s, k0, dtype, prec)
            return (x, acc + y.astype(jnp.float32)[::64, ::64].sum())

        def bwd_body(carry, s, fn=fn, dtype=dtype, prec=prec):
            (x, k), acc = carry

            def loss(x, k):
                y = fn(x + s, k, dtype, prec)
                return jnp.sum(y.astype(jnp.float32) ** 2)
            gx, gk = jax.grad(loss, argnums=(0, 1))(x, k)
            return ((x - 1e-30 * gx, k - 1e-30 * gk), acc)

        ms_f = chain(lambda b=fwd_body: b, (x0, jnp.zeros(())), iters=8, reps=2)
        ms_b = chain(lambda b=bwd_body: b, ((x0, k0), jnp.zeros(())),
                     iters=6, reps=2)
        gf = 2 * H * W * 9 * CIN * COUT / 1e9
        print(f"  [{i}] {name:18s} fwd {ms_f:6.2f} ms ({gf/ms_f:6.1f} TF/s)"
              f"   fwd+bwd {ms_b:6.2f} ms", flush=True)

    # numeric sanity: tapmm f32 vs conv f32
    y1 = np.asarray(conv_ref(x0, k0, jnp.float32))
    y2 = np.asarray(conv_tapmm(x0, k0, jnp.float32, P.HIGHEST))
    print("  tapmm-vs-conv max abs diff:", np.abs(y1 - y2).max())


if __name__ == "__main__":
    main()
