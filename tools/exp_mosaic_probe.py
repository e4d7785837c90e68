#!/usr/bin/env python
"""Probe Mosaic support for the seq-kernel scalar-broadcast idioms (jax 0.9).

Round 3 blocked the sequential-instance kernel on three Mosaic failures
(tools/exp_seqkernel.py:15-30). Re-probe each on the current toolchain:
  p1: (1,1) slice -> jnp.broadcast_to (8,128)       [fused 2-axis broadcast]
  p2: (1,16) row -> sublane bcast (8,16) -> static lane slice -> lane bcast
  p3: SMEM scratch budget: 2/4/8/16 KB DMA HBM->SMEM + scalar reads
  p4: scalar SMEM read -> jnp.full((8,128), scalar)
  p5: dynamic sublane read from VMEM scratch (pl.ds(i,1)) -> (1,16)
  p6: in-kernel transpose (16,128) -> (128,16)
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/ngs-jax-cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        out = jax.block_until_ready(out)
        print(f"PASS {name}: {np.asarray(out).ravel()[:4]}", flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:180]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
        return False


def main():
    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)

    # p1: dynamic-lane roll + (1,1) slice + both-axis broadcast
    def k1(x_ref, o_ref):
        i = jnp.int32(3)
        rot = pltpu.roll(x_ref[:], 128 - i, 1)
        o_ref[:] = jnp.broadcast_to(rot[0:1, 0:1], (8, 128))

    run("p1_roll_11_bcast", lambda x: pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x), x)

    # p1b: dynamic roll amount from a traced scalar
    def k1b(x_ref, o_ref):
        i = x_ref[0, 0].astype(jnp.int32) % 128
        rot = pltpu.roll(x_ref[:], 128 - i, 1)
        o_ref[:] = jnp.broadcast_to(rot[0:1, 0:1], (8, 128))

    run("p1b_dynroll", lambda x: pl.pallas_call(
        k1b, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x), x)

    # p2: two-step broadcast via (8,16) intermediate
    def k2(x_ref, o_ref, scratch):
        scratch[:] = x_ref[:].T[:, :16]          # (128,16) transposed copy
        def body(i, acc):
            row = scratch[pl.ds(i, 1), :]        # (1,16) dynamic sublane
            bc = jnp.broadcast_to(row, (8, 16))  # sublane broadcast
            a0 = bc[:, 0:1]                      # (8,1) static lane slice
            return acc + a0 * jnp.ones((8, 128), jnp.float32)
        o_ref[:] = jax.lax.fori_loop(0, 4, body, jnp.zeros((8, 128)))

    run("p2_twostep", lambda x: pl.pallas_call(
        k2, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((128, 16), jnp.float32)])(x), x)

    # p6: in-kernel transpose alone
    def k6(x_ref, o_ref):
        o_ref[:] = x_ref[:].T

    run("p6_transpose", lambda x: pl.pallas_call(
        k6, out_shape=jax.ShapeDtypeStruct((128, 16), jnp.float32))(x), x)

    # p3: SMEM scratch sizes with DMA HBM->SMEM + scalar read
    for kb in (2, 4, 8, 16):
        words = kb * 256
        def k3(x_ref, o_ref, smem, sem, *, words=words):
            cp = pltpu.make_async_copy(
                x_ref.at[0, pl.ds(0, min(words, 128))],
                smem.at[pl.ds(0, min(words, 128))], sem)
            cp.start()
            cp.wait()
            o_ref[:] = jnp.full((8, 128), smem[5])

        ok = run(f"p3_smem_{kb}kb", lambda x, k3=k3, words=words: pl.pallas_call(
            k3,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.SMEM((words,), jnp.float32),
                            pltpu.SemaphoreType.DMA(())])(x), x)

    # p4: scalar SMEM read in a loop, full broadcast each iter
    def k4(x_ref, o_ref, smem, sem):
        cp = pltpu.make_async_copy(x_ref.at[0, :], smem.at[:], sem)
        cp.start()
        cp.wait()
        def body(i, acc):
            return acc + jnp.full((8, 128), smem[i])
        o_ref[:] = jax.lax.fori_loop(0, 128, body, jnp.zeros((8, 128)))

    run("p4_smem_loop", lambda x: pl.pallas_call(
        k4,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((128,), jnp.float32),
                        pltpu.SemaphoreType.DMA(())])(x), x)

    # p5: 2D SMEM + strided scalar reads (attr-major)
    def k5(x_ref, o_ref, smem, sem):
        cp = pltpu.make_async_copy(x_ref.at[0:9, :], smem.at[:, :], sem)
        cp.start()
        cp.wait()
        def body(i, acc):
            mx = smem[0, i]
            my = smem[1, i]
            return acc + jnp.full((8, 128), mx * my)
        o_ref[:] = jax.lax.fori_loop(0, 128, body, jnp.zeros((8, 128)))

    run("p5_smem_2d", lambda x: pl.pallas_call(
        k5,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((9, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA(())])(x), x)


if __name__ == "__main__":
    main()
