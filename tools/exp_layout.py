#!/usr/bin/env python
"""Layout experiment: blocked cumsum / run expansion with the field axis
minor (K, F) vs major (F, K).

Hypothesis: (K, F) arrays with F in {4..9} tile as (8, 128) on TPU, padding
the minor dim to 128 lanes (~14-32x memory blowup); every cumsum pass then
moves the padded array. The transposed layout keeps lanes dense.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/ngs-jax-cache")

import jax
import jax.numpy as jnp
import numpy as np

from tools.chain_bench import chain
from neuralgaussiansplatting_tpu.ops.binning import _blocked_cumsum


def _blocked_cumsum_t(x, block=1024):
    """Transposed variant: x (F, K), scan along the minor axis."""
    f, k = x.shape
    nb = -(-k // block)
    pad = nb * block - k
    if pad:
        x = jnp.concatenate([x, jnp.zeros((f, pad), x.dtype)], axis=1)
    xb = x.reshape(f, nb, block)
    within = jnp.cumsum(xb, axis=2)
    totals = within[:, :, -1]
    prefix = jnp.cumsum(totals, axis=1) - totals
    out = within + prefix[:, :, None]
    return out.reshape(f, nb * block)[:, :k]


def main():
    rng = np.random.default_rng(0)
    rows = []

    for (k, f, dtype) in [(1_245_184, 6, np.int32), (1_376_256, 9, np.float32)]:
        xk = jnp.asarray(rng.integers(-5, 5, (k, f)).astype(dtype))
        xt = jnp.asarray(np.ascontiguousarray(np.asarray(xk).T))

        def body_kf(carry, s, xk=xk):
            x, acc = carry
            y = _blocked_cumsum(xk + (s * 1e-30).astype(xk.dtype))
            return (x, acc + y[::4096].astype(jnp.float32).sum())

        def body_fk(carry, s, xt=xt):
            x, acc = carry
            y = _blocked_cumsum_t(xt + (s * 1e-30).astype(xt.dtype))
            return (x, acc + y[:, ::4096].astype(jnp.float32).sum())

        x0 = (jnp.zeros(()), jnp.zeros(()))
        ms1 = chain(lambda b=body_kf: b, x0, iters=8, reps=2)
        ms2 = chain(lambda b=body_fk: b, x0, iters=8, reps=2)
        print(f"cumsum K={k} F={f} {np.dtype(dtype).name}: "
              f"(K,F)={ms1:7.2f} ms  (F,K)={ms2:7.2f} ms", flush=True)

    # correctness
    x = jnp.asarray(rng.integers(-100, 100, (5000, 6)).astype(np.int32))
    a = np.asarray(_blocked_cumsum(x))
    b = np.asarray(_blocked_cumsum_t(x.T)).T
    assert (a == b).all()
    print("transposed cumsum exact: ok")


if __name__ == "__main__":
    main()
