#!/usr/bin/env python
"""Experiment: forward-only 1080p rate vs DMA chunk width (128/256/512).

Larger chunks halve per-chunk fixed costs (DMA setup, loop/carry overhead)
but increase alignment padding (each tile segment pads to a chunk multiple).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_suite import chain_time  # noqa: E402


def main():
    import jax.numpy as jnp
    from neuralgaussiansplatting_tpu.gaussian_renderer import render
    from neuralgaussiansplatting_tpu.ops import rasterize as rast
    from __graft_entry__ import _demo_scene

    params, state, cam = _demo_scene(n=100_000, w=1920, h=1080, sh_degree=3)
    alive = state.alive

    for chunk in (128, 256, 512):
        # capacity must absorb padding waste: tiles*chunk upper bound on pad
        pad_bound = 8160 * chunk
        kcap = (4_500_000 + pad_bound + chunk - 1) // chunk * chunk
        s = rast.RasterizeSettings(capacity=4608 * 1024, max_per_tile=4096,
                                   chunk=chunk, backend="pallas",
                                   fast_sort=True, tight_culling=True,
                                   packed_capacity=kcap)

        def make_fwd():
            def step(p, eps):
                p2 = p._replace(xyz=p.xyz + eps)
                out = render(cam, p2, alive, 3, jnp.zeros(3), s)
                return p._replace(
                    xyz=p.xyz + 1e-30 * jnp.sum(out["render"][:, ::270, ::384]))
            return step

        dt = chain_time(make_fwd, params)
        print(f"chunk={chunk:4d} kcap={kcap:9d}  {dt*1e3:7.2f} ms  "
              f"{1.0/dt:6.2f} fps", flush=True)


if __name__ == "__main__":
    main()
