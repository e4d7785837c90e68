#!/usr/bin/env python
"""Per-stage wall-clock profile of the rasterizer train step on real hardware.

Times each pipeline stage in isolation (jitted, block_until_ready) at the
bench config so optimization work targets the true hot spots.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(f, *a, iters=20):
    import jax
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp
    from neuralgaussiansplatting_tpu.gaussian_renderer import render
    from neuralgaussiansplatting_tpu.models import gaussians as gm
    from neuralgaussiansplatting_tpu.ops import binning, preprocess as pp
    from neuralgaussiansplatting_tpu.ops import blend_pallas, rasterize as rast
    from neuralgaussiansplatting_tpu.utils import losses
    from __graft_entry__ import _demo_scene

    W = int(os.environ.get("PROF_W", 800))
    H = int(os.environ.get("PROF_H", W))
    N = int(os.environ.get("PROF_N", 100_000))
    CAP = int(os.environ.get("PROF_CAP", 1216 * 1024))
    params, state, cam_obj = _demo_scene(n=N, w=W, h=H, sh_degree=3)
    KCAP = int(os.environ.get("PROF_KCAP", 1344 * 1024))
    settings = rast.RasterizeSettings(capacity=CAP, max_per_tile=2048,
                                      chunk=128, backend="pallas",
                                      fast_sort=True, tight_culling=True,
                                      packed_capacity=KCAP)
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.zeros((3, H, W), jnp.float32)
    tiles_x, tiles_y = settings.tiles_for(W, H)

    # Build the raw activated inputs once (mirror gaussian_renderer.render)
    from neuralgaussiansplatting_tpu.gaussian_renderer import __init__ as gr  # noqa
    alive = state.alive

    import inspect
    import neuralgaussiansplatting_tpu.gaussian_renderer as grmod
    # replicate activation path
    act = gm.activated(params, alive) if hasattr(gm, "activated") else None

    # Fall back: call render once to figure out the camera type
    cam = cam_obj

    @jax.jit
    def full_fwd(p, a):
        out = render(cam, p, a, 3, bg, settings)
        return out["render"]

    @jax.jit
    def full_fwd_bwd(p, a):
        def loss_fn(p):
            out = render(cam, p, a, 3, bg, settings)
            return losses.photometric_loss(out["render"], gt, 0.2)
        return jax.value_and_grad(loss_fn)(p)

    print(f"config: {W}x{H}, N={N}, cap={CAP}")
    t_fwd = bench(full_fwd, params, alive)
    print(f"full forward          {t_fwd:8.2f} ms")
    t_fb = bench(full_fwd_bwd, params, alive)
    print(f"full fwd+bwd          {t_fb:8.2f} ms   ({W*H/t_fb/1e3:.2f} Mpix/s)")

    # ---- stage isolation: need the activated/preprocessed tensors ----------
    acts = jax.jit(lambda p, a: (
        p.xyz, gm.get_scaling(p), gm.get_rotation(p),
        gm.get_opacity(p, a), gm.get_features(p)))(params, alive)
    jax.block_until_ready(acts)
    means3d, scales, rots, opac, shs = acts
    camp = cam

    @jax.jit
    def stage_pre(m, s, r, o, sh):
        return pp.preprocess_gaussians(m, s, r, o, sh, 3, camp, 16, 16, 1.0,
                                       tight=True)

    pre = stage_pre(means3d, scales, rots, opac, shs)
    jax.block_until_ready(pre)
    t = bench(stage_pre, means3d, scales, rots, opac, shs)
    print(f"preprocess            {t:8.2f} ms")

    @jax.jit
    def stage_bin(pre):
        return binning.bin_gaussians(pre, tiles_x, tiles_y, CAP, 2048, 128,
                                     pack_keys=True, packed_capacity=KCAP)
    inst = stage_bin(pre)
    jax.block_until_ready(inst)
    print(f"  num_rendered={int(inst.num_rendered)} max_tile={int(inst.max_tile_load)}")
    t = bench(stage_bin, pre)
    print(f"binning               {t:8.2f} ms")

    # binning sub-stages
    @jax.jit
    def stage_sort_only(pre):
        n = pre.tiles_touched.shape[0]
        offsets = jnp.cumsum(pre.tiles_touched)
        starts = offsets - pre.tiles_touched
        fields = jnp.stack([jnp.arange(n, dtype=jnp.int32), starts,
                            pre.rect_min[:, 0], pre.rect_min[:, 1],
                            jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1),
                            jax.lax.bitcast_convert_type(pre.depths, jnp.int32)],
                           axis=1).astype(jnp.int32)
        ex = binning._expand_runs(fields, starts, CAP)
        return ex
    t = bench(stage_sort_only, pre)
    print(f"  expand_runs(6f)     {t:8.2f} ms")

    ex = stage_sort_only(pre)

    @jax.jit
    def stage_pure_sort(key, gid):
        return jax.lax.sort((key, gid), num_keys=1)
    key = ex[:, 5]
    gid = ex[:, 0]
    t = bench(stage_pure_sort, key, gid)
    print(f"  lax.sort 2-col      {t:8.2f} ms")

    @jax.jit
    def stage_pack(pre, inst):
        packed_all = blend_pallas.pack_instance_attrs_t(
            pre.means2d, pre.conic, pre.opacity, pre.rgb)
        return packed_all[:, inst.gid]
    t = bench(stage_pack, pre, inst)
    print(f"pack gather (9,K)     {t:8.2f} ms")

    packed9 = stage_pack(pre, inst)

    @jax.jit
    def stage_fwd_kernel(packed9, inst):
        packed = jnp.concatenate(
            [packed9, jnp.zeros((blend_pallas.PROWS - 9, packed9.shape[1]),
                                jnp.float32)], axis=0)
        return blend_pallas._fwd_call(
            packed, inst.tile_start, inst.tile_count,
            num_tiles=tiles_x * tiles_y, ch=128, pix=256, block_x=16,
            block_y=16, tiles_x=tiles_x, interpret=False)
    raw = stage_fwd_kernel(packed9, inst)
    jax.block_until_ready(raw)
    t = bench(stage_fwd_kernel, packed9, inst)
    print(f"fwd blend kernel      {t:8.2f} ms")

    cot = jnp.ones_like(raw)

    @jax.jit
    def stage_bwd_kernel(packed9, raw, cot, inst):
        packed = jnp.concatenate(
            [packed9, jnp.zeros((blend_pallas.PROWS - 9, packed9.shape[1]),
                                jnp.float32)], axis=0)
        return blend_pallas._bwd_call(
            packed, raw, cot, inst.tile_start, inst.tile_count,
            num_tiles=tiles_x * tiles_y, ch=128, pix=256, block_x=16,
            block_y=16, tiles_x=tiles_x, interpret=False)
    gp = stage_bwd_kernel(packed9, raw, cot, inst)
    jax.block_until_ready(gp)
    t = bench(stage_bwd_kernel, packed9, raw, cot, inst)
    print(f"bwd blend kernel      {t:8.2f} ms")

    @jax.jit
    def stage_scatter(gp, inst):
        n = means3d.shape[0]
        out = jnp.zeros((9, n + 1), jnp.float32)
        return out.at[:, inst.gid].add(gp[:9])
    t = bench(stage_scatter, gp, inst)
    print(f"per-gaussian scatter  {t:8.2f} ms")

    img = full_fwd(params, alive)

    @jax.jit
    def stage_loss(img):
        return losses.photometric_loss(img, gt, 0.2)
    t = bench(stage_loss, img)
    print(f"loss fwd              {t:8.2f} ms")

    @jax.jit
    def stage_loss_bwd(img):
        return jax.value_and_grad(
            lambda x: losses.photometric_loss(x, gt, 0.2))(img)
    t = bench(stage_loss_bwd, img)
    print(f"loss fwd+bwd          {t:8.2f} ms")


if __name__ == "__main__":
    main()
