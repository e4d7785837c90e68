"""Pallas blend kernels vs the XLA scan path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuralgaussiansplatting_tpu.ops import rasterize as rast

from scenes import make_camera, random_gaussians


XLA = rast.RasterizeSettings(capacity=1 << 12, max_per_tile=128, chunk=8,
                             backend="xla")
PALLAS = rast.RasterizeSettings(capacity=1 << 12, max_per_tile=128, chunk=8,
                                backend="pallas")


def _scene(n=120, deg=1, seed=3, w=48, h=32):
    cam = make_camera(W=w, H=h)
    means, scales, rot, opac, shs = random_gaussians(n=n, deg=deg, seed=seed)
    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rot),
            jnp.asarray(opac), jnp.asarray(shs))
    return cam, args


def test_pallas_forward_matches_xla():
    cam, args = _scene()
    bg = jnp.asarray([0.1, 0.2, 0.3])
    out_x = rast.rasterize(*args, 1, cam, bg, XLA)
    out_p = rast.rasterize(*args, 1, cam, bg, PALLAS)
    # the Pallas kernel evaluates the quadratic form in expanded (MXU
    # matmul) form; last-ulp differences vs the factored XLA path are
    # expected at the 1e-5 level
    np.testing.assert_allclose(np.asarray(out_p.color),
                               np.asarray(out_x.color), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out_p.final_t),
                               np.asarray(out_x.final_t), atol=5e-5)
    assert (np.asarray(out_p.n_contrib)
            == np.asarray(out_x.n_contrib)).mean() > 0.999


def test_pallas_forward_early_stop_scene():
    cam, args = _scene(n=250, deg=0, seed=5)
    means, scales, rot, opac, shs = args
    opac = jnp.full_like(opac, 0.995)  # force T < 1e-4 stops
    bg = jnp.zeros(3)
    out_x = rast.rasterize(means, scales, rot, opac, shs, 0, cam, bg, XLA)
    out_p = rast.rasterize(means, scales, rot, opac, shs, 0, cam, bg, PALLAS)
    np.testing.assert_allclose(np.asarray(out_p.color),
                               np.asarray(out_x.color), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out_p.final_t),
                               np.asarray(out_x.final_t), atol=5e-5)


def test_pallas_gradients_match_xla():
    cam, args = _scene(n=80, deg=1, seed=7)
    bg = jnp.asarray([0.5, 0.5, 0.5])
    gt = jnp.linspace(0, 1, 3 * cam.height * cam.width).reshape(
        3, cam.height, cam.width)

    def loss(settings):
        def f(means, scales, rot, opac, shs, off):
            out = rast.rasterize(means, scales, rot, opac, shs, 1, cam, bg,
                                 settings, means2d_offset=off)
            return jnp.sum((out.color - gt) ** 2) + 0.1 * jnp.sum(out.final_t)
        return f

    off = jnp.zeros((80, 2))
    gx = jax.grad(loss(XLA), argnums=(0, 1, 2, 3, 4, 5))(*args, off)
    gp = jax.grad(loss(PALLAS), argnums=(0, 1, 2, 3, 4, 5))(*args, off)
    names = ["means", "scales", "rot", "opac", "shs", "off"]
    for name, a, b in zip(names, gx, gp):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b, a, atol=2e-4 * scale, rtol=2e-3,
                                   err_msg=name)


def test_grad_reduce_modes_agree():
    """The sort-based (expansion-order cumsum-diff) per-Gaussian gradient
    reduction must match the scatter-add path on a scene with no dropped
    instances, through the full rasterize VJP."""
    import dataclasses
    cam, args = _scene(n=90, deg=1, seed=13)
    bg = jnp.asarray([0.3, 0.1, 0.2])
    gt = jnp.zeros((3, cam.height, cam.width))

    def grads(settings):
        def f(means, scales, rot, opac, shs):
            out = rast.rasterize(means, scales, rot, opac, shs, 1, cam, bg,
                                 settings)
            return jnp.sum((out.color - gt) ** 2) + jnp.sum(out.final_t)
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(*args)

    g_scatter = grads(dataclasses.replace(PALLAS, grad_reduce="scatter"))
    g_sort = grads(dataclasses.replace(PALLAS, grad_reduce="sort"))
    g_auto = grads(dataclasses.replace(PALLAS, grad_reduce="auto"))
    for name, a, b, c in zip(["means", "scales", "rot", "opac", "shs"],
                             g_scatter, g_sort, g_auto):
        a, b, c = np.asarray(a), np.asarray(b), np.asarray(c)
        scale = np.abs(a).max() + 1e-8
        # sort path reassociates the sums (cumsum difference): tiny f32 drift
        np.testing.assert_allclose(b, a, atol=1e-5 * scale, rtol=1e-4,
                                   err_msg=name)
        # no drops here => auto takes the sort branch; XLA may compile the
        # lax.cond branch body differently from the straight-line call, so
        # gate at the same tight tolerance as sort-vs-scatter rather than
        # bit-exactness (which would break on compiler changes alone)
        np.testing.assert_allclose(c, a, atol=1e-5 * scale, rtol=1e-4,
                                   err_msg=name)


def test_grad_reduce_auto_falls_back_on_drops():
    """When capacity drops instances, the fast expansion-order boundaries are
    stale — auto must select the drop-tolerant sort variant, whose rank-based
    boundaries reproduce the scatter-path sums exactly (up to blocked-cumsum
    reassociation)."""
    import dataclasses
    cam, args = _scene(n=200, deg=0, seed=17)
    bg = jnp.zeros(3)
    # tiny caps: guaranteed per-tile truncation => dropped > 0
    tiny = rast.RasterizeSettings(capacity=1 << 9, max_per_tile=16, chunk=8,
                                  backend="pallas")
    from neuralgaussiansplatting_tpu.ops import binning, preprocess as pp
    pre = pp.preprocess_gaussians(*args, 0, cam, 16, 16)
    tx, ty = tiny.tiles_for(cam.width, cam.height)
    inst = binning.bin_gaussians(pre, tx, ty, tiny.capacity,
                                 tiny.max_per_tile, tiny.chunk)
    assert int(inst.dropped) > 0

    gt = jnp.zeros((3, cam.height, cam.width))

    def grads(settings):
        def f(means, scales, rot, opac, shs):
            out = rast.rasterize(means, scales, rot, opac, shs, 0, cam, bg,
                                 settings)
            return jnp.sum((out.color - gt) ** 2)
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(*args)

    g_auto = grads(dataclasses.replace(tiny, grad_reduce="auto"))
    g_scatter = grads(dataclasses.replace(tiny, grad_reduce="scatter"))
    for a, b in zip(g_scatter, g_auto):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b, a, atol=1e-5 * scale, rtol=1e-4)


def test_reduce_sorted_matches_scatter_at_scale():
    """Direct numeric check of _reduce_sorted vs _reduce_scatter on a large
    synthetic layout with realistic run structure (catches f32 cancellation
    regressions in the blocked cumsum difference)."""
    from neuralgaussiansplatting_tpu.ops import blend_pallas as bp
    rng = np.random.default_rng(0)
    n, kmax = 5000, 1 << 17
    counts = rng.integers(0, 40, size=n).astype(np.int32)
    total = int(counts.sum())
    assert total < kmax
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    # expansion ids 0..total-1 in a random packed order + padding sentinels
    perm = rng.permutation(total).astype(np.int32)
    eid = np.full(kmax, kmax, np.int32)
    eid[:total] = perm
    gid_of_e = np.repeat(np.arange(n, dtype=np.int32), counts)
    gid = np.full(kmax, n, np.int32)
    gid[:total] = gid_of_e[perm]
    cot = rng.standard_normal((9, kmax), dtype=np.float32)
    cot[:, total:] = 0.0

    g_sort = np.asarray(bp._reduce_sorted(
        jnp.asarray(cot), jnp.asarray(eid), jnp.asarray(starts),
        jnp.asarray(counts)))
    g_scat = np.asarray(bp._reduce_scatter(
        jnp.asarray(cot), jnp.asarray(gid), n))
    scale = np.abs(g_scat).max()
    np.testing.assert_allclose(g_sort, g_scat, atol=2e-5 * scale)


def test_pallas_inference_mode_track_contrib_off():
    """track_contrib=False: identical color/final_t, zero n_contrib, and the
    backward (which loses its chunk-skip) still produces exact gradients."""
    import dataclasses
    cam, args = _scene(n=80, deg=1, seed=11)
    bg = jnp.asarray([0.2, 0.3, 0.4])
    fast = dataclasses.replace(PALLAS, track_contrib=False)

    out_p = rast.rasterize(*args, 1, cam, bg, PALLAS)
    out_f = rast.rasterize(*args, 1, cam, bg, fast)
    np.testing.assert_array_equal(np.asarray(out_f.color),
                                  np.asarray(out_p.color))
    np.testing.assert_array_equal(np.asarray(out_f.final_t),
                                  np.asarray(out_p.final_t))
    assert not np.asarray(out_f.n_contrib).any()

    gt = jnp.zeros((3, cam.height, cam.width))

    def loss(settings):
        def f(means, scales, rot, opac, shs):
            out = rast.rasterize(means, scales, rot, opac, shs, 1, cam, bg,
                                 settings)
            return jnp.sum((out.color - gt) ** 2)
        return f

    gp = jax.grad(loss(PALLAS), argnums=(0, 1, 2, 3, 4))(*args)
    gf = jax.grad(loss(fast), argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(gp, gf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6, rtol=1e-6)


def test_precise_cull_is_image_and_grad_exact():
    """The diagonal-SAT per-instance cull (ops/binning.py) must remove only
    instances whose every pixel contribution the blend kernel would zero
    anyway (alpha < 1/255, forward.cu:351) — images and gradients agree with
    the uncull path to reassociation noise, while the instance stream
    measurably shrinks."""
    import dataclasses
    cam, args = _scene(n=300, deg=1, seed=21, w=64, h=64)
    bg = jnp.zeros(3)
    base = rast.RasterizeSettings(capacity=1 << 14, max_per_tile=512, chunk=8,
                                  backend="pallas", tight_culling=True)
    off = dataclasses.replace(base, precise_cull=False)
    on = dataclasses.replace(base, precise_cull=True)

    o0 = rast.rasterize(*args, 1, cam, bg, off)
    o1 = rast.rasterize(*args, 1, cam, bg, on)
    assert int(o1.culled) > 0, "cull removed nothing on a dense scene"
    assert int(o1.aligned_demand) <= int(o0.aligned_demand)
    # chunk partitioning shifts reassociate the lane cumprod -> tiny noise
    np.testing.assert_allclose(np.asarray(o1.color), np.asarray(o0.color),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(o1.final_t),
                               np.asarray(o0.final_t), atol=2e-6)

    def grads(settings):
        def f(means, scales, rot, opac, shs):
            out = rast.rasterize(means, scales, rot, opac, shs, 1, cam, bg,
                                 settings)
            return jnp.sum(out.color ** 2) + jnp.sum(out.final_t)
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(*args)

    g0 = grads(dataclasses.replace(off, grad_reduce="scatter"))
    g1 = grads(dataclasses.replace(on, grad_reduce="auto"))
    for name, a, b in zip(["means", "scales", "rot", "opac", "shs"], g0, g1):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b, a, atol=2e-5 * scale, rtol=1e-3,
                                   err_msg=name)


def test_precise_cull_conservative_per_pixel():
    """No culled instance may own a pixel with alpha >= 1/255: verify against
    the per-pixel numpy oracle that the culled image equals the full blend
    over EVERY gaussian (the cull must be conservative, not approximate)."""
    import oracle
    import dataclasses
    cam, args = _scene(n=200, deg=0, seed=33, w=48, h=48)
    bg = np.asarray([0.1, 0.2, 0.3], np.float32)
    st = rast.RasterizeSettings(capacity=1 << 14, max_per_tile=512, chunk=8,
                                block_x=16, block_y=16,
                                backend="pallas", tight_culling=True,
                                precise_cull=True)
    out = rast.rasterize(*args, 0, cam, jnp.asarray(bg), st)
    splats = oracle.preprocess_np(
        *[np.asarray(a) for a in args], 0,
        np.asarray(cam.view), np.asarray(cam.full_proj),
        np.asarray(cam.campos), cam.tan_fovx, cam.tan_fovy,
        cam.width, cam.height)
    img_np, final_t_np, _ = oracle.render_np(splats, cam.width, cam.height,
                                             bg)
    got = np.transpose(np.asarray(out.color), (1, 2, 0))
    np.testing.assert_allclose(got, img_np, atol=3e-5)
    np.testing.assert_allclose(np.asarray(out.final_t), final_t_np,
                               atol=3e-5)
