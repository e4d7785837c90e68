"""Sequential-instance (32x32) blend kernels vs the XLA scan path.

Interpret mode on CPU; mirrors tests/test_blend_pallas.py for the
``backend="seq"`` production path (ops/blend_seq.py).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from neuralgaussiansplatting_tpu.ops import rasterize as rast

from scenes import make_camera, random_gaussians


XLA32 = rast.RasterizeSettings(block_x=32, block_y=32, capacity=1 << 13,
                               max_per_tile=1024, chunk=8, backend="xla")
SEQ = rast.RasterizeSettings(block_x=32, block_y=32, capacity=1 << 13,
                             max_per_tile=1024, chunk=128, backend="seq")


def _scene(n=120, deg=1, seed=3, w=64, h=64):
    cam = make_camera(W=w, H=h)
    means, scales, rot, opac, shs = random_gaussians(n=n, deg=deg, seed=seed)
    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rot),
            jnp.asarray(opac), jnp.asarray(shs))
    return cam, args


def test_seq_forward_matches_xla():
    cam, args = _scene()
    bg = jnp.asarray([0.1, 0.2, 0.3])
    out_x = rast.rasterize(*args, 1, cam, bg, XLA32)
    out_s = rast.rasterize(*args, 1, cam, bg, SEQ)
    np.testing.assert_allclose(np.asarray(out_s.color),
                               np.asarray(out_x.color), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out_s.final_t),
                               np.asarray(out_x.final_t), atol=5e-5)
    assert (np.asarray(out_s.n_contrib)
            == np.asarray(out_x.n_contrib)).mean() > 0.999


def test_seq_forward_early_stop_scene():
    cam, args = _scene(n=250, deg=0, seed=5)
    means, scales, rot, opac, shs = args
    opac = jnp.full_like(opac, 0.995)  # force T < 1e-4 stops
    bg = jnp.zeros(3)
    out_x = rast.rasterize(means, scales, rot, opac, shs, 0, cam, bg, XLA32)
    out_s = rast.rasterize(means, scales, rot, opac, shs, 0, cam, bg, SEQ)
    np.testing.assert_allclose(np.asarray(out_s.color),
                               np.asarray(out_x.color), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out_s.final_t),
                               np.asarray(out_x.final_t), atol=5e-5)


def test_seq_vs_16_tile_semantic_band_is_bounded():
    """16x16 and 32x32 tilings differ SEMANTICALLY, by design of the
    reference: the 3-sigma bounding rect (forward.cu:213-216 radius) excludes
    pixels in the 3..3.33-sigma band whose alpha still clears the 1/255
    cutoff (exp(-4.5)*op > 1/255 for op > 0.35), so a coarser tiling blends
    slightly MORE of each Gaussian's tail wherever the rect straddles a tile
    boundary. The same difference exists between a 16- and 32-tiled CUDA
    build. This gate documents and bounds it; exact-parity gates for the seq
    kernel run against the 32-tile oracle (test_seq_forward_matches_xla)."""
    cam, args = _scene(n=150, deg=1, seed=9)
    p16 = rast.RasterizeSettings(capacity=1 << 13, max_per_tile=512, chunk=8,
                                 backend="pallas")
    bg = jnp.asarray([0.4, 0.1, 0.0])
    out_p = rast.rasterize(*args, 1, cam, bg, p16)
    out_s = rast.rasterize(*args, 1, cam, bg, SEQ)
    diff = np.abs(np.asarray(out_s.color) - np.asarray(out_p.color))
    assert diff.max() < 0.05, "band difference larger than the 3.33-sigma tail"
    assert diff.mean() < 1e-3, "difference is not confined to rect boundaries"


def test_seq_gradients_match_xla():
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
    gx = jax.grad(loss(XLA32), argnums=(0, 1, 2, 3, 4, 5))(*args, off)
    gs = jax.grad(loss(SEQ), argnums=(0, 1, 2, 3, 4, 5))(*args, off)
    names = ["means", "scales", "rot", "opac", "shs", "off"]
    for name, a, b in zip(names, gx, gs):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        # the seq backward recombines tile-centered moment sums (see
        # blend_seq._epilogue); reassociation noise is slightly above the
        # lane-layout kernel's
        np.testing.assert_allclose(b, a, atol=5e-4 * scale, rtol=5e-3,
                                   err_msg=name)


def test_seq_gradients_match_xla32_scatter():
    """Seq-backward moment recombination vs the 32-tile oracle autodiff with
    the always-exact scatter reduction (isolates the kernel+epilogue from
    the sort-reduce path)."""
    cam, args = _scene(n=90, deg=1, seed=13)
    xs = dataclasses.replace(XLA32, grad_reduce="scatter")
    ss = dataclasses.replace(SEQ, grad_reduce="scatter")
    bg = jnp.asarray([0.3, 0.1, 0.2])
    gt = jnp.zeros((3, cam.height, cam.width))

    def grads(settings):
        def f(means, scales, rot, opac, shs):
            out = rast.rasterize(means, scales, rot, opac, shs, 1, cam, bg,
                                 settings)
            return jnp.sum((out.color - gt) ** 2) + jnp.sum(out.final_t)
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(*args)

    gx = grads(xs)
    gs = grads(ss)
    for name, a, b in zip(["means", "scales", "rot", "opac", "shs"], gx, gs):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b, a, atol=5e-4 * scale, rtol=5e-3,
                                   err_msg=name)


def test_seq_inference_mode_track_contrib_off():
    cam, args = _scene(n=80, deg=1, seed=11)
    bg = jnp.asarray([0.2, 0.3, 0.4])
    fast = dataclasses.replace(SEQ, track_contrib=False)

    out_s = rast.rasterize(*args, 1, cam, bg, SEQ)
    out_f = rast.rasterize(*args, 1, cam, bg, fast)
    np.testing.assert_array_equal(np.asarray(out_f.color),
                                  np.asarray(out_s.color))
    np.testing.assert_array_equal(np.asarray(out_f.final_t),
                                  np.asarray(out_s.final_t))
    assert not np.asarray(out_f.n_contrib).any()

    gt = jnp.zeros((3, cam.height, cam.width))

    def loss(settings):
        def f(means, scales, rot, opac, shs):
            out = rast.rasterize(means, scales, rot, opac, shs, 1, cam, bg,
                                 settings)
            return jnp.sum((out.color - gt) ** 2)
        return f

    gs = jax.grad(loss(SEQ), argnums=(0, 1, 2, 3, 4))(*args)
    gf = jax.grad(loss(fast), argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(gs, gf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6, rtol=1e-6)
