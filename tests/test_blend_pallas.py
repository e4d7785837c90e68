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
