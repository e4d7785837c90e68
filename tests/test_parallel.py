"""Sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuralgaussiansplatting_tpu.models import gaussians as gm
from neuralgaussiansplatting_tpu.ops import rasterize as rast
from neuralgaussiansplatting_tpu.parallel import mesh as mesh_lib
from neuralgaussiansplatting_tpu.parallel import render_sp
from neuralgaussiansplatting_tpu.parallel import train_step as pts
from neuralgaussiansplatting_tpu.train import optim
from neuralgaussiansplatting_tpu.train.loop import TrainState

from scenes import make_camera, random_gaussians

SETTINGS = rast.RasterizeSettings(capacity=1 << 14, max_per_tile=256,
                                  chunk=16, backend="xla")


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_strip_cameras_match_monolithic():
    cam = make_camera(W=48, H=64)
    means, scales, rot, opac, shs = random_gaussians(n=150, deg=1, seed=0)
    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rot),
            jnp.asarray(opac), jnp.asarray(shs))
    bg = jnp.asarray([0.2, 0.3, 0.4])

    mono = rast.rasterize(*args, 1, cam, bg, SETTINGS)

    cams = render_sp.strip_cameras(cam, 4)
    params, state = gm.create_from_pcd(
        means, np.random.default_rng(0).random((150, 3)),
        np.zeros((150, 3)), 1, capacity=150)
    params = params._replace(
        scaling=jnp.asarray(np.log(scales)), rotation=jnp.asarray(rot),
        opacity=jnp.asarray(np.log(opac / (1 - opac))[:, None]),
        features_dc=jnp.asarray(shs[:, :1]),
        features_rest=jnp.asarray(shs[:, 1:]))
    img = render_sp.render_strips(cams, params, state.alive, 1, bg, SETTINGS)
    np.testing.assert_allclose(np.asarray(img), np.asarray(mono.color),
                               atol=1e-5)


def test_sharded_renderer_runs_on_mesh():
    mesh = mesh_lib.make_mesh(n_data=2, n_tile=4)
    cam = make_camera(W=32, H=64)
    means, scales, rot, opac, shs = random_gaussians(n=100, deg=0, seed=1)
    params, state = gm.create_from_pcd(
        means, np.random.default_rng(1).random((100, 3)),
        np.zeros((100, 3)), 0, capacity=100)
    renderer = render_sp.make_sharded_renderer(
        mesh, sh_degree=0, settings=SETTINGS, n_strips=4)
    img = renderer(cam, params, state.alive, jnp.zeros(3))
    assert img.shape == (3, 64, 32)
    assert np.isfinite(np.asarray(img)).all()


def test_dp_train_step_on_mesh():
    mesh = mesh_lib.make_mesh(n_data=8, n_tile=1)
    cam = make_camera(W=32, H=32)
    means, *_ = random_gaussians(n=80, deg=0, seed=2)
    params, state = gm.create_from_pcd(
        means, np.random.default_rng(2).random((80, 3)),
        np.zeros((80, 3)), 0, capacity=128)

    opt = optim.OptimizationParams()
    tx = optim.make_optimizer(opt, 1.0)
    xyz_before = np.array(params.xyz)  # ts is donated to the step
    ts = TrainState(params=params, gstate=state, opt_state=tx.init(params),
                    step=jnp.asarray(0))
    ts = pts.replicate_state(mesh, ts)

    b = 8
    cams = pts.stack_cameras([cam] * b)
    gts = jnp.tile(jnp.linspace(0, 1, 32 * 32).reshape(1, 1, 32, 32),
                   (b, 3, 1, 1)).astype(jnp.float32)
    cams, gts = pts.shard_batch(mesh, cams, gts)

    step = pts.make_dp_train_step(mesh, tx, sh_degree=0, settings=SETTINGS)
    ts2, metrics = step(ts, cams, gts, jnp.zeros(3))
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved and denom got 8 cameras of stats
    assert np.abs(np.asarray(ts2.params.xyz) - xyz_before).max() > 0
    denom = np.asarray(ts2.gstate.denom)
    assert denom.max() == 8.0


def test_dp_batched_stats_match_sequential():
    """B-camera DP stats == sum of B single-camera iterations."""
    from neuralgaussiansplatting_tpu.gaussian_renderer import render
    from neuralgaussiansplatting_tpu.train import densify as dens
    from neuralgaussiansplatting_tpu.utils import losses

    cam_list = [make_camera(W=24, H=24, angle=a) for a in (0.0, 1.1, 2.2)]
    means, scales, rot, opac, shs = random_gaussians(n=60, deg=0, seed=3)
    params, state = gm.create_from_pcd(
        means, np.random.default_rng(3).random((60, 3)),
        np.zeros((60, 3)), 0, capacity=64)
    gt = jnp.zeros((3, 24, 24))

    # sequential accumulation
    seq_state = state
    for cam in cam_list:
        def loss_fn(p, off):
            out = render(cam, p, seq_state.alive, 0, jnp.zeros(3), SETTINGS,
                         means2d_offset=off)
            return losses.photometric_loss(out["render"], gt, 0.2), out["radii"]
        goff, radii = jax.grad(loss_fn, argnums=1, has_aux=True)(
            params, jnp.zeros((64, 2)))
        seq_state = dens.add_densification_stats(seq_state, radii, goff)

    # batched: mean loss over B cameras, rescaled by B inside the DP step
    mesh = mesh_lib.make_mesh(n_data=1, n_tile=1)
    tx = optim.make_optimizer(optim.OptimizationParams(), 1.0)
    ts = TrainState(params=params, gstate=state, opt_state=tx.init(params),
                    step=jnp.asarray(0))
    cams = pts.stack_cameras(cam_list)
    gts = jnp.tile(gt[None], (3, 1, 1, 1))
    step = pts.make_dp_train_step(mesh, tx, sh_degree=0, settings=SETTINGS)
    ts2, _ = step(ts, cams, gts, jnp.zeros(3))

    np.testing.assert_allclose(np.asarray(ts2.gstate.denom),
                               np.asarray(seq_state.denom))
    np.testing.assert_allclose(np.asarray(ts2.gstate.xyz_gradient_accum),
                               np.asarray(seq_state.xyz_gradient_accum),
                               rtol=1e-4, atol=1e-7)
