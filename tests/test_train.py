"""Training-loop tests: optimizer schedule, densify/prune semantics, overfit."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from neuralgaussiansplatting_tpu.models import gaussians as gm
from neuralgaussiansplatting_tpu.ops import rasterize as rast
from neuralgaussiansplatting_tpu.gaussian_renderer import render
from neuralgaussiansplatting_tpu.train import densify as dens
from neuralgaussiansplatting_tpu.train import optim
from neuralgaussiansplatting_tpu.train import loop as train_loop
from neuralgaussiansplatting_tpu.utils import losses

from scenes import make_camera, random_gaussians


def _np_expon_lr(lr_init, lr_final, lr_delay_steps, lr_delay_mult, max_steps, step):
    # the reference helper (utils/general_utils.py:29-62), re-written in numpy
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * np.sin(
            0.5 * np.pi * np.clip(step / lr_delay_steps, 0, 1))
    else:
        delay = 1.0
    t = np.clip(step / max_steps, 0, 1)
    return delay * np.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)


def test_expon_schedule_matches_reference():
    sched = optim.expon_lr_schedule(1.6e-4, 1.6e-6, 0, 0.01, 30_000)
    for step in [0, 1, 100, 7000, 30_000, 50_000]:
        np.testing.assert_allclose(
            float(sched(step)),
            _np_expon_lr(1.6e-4, 1.6e-6, 0, 0.01, 30_000, step), rtol=1e-5)


def _tiny_model(n=20, capacity=64, sh_degree=1, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    params, state = gm.create_from_pcd(
        pts, rng.random((n, 3)), np.zeros((n, 3)), sh_degree, capacity)
    return params, state


def test_ssim_basics():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((3, 24, 24)).astype(np.float32))
    assert float(losses.ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
    other = jnp.asarray(rng.random((3, 24, 24)).astype(np.float32))
    assert float(losses.ssim(img, other)) < 0.9


def test_densify_clone_and_split():
    params, state = _tiny_model(n=20, capacity=64)
    tx = optim.make_optimizer(optim.OptimizationParams(), 1.0)
    opt_state = tx.init(params)

    extent = 1.0
    pd = 0.01
    # small scale -> clone candidates: force 3 gaussians hot + small
    scal = np.full((64, 3), np.log(0.001), np.float32)
    scal[5] = np.log(0.5)  # gaussian 5: big -> split
    params = params._replace(scaling=jnp.asarray(scal))
    accum = np.zeros(64, np.float32)
    accum[[2, 3, 5]] = 1.0  # hot
    state = state._replace(
        xyz_gradient_accum=jnp.asarray(accum),
        denom=jnp.ones(64))

    key = jax.random.PRNGKey(0)
    new_params, new_state, new_opt, report = dens.densify_and_prune(
        params, state, opt_state, key, max_grad=0.5, min_opacity=0.0,
        extent=extent, use_size_prune=False, percent_dense=pd)

    assert int(report.num_cloned) == 2
    assert int(report.num_split) == 1
    assert int(report.num_pruned) == 0
    assert int(report.num_alive) == 20 + 2 + 1

    alive = np.asarray(new_state.alive)
    assert alive[:20].all() and alive[20:23].all() and not alive[23:].any()

    # clones are verbatim copies into slots 20, 21
    np.testing.assert_allclose(np.asarray(new_params.xyz)[20],
                               np.asarray(params.xyz)[2])
    np.testing.assert_allclose(np.asarray(new_params.xyz)[21],
                               np.asarray(params.xyz)[3])
    # split: original slot 5 resampled, copy in slot 22; scaling / 1.6
    np.testing.assert_allclose(np.asarray(new_params.scaling)[5],
                               np.log(0.5 / 1.6), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_params.scaling)[22],
                               np.log(0.5 / 1.6), rtol=1e-5)
    assert not np.allclose(np.asarray(new_params.xyz)[5],
                           np.asarray(params.xyz)[5])
    # split samples stay within a few stddevs of the source
    assert np.linalg.norm(
        np.asarray(new_params.xyz)[22] - np.asarray(params.xyz)[5]) < 5 * 0.5
    # accumulators reset
    assert float(jnp.sum(new_state.xyz_gradient_accum)) == 0.0
    assert float(jnp.sum(new_state.denom)) == 0.0


def test_densify_prune_low_opacity():
    params, state = _tiny_model(n=10, capacity=16)
    op = np.array(params.opacity)
    op[3] = -10.0  # sigmoid ~ 0
    params = params._replace(opacity=jnp.asarray(op))
    tx = optim.make_optimizer(optim.OptimizationParams(), 1.0)
    opt_state = tx.init(params)
    _, new_state, _, report = dens.densify_and_prune(
        params, state, opt_state, jax.random.PRNGKey(0), max_grad=1e9,
        min_opacity=0.005, extent=1.0, use_size_prune=False, percent_dense=0.01)
    assert int(report.num_pruned) == 1
    assert not bool(np.asarray(new_state.alive)[3])
    assert int(report.num_alive) == 9


def test_densify_capacity_exhaustion_reports_demand():
    params, state = _tiny_model(n=62, capacity=64)
    accum = np.ones(64, np.float32)
    state = state._replace(xyz_gradient_accum=jnp.asarray(accum),
                           denom=jnp.ones(64))
    tx = optim.make_optimizer(optim.OptimizationParams(), 1.0)
    opt_state = tx.init(params)
    _, new_state, _, report = dens.densify_and_prune(
        params, state, opt_state, jax.random.PRNGKey(0), max_grad=0.5,
        min_opacity=0.0, extent=1.0, use_size_prune=False, percent_dense=0.01)
    assert int(report.demand) == 62
    assert int(report.num_alive) == 64  # clamped at capacity


def test_reset_opacity():
    params, _ = _tiny_model()
    tx = optim.make_optimizer(optim.OptimizationParams(), 1.0)
    opt_state = tx.init(params)
    new_params, _ = dens.reset_opacity(params, opt_state)
    op = np.asarray(jax.nn.sigmoid(new_params.opacity))
    assert np.all(op <= 0.01 + 1e-6)


def test_moment_rows_zeroed_on_write():
    params, state = _tiny_model(n=8, capacity=16)
    tx = optax.scale_by_adam(eps=1e-15)
    opt_state = tx.init(params)
    # fake nonzero moments
    opt_state = jax.tree_util.tree_map(
        lambda l: l + 1.0 if hasattr(l, "ndim") and l.ndim >= 1 else l,
        opt_state)
    written = jnp.zeros(16, bool).at[jnp.asarray([3, 9])].set(True)
    fixed = dens.zero_moment_rows(opt_state, written, 16)
    mu = fixed.mu.xyz
    np.testing.assert_allclose(np.asarray(mu)[3], 0.0)
    np.testing.assert_allclose(np.asarray(mu)[9], 0.0)
    np.testing.assert_allclose(np.asarray(mu)[0], 1.0)


class _FakeScene:
    def __init__(self, cams, images, model_path):
        self._cams = cams
        self.model_path = model_path
        for c, img in zip(cams, images):
            c.image = img

    def get_train_cameras(self, scale=1.0):
        return self._cams

    def save(self, iteration):
        pass


def test_overfit_tiny_scene(tmp_path):
    """Config-1 style smoke: fixed Gaussians + Adam must overfit 2 views."""
    import dataclasses as dc
    from neuralgaussiansplatting_tpu.scene.cameras import Camera

    W = H = 32
    means, scales, rot, opac, shs = random_gaussians(n=80, deg=1, seed=21)
    settings = rast.RasterizeSettings(capacity=1 << 14, max_per_tile=256,
                                      chunk=16)

    # GT images rendered from a "true" model; we train a perturbed model.
    cams = [make_camera(W=W, H=H, angle=a) for a in (0.0, 1.3)]
    gts = []
    for cp in cams:
        out = rast.rasterize(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rot),
            jnp.asarray(opac), jnp.asarray(shs), 1, cp, jnp.zeros(3), settings)
        gts.append(jnp.clip(out.color, 0, 1))

    g = gm.GaussianModel(sh_degree=1)
    rng = np.random.default_rng(0)
    params, state = gm.create_from_pcd(
        means + rng.normal(0, 0.02, means.shape).astype(np.float32),
        rng.random((80, 3)), np.zeros((80, 3)), 1, capacity=128)
    g.params, g.state = params, state
    g.spatial_lr_scale = 1.0
    g.active_sh_degree = 1

    opt = optim.OptimizationParams(
        densify_from_iter=10_000)  # no densify in this smoke
    trainer = train_loop.Trainer(
        gaussians=g, opt=opt, settings=settings, cameras_extent=1.0)

    losses_seen = []
    for it in range(1, 151):
        i = it % 2
        m = trainer.step(cams[i], gts[i], it)
        losses_seen.append(float(m["loss"]))
    first = np.mean(losses_seen[:10])
    last = np.mean(losses_seen[-10:])
    assert last < first * 0.7, (first, last)


def test_capacity_growth():
    params, state = _tiny_model(n=56, capacity=64)
    g = gm.GaussianModel(sh_degree=1)
    g.params, g.state = params, state
    trainer = train_loop.Trainer(gaussians=g, cameras_extent=1.0)
    assert trainer.maybe_grow(headroom=0.85)
    assert trainer.ts.params.xyz.shape[0] == 128
    assert int(jnp.sum(trainer.ts.gstate.alive)) == 56
    # padded quats are identity; moments padded with zeros
    np.testing.assert_allclose(np.asarray(trainer.ts.params.rotation)[64:, 0],
                               1.0)
    # below headroom: no growth
    assert not trainer.maybe_grow(headroom=0.99)


def test_checkpoint_roundtrip(tmp_path):
    params, state = _tiny_model(n=30, capacity=32)
    g = gm.GaussianModel(sh_degree=1)
    g.params, g.state = params, state
    trainer = train_loop.Trainer(gaussians=g, cameras_extent=1.0)

    cam = make_camera(W=16, H=16)
    gt = jnp.zeros((3, 16, 16))
    settings = rast.RasterizeSettings(capacity=1 << 12, max_per_tile=128,
                                      chunk=16)
    trainer.settings = settings
    for it in range(1, 6):
        trainer.step(cam, gt, it)

    path = str(tmp_path / "ck.pkl")
    trainer.save_checkpoint(path, 5)

    # continue 3 more steps
    for it in range(6, 9):
        m_a = trainer.step(cam, gt, it)

    # restore into a fresh trainer and replay the same 3 steps
    g2 = gm.GaussianModel(sh_degree=1)
    g2.params, g2.state = _tiny_model(n=30, capacity=32)
    t2 = train_loop.Trainer(gaussians=g2, cameras_extent=1.0)
    t2.settings = settings
    assert t2.restore_checkpoint(path) == 5
    for it in range(6, 9):
        m_b = t2.step(cam, gt, it)

    np.testing.assert_allclose(np.asarray(t2.ts.params.xyz),
                               np.asarray(trainer.ts.params.xyz), atol=1e-7)
    assert float(m_a["loss"]) == pytest.approx(float(m_b["loss"]), abs=1e-7)


def test_capture_restore_model():
    params, state = _tiny_model(n=12, capacity=16)
    g = gm.GaussianModel(sh_degree=1)
    g.params, g.state = params, state
    g.active_sh_degree = 1
    payload = g.capture()
    g2 = gm.GaussianModel(sh_degree=3)
    g2.restore(payload)
    assert g2.active_sh_degree == 1 and g2.max_sh_degree == 1
    np.testing.assert_allclose(np.asarray(g2.params.xyz),
                               np.asarray(params.xyz))


def test_capacity_autotune():
    params, state = _tiny_model(n=40, capacity=64)
    g = gm.GaussianModel(sh_degree=1)
    g.params, g.state = params, state
    trainer = train_loop.Trainer(
        gaussians=g, cameras_extent=1.0,
        settings=rast.RasterizeSettings(capacity=1 << 17, max_per_tile=128,
                                        chunk=16),
    )
    trainer.min_capacity = 1 << 10
    trainer.tune_interval = 1
    cam = make_camera(W=16, H=16)
    gt = jnp.zeros((3, 16, 16))
    m = trainer.step(cam, gt, 1)
    # tiny demand -> bucket shrinks toward min_capacity
    assert trainer.settings.capacity < (1 << 17)
    assert trainer.settings.capacity >= 1 << 10
    # subsequent step runs fine at the retuned bucket
    trainer.step(cam, gt, 2)


def test_orbax_checkpoint_roundtrip(tmp_path):
    params, state = _tiny_model(n=20, capacity=32)
    g = gm.GaussianModel(sh_degree=1)
    g.params, g.state = params, state
    g.active_sh_degree = 1
    trainer = train_loop.Trainer(gaussians=g, cameras_extent=1.0)
    cam = make_camera(W=16, H=16)
    settings = rast.RasterizeSettings(capacity=1 << 12, max_per_tile=128,
                                      chunk=16)
    trainer.settings = settings
    trainer.step(cam, jnp.zeros((3, 16, 16)), 1)
    path = str(tmp_path / "ock")
    trainer.save_checkpoint_orbax(path, 1)

    g2 = gm.GaussianModel(sh_degree=1)
    g2.params, g2.state = _tiny_model(n=20, capacity=32)
    t2 = train_loop.Trainer(gaussians=g2, cameras_extent=1.0)
    t2.settings = settings
    assert t2.restore_checkpoint_orbax(path) == 1
    np.testing.assert_allclose(np.asarray(t2.ts.params.xyz),
                               np.asarray(trainer.ts.params.xyz))


def test_training_survives_sustained_overflow():
    """Garden-regime stress: when per-tile caps + the packed buffer overflow
    for many consecutive steps (whole-tile drops, reference scale README.md:
    74-75), training must stay finite, the overflow monitors must fire, and
    the backward must keep taking the (drop-tolerant) sort reduction — never
    NaN, never silent corruption."""
    cam = make_camera(W=48, H=48)
    means, *_ = random_gaussians(n=120, deg=0, seed=11)
    g = gm.GaussianModel(sh_degree=0)
    g.params, g.state = gm.create_from_pcd(
        means, np.random.default_rng(11).random((120, 3)),
        np.zeros((120, 3)), 0, capacity=128)
    # deliberately starved: tiny instance buffer + per-tile cap
    settings = rast.RasterizeSettings(
        capacity=1 << 9, max_per_tile=24, chunk=8, backend="pallas",
        tight_culling=True, precise_cull=True, grad_reduce="auto")
    trainer = train_loop.Trainer(
        gaussians=g, settings=settings, auto_grow=False,
        auto_tune_capacity=False)
    gt = jnp.asarray(np.random.default_rng(12).random(
        (3, 48, 48)).astype(np.float32))
    dropped_seen = 0
    for it in range(1, 31):
        m = trainer.step(cam.params() if hasattr(cam, "params") else cam,
                         gt, it)
        assert np.isfinite(float(m["loss"])), f"NaN loss at iter {it}"
        dropped_seen = max(dropped_seen, int(m["dropped"]))
        assert int(m["num_rendered"]) > 0
    assert dropped_seen > 0, "stress config failed to overflow"
    # params stayed finite through 30 overflowing backward passes
    for leaf in jax.tree_util.tree_leaves(trainer.ts.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_multi_step_block_matches_per_iteration():
    """steps_per_call block dispatch (train_steps lax.scan) must reproduce
    the per-iteration trainer trajectory when the block size divides the
    schedule intervals."""
    from neuralgaussiansplatting_tpu.parallel.train_step import stack_cameras

    cams = [make_camera(W=32, H=32, angle=a) for a in (0.0, 0.9, 1.8, 2.7)]
    rng = np.random.default_rng(21)
    gts = [jnp.asarray(rng.random((3, 32, 32)).astype(np.float32))
           for _ in cams]
    settings = rast.RasterizeSettings(capacity=1 << 12, max_per_tile=256,
                                      chunk=8, backend="pallas")
    opt = optim.OptimizationParams(
        densify_from_iter=8, densification_interval=8,
        opacity_reset_interval=10_000, densify_until_iter=10_000)

    def make_trainer():
        g = gm.GaussianModel(sh_degree=1)
        means, *_ = random_gaussians(n=50, deg=1, seed=22)
        g.params, g.state = gm.create_from_pcd(
            means, np.random.default_rng(22).random((50, 3)),
            np.zeros((50, 3)), 1, capacity=96)
        return train_loop.Trainer(gaussians=g, opt=opt, settings=settings,
                                  auto_tune_capacity=False, seed=5)

    t1 = make_trainer()
    for it in range(1, 25):
        m1 = t1.step(cams[(it - 1) % 4].params()
                     if hasattr(cams[0], "params") else cams[(it - 1) % 4],
                     gts[(it - 1) % 4], it)

    t2 = make_trainer()
    for blk in range(6):   # 6 blocks of 4 = 24 iterations
        idx = [(blk * 4 + j) % 4 for j in range(4)]
        cb = stack_cameras([cams[i].params() if hasattr(cams[0], "params")
                            else cams[i] for i in idx])
        gb = jnp.stack([gts[i] for i in idx])
        m2 = t2.step_block(cb, gb, blk * 4 + 1)

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(t2.ts.params.xyz),
                               np.asarray(t1.ts.params.xyz),
                               rtol=1e-5, atol=1e-6)
    assert int(t2.ts.step) == int(t1.ts.step) == 24


def test_legacy_rank3_checkpoint_restore_and_step(tmp_path):
    """Pre-flat-SH-layout checkpoints carry (P, K, 3) feature leaves in both
    the params AND the Adam moments; restore must normalize both or the first
    step after restoring fails on a moment/gradient shape mismatch."""
    import pickle
    params, state = _tiny_model(n=30, capacity=32)
    g = gm.GaussianModel(sh_degree=1)
    g.params, g.state = params, state
    trainer = train_loop.Trainer(gaussians=g, cameras_extent=1.0)
    trainer.settings = rast.RasterizeSettings(capacity=1 << 12,
                                              max_per_tile=128, chunk=16)
    cam = make_camera(W=16, H=16)
    gt = jnp.zeros((3, 16, 16))
    for it in range(1, 4):
        trainer.step(cam, gt, it)
    path = str(tmp_path / "legacy.pkl")
    trainer.save_checkpoint(path, 3)

    # rewrite the payload with legacy rank-3 SH leaves (params + moments)
    with open(path, "rb") as f:
        payload = pickle.load(f)

    def to_rank3(p):
        # optax masked states hold MaskedNode placeholders for frozen
        # fields — convert only real rank-2 feature arrays
        def conv(x):
            if getattr(x, "ndim", 0) == 2 and x.shape[1] and x.shape[1] % 3 == 0:
                return np.asarray(x).reshape(x.shape[0], -1, 3)
            return x
        return p._replace(features_dc=conv(p.features_dc),
                          features_rest=conv(p.features_rest))

    payload["params"] = to_rank3(gm.GaussianParams(*payload["params"]))
    payload["opt_state"] = jax.tree_util.tree_map(
        lambda x: to_rank3(x) if isinstance(x, gm.GaussianParams) else x,
        payload["opt_state"],
        is_leaf=lambda x: isinstance(x, gm.GaussianParams))
    with open(path, "wb") as f:
        pickle.dump(payload, f)

    g2 = gm.GaussianModel(sh_degree=1)
    g2.params, g2.state = _tiny_model(n=30, capacity=32)
    t2 = train_loop.Trainer(gaussians=g2, cameras_extent=1.0)
    t2.settings = trainer.settings
    assert t2.restore_checkpoint(path) == 3
    m = t2.step(cam, gt, 4)          # must not raise a shape error
    assert np.isfinite(float(m["loss"]))
    # and the restored trajectory matches the uninterrupted one
    m_a = trainer.step(cam, gt, 4)
    assert float(m["loss"]) == pytest.approx(float(m_a["loss"]), abs=1e-7)
