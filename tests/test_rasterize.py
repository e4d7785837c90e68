"""End-to-end rasterizer tests vs the independent numpy oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuralgaussiansplatting_tpu.ops import rasterize as rast
from neuralgaussiansplatting_tpu.ops.preprocess import preprocess_gaussians
from neuralgaussiansplatting_tpu.ops import binning

from scenes import make_camera, random_gaussians
import oracle


# precise_cull off: these tests gate the strict reference semantics
# including exact n_contrib indices, which the (image/grad-exact) cull
# legitimately renumbers — the cull has its own oracle gate in
# tests/test_blend_pallas.py::test_precise_cull_conservative_per_pixel
# Pinned 16x16 tiles: these tests gate against the numpy per-pixel oracle
# (tests/oracle.py), whose contributor sets replicate the reference's
# 16x16 rect truncation; the production default is 32x32 (backend="seq").
SETTINGS = rast.RasterizeSettings(capacity=1 << 15, max_per_tile=512, chunk=16,
                                  block_x=16, block_y=16,
                                  precise_cull=False)


def _render_both(W=40, H=24, n=200, deg=2, seed=0, bg=(0.0, 0.0, 0.0)):
    cam = make_camera(W=W, H=H)
    means, scales, rot, opac, shs = random_gaussians(n=n, deg=deg, seed=seed)
    bg = np.asarray(bg, np.float32)

    out = rast.rasterize(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rot),
        jnp.asarray(opac), jnp.asarray(shs), deg, cam, jnp.asarray(bg),
        SETTINGS,
    )

    splats = oracle.preprocess_np(
        means, scales, rot, opac, shs, deg,
        np.asarray(cam.view), np.asarray(cam.full_proj),
        np.asarray(cam.campos), cam.tan_fovx, cam.tan_fovy, W, H)
    img_np, final_t_np, n_contrib_np = oracle.render_np(splats, W, H, bg)
    return out, img_np, final_t_np, n_contrib_np


def test_matches_oracle_black_bg():
    out, img_np, final_t_np, n_contrib_np = _render_both()
    got = np.transpose(np.asarray(out.color), (1, 2, 0))
    np.testing.assert_allclose(got, img_np, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.final_t), final_t_np, atol=2e-5)
    assert (np.asarray(out.n_contrib) == n_contrib_np).mean() > 0.999


def test_matches_oracle_white_bg_deg3():
    out, img_np, _, _ = _render_both(n=120, deg=3, seed=7, bg=(1, 1, 1))
    got = np.transpose(np.asarray(out.color), (1, 2, 0))
    np.testing.assert_allclose(got, img_np, atol=2e-4)


def test_dense_opaque_scene_early_stop():
    # opacities near 1 force the T < 1e-4 stop path
    cam = make_camera(W=32, H=32)
    means, scales, rot, opac, shs = random_gaussians(n=400, deg=0, seed=3)
    opac = np.full_like(opac, 0.995)
    out = rast.rasterize(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rot),
        jnp.asarray(opac), jnp.asarray(shs), 0, cam,
        jnp.zeros(3), SETTINGS)
    splats = oracle.preprocess_np(
        means, scales, rot, opac, shs, 0,
        np.asarray(cam.view), np.asarray(cam.full_proj),
        np.asarray(cam.campos), cam.tan_fovx, cam.tan_fovy, 32, 32)
    img_np, final_t_np, _ = oracle.render_np(splats, 32, 32, np.zeros(3))
    got = np.transpose(np.asarray(out.color), (1, 2, 0))
    np.testing.assert_allclose(got, img_np, atol=3e-4)
    np.testing.assert_allclose(np.asarray(out.final_t), final_t_np, atol=1e-5)


def test_empty_scene_renders_background():
    cam = make_camera(W=32, H=16)
    n, deg = 10, 0
    means = np.full((n, 3), 100.0, np.float32)  # far behind the camera
    out = rast.rasterize(
        jnp.asarray(means), jnp.full((n, 3), 0.01),
        jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1)),
        jnp.full((n,), 0.5), jnp.zeros((n, 1, 3)), deg, cam,
        jnp.asarray([0.2, 0.4, 0.6]), SETTINGS)
    img = np.transpose(np.asarray(out.color), (1, 2, 0))
    np.testing.assert_allclose(img, np.broadcast_to([0.2, 0.4, 0.6], img.shape),
                               atol=1e-6)
    assert np.all(np.asarray(out.radii) == 0)


def test_binning_counts_match_rects():
    cam = make_camera(W=40, H=24)
    means, scales, rot, opac, shs = random_gaussians(n=150, deg=0, seed=5)
    pre = preprocess_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rot),
        jnp.asarray(opac), jnp.asarray(shs), 0, cam, 16, 16)
    tiles_x, tiles_y = 3, 2
    align = 16
    inst = binning.bin_gaussians(pre, tiles_x, tiles_y, 1 << 14, 1 << 12, align)
    want = int(np.asarray(pre.tiles_touched).sum())
    assert int(inst.num_rendered) == want
    assert int(np.asarray(inst.valid).sum()) == want
    assert int(np.asarray(inst.tile_count).sum()) == want
    # aligned layout invariants + depth order within every tile
    start = np.asarray(inst.tile_start)
    count = np.asarray(inst.tile_count)
    gid = np.asarray(inst.gid)
    valid = np.asarray(inst.valid)
    depths = np.asarray(pre.depths)
    n = depths.shape[0]
    assert np.all(start % align == 0)
    for t in range(tiles_x * tiles_y):
        seg = gid[start[t]:start[t] + count[t]]
        assert np.all(seg < n)
        assert np.all(valid[start[t]:start[t] + count[t]])
        d = depths[seg]
        assert np.all(np.diff(d) >= 0)
    # padding slots have sentinel gid
    assert np.all(gid[~valid] == n)


def test_jit_and_grads_finite():
    cam = make_camera(W=32, H=32)
    means, scales, rot, opac, shs = random_gaussians(n=100, deg=1, seed=9)

    def loss_fn(means, scales, rot, opac, shs, off):
        out = rast.rasterize(
            means, scales, rot, opac, shs, 1, cam, jnp.zeros(3), SETTINGS,
            means2d_offset=off)
        return jnp.sum(out.color ** 2)

    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rot),
            jnp.asarray(opac), jnp.asarray(shs),
            jnp.zeros((100, 2)))
    grads = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5)))(*args)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
    # the scene is visible, so gradients must be non-trivial
    assert np.abs(np.asarray(grads[0])).max() > 0
    assert np.abs(np.asarray(grads[5])).max() > 0  # screen-space stats grad


def test_opacity_grad_matches_finite_difference():
    cam = make_camera(W=24, H=24)
    means, scales, rot, opac, shs = random_gaussians(n=40, deg=0, seed=11)

    def loss_fn(o):
        out = rast.rasterize(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rot),
            o, jnp.asarray(shs), 0, cam, jnp.zeros(3), SETTINGS)
        return jnp.sum(out.color)

    g = np.asarray(jax.grad(loss_fn)(jnp.asarray(opac)))
    eps = 1e-3
    rng = np.random.default_rng(0)
    for i in rng.choice(40, 5, replace=False):
        op = opac.copy()
        op[i] += eps
        up = float(loss_fn(jnp.asarray(op)))
        op[i] -= 2 * eps
        dn = float(loss_fn(jnp.asarray(op)))
        fd = (up - dn) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=5e-2, atol=5e-3)


def test_capacity_overflow_reported():
    cam = make_camera(W=40, H=24)
    means, scales, rot, opac, shs = random_gaussians(n=500, deg=0, seed=13)
    small = rast.RasterizeSettings(capacity=64, max_per_tile=64, chunk=16)
    out = rast.rasterize(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rot),
        jnp.asarray(opac), jnp.asarray(shs), 0, cam, jnp.zeros(3), small)
    assert int(out.num_rendered) > 64  # true demand reported despite the cap


def test_precomp_paths_match():
    """The A/B oracle flags (python SH / python cov3d) must not change
    output (reference uses them to cross-check the CUDA kernels)."""
    from neuralgaussiansplatting_tpu.models import gaussians as gmod
    from neuralgaussiansplatting_tpu.gaussian_renderer import render as render_fn
    cam = make_camera(W=32, H=24)
    means, scales, rot, opac, shs = random_gaussians(n=80, deg=2, seed=17)
    params, state = gmod.create_from_pcd(
        means, np.random.default_rng(0).random((80, 3)), np.zeros((80, 3)),
        2, capacity=96)
    def pad(a):
        return np.pad(a, [(0, 96 - a.shape[0])] + [(0, 0)] * (a.ndim - 1))
    params = params._replace(
        scaling=jnp.asarray(pad(np.log(scales))),
        rotation=jnp.asarray(np.concatenate(
            [rot, np.tile([1, 0, 0, 0], (16, 1))]).astype(np.float32)),
        features_rest=jnp.asarray(pad(shs[:, 1:].reshape(len(shs), -1))),
    )
    bg = jnp.asarray([0.3, 0.2, 0.1])
    base = render_fn(cam, params, state.alive, 2, bg, SETTINGS)
    alt = render_fn(cam, params, state.alive, 2, bg, SETTINGS,
                    convert_shs_python=True, compute_cov3d_python=True)
    np.testing.assert_allclose(np.asarray(alt["render"]),
                               np.asarray(base["render"]), atol=1e-5)


def test_mark_visible():
    cam = make_camera(W=32, H=32, dist=4.0)
    pts = np.array([[0.0, 0, 0],     # in front
                    [100.0, 0, 0],   # far behind the camera plane
                    ], np.float32)
    # a point behind the camera: move along the camera's backward direction
    behind = np.asarray(cam.campos) * 2.0
    pts = np.concatenate([pts, behind[None]]).astype(np.float32)
    vis = np.asarray(rast.mark_visible(jnp.asarray(pts), cam))
    assert vis[0]
    assert not vis[2]


def test_fast_sort_close_to_exact():
    cam = make_camera(W=40, H=24)
    means, scales, rot, opac, shs = random_gaussians(n=200, deg=1, seed=23)
    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rot),
            jnp.asarray(opac), jnp.asarray(shs))
    exact = rast.rasterize(*args, 1, cam, jnp.zeros(3), SETTINGS)
    fast = rast.rasterize(*args, 1, cam, jnp.zeros(3),
                          rast.RasterizeSettings(
                              capacity=1 << 15, max_per_tile=512, chunk=16,
                              fast_sort=True))
    a, b = np.asarray(exact.color), np.asarray(fast.color)
    mse = ((a - b) ** 2).mean()
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 45.0, psnr


def test_degenerate_gaussians_keep_finite_gradients():
    """Rows at the camera plane / at the camera center / with giant scales
    must never produce NaN gradients (they are culled in forward, but an
    unguarded VJP would poison alive rows under Adam)."""
    cam = make_camera(W=24, H=24, dist=4.0)
    campos = np.asarray(cam.campos)
    n = 12
    rng = np.random.default_rng(0)
    means = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    means[0] = campos                       # exactly at the camera
    means[1] = campos + 1e-6                # epsilon off the camera
    means[2] = campos * (1 - 0.2 / 4.0)     # near-plane neighborhood
    means[3] = campos * 2.0                 # behind the camera
    scales = rng.uniform(0.02, 0.1, (n, 3)).astype(np.float32)
    scales[4] = 1e9                         # giant splat (overflow chain)
    scales[5] = 1e-12                       # degenerate small
    rot = rng.normal(size=(n, 4)).astype(np.float32)
    rot[6] = 0.0                            # zero quaternion
    opac = rng.uniform(0.3, 0.9, n).astype(np.float32)
    shs = rng.normal(size=(n, 4, 3)).astype(np.float32)

    def loss_fn(means, scales, rot, opac, shs):
        out = rast.rasterize(
            means, scales, rot, opac, shs, 1, cam, jnp.zeros(3), SETTINGS)
        return jnp.sum(out.color ** 2) + jnp.sum(out.final_t)

    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rot),
        jnp.asarray(opac), jnp.asarray(shs))
    for name, g in zip(["means", "scales", "rot", "opac", "shs"], grads):
        assert np.isfinite(np.asarray(g)).all(), name


def test_dead_padding_slots_never_bin():
    """Capacity-padding slots (opacity forced to 0) must not produce
    instances: they would waste buffer space and evict real Gaussians from
    per-tile caps."""
    from neuralgaussiansplatting_tpu.models import gaussians as gmod
    cam = make_camera(W=32, H=32)
    means, scales, rot, opac, shs = random_gaussians(n=20, deg=0, seed=31)
    params, state = gmod.create_from_pcd(
        means, np.random.default_rng(0).random((20, 3)), np.zeros((20, 3)),
        0, capacity=512)  # 492 dead slots at the origin with exp(0)=1 scales
    from neuralgaussiansplatting_tpu.gaussian_renderer import render as rfn
    out = rfn(cam, params, state.alive, 0, jnp.zeros(3), SETTINGS)
    # only the 20 alive gaussians may contribute instances
    pre_only_alive = rast.rasterize(
        jnp.asarray(means), jnp.asarray(np.exp(np.asarray(params.scaling))[:20]),
        jnp.asarray(np.asarray(params.rotation)[:20]),
        jnp.full(20, 0.1), jnp.asarray(np.asarray(
            gmod.get_features(params))[:20]), 0, cam, jnp.zeros(3), SETTINGS)
    assert int(out["num_rendered"]) == int(pre_only_alive.num_rendered)


def test_tight_culling_image_and_grad_exact():
    """Opacity-adaptive tight rects + a split packed buffer must reproduce
    the reference-rect render exactly up to f32 reassociation: the dropped
    instances all fail the kernel's alpha >= 1/255 cutoff (forward.cu:351),
    so they contribute zero in forward AND backward."""
    cam = make_camera(W=64, H=48)
    means, scales, rot, opac, shs = random_gaussians(n=250, deg=1, seed=11)
    # mix in very low opacities to exercise the adaptive extents
    opac = np.asarray(opac).copy()
    opac[::3] = 0.01
    opac[1::7] = 0.003  # below 1/255: contributes nothing anywhere

    # precise_cull off on both sides: this test isolates the tight-rect
    # optimization; the per-instance cull shifts chunk partitions and adds
    # its own (tested-elsewhere) reassociation noise
    loose = rast.RasterizeSettings(capacity=1 << 15, max_per_tile=512,
                                   chunk=16, precise_cull=False)
    tight = rast.RasterizeSettings(capacity=1 << 15, max_per_tile=512,
                                   chunk=16, tight_culling=True,
                                   precise_cull=False,
                                   packed_capacity=(1 << 14) + (1 << 13))

    def run(settings):
        # grad_reduce="scatter" on both sides: the property under test is
        # the CULL's exactness; the sort-form reduction's cumsum-difference
        # cancellation noise (gated elsewhere) would otherwise dominate the
        # comparison for near-zero gradients.
        import dataclasses as _dc
        settings = _dc.replace(settings, grad_reduce="scatter")

        def loss_fn(m, s, r, o, sh):
            out = rast.rasterize(m, s, r, o, sh, 1, cam, jnp.zeros(3),
                                 settings)
            return jnp.sum(out.color ** 2) + jnp.sum(out.final_t ** 2)
        args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rot),
                jnp.asarray(opac), jnp.asarray(shs))
        out = rast.rasterize(*args, 1, cam, jnp.zeros(3), settings)
        grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(*args)
        return out, grads

    out_l, g_l = run(loose)
    out_t, g_t = run(tight)
    assert int(out_t.num_rendered) < int(out_l.num_rendered)
    np.testing.assert_allclose(np.asarray(out_t.color),
                               np.asarray(out_l.color), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_t.final_t),
                               np.asarray(out_l.final_t), atol=1e-5)
    # radii/visibility keep reference semantics regardless of tight culling
    np.testing.assert_array_equal(np.asarray(out_t.radii),
                                  np.asarray(out_l.radii))
    for a, b in zip(g_l, g_t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_blocked_cumsum_matches_flat_wrapping():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(-2**31, 2**31 - 1, size=(5000, 3),
                                 dtype=np.int64).astype(np.int32))
    want = np.cumsum(np.asarray(x, np.int64), axis=0).astype(np.uint64)
    got = np.asarray(binning._blocked_cumsum(x, block=256)).astype(np.uint64)
    assert np.array_equal(want % (1 << 32), got % (1 << 32))


def test_gather_aligned_runs_matches_plain_gather():
    rng = np.random.default_rng(7)
    for block in (8, 32, 128):
        cap = 4096 + 24            # deliberately not a block multiple
        kcap = 64 * block
        values = jnp.asarray(
            rng.integers(0, 1 << 30, size=cap, dtype=np.int64).astype(np.int32))
        # piecewise-contiguous src: every output block reads one run
        base = rng.integers(0, cap - 2 * block, size=kcap // block,
                            endpoint=True).astype(np.int32)
        src = (base[:, None] + np.arange(block)[None, :]).reshape(-1)
        got = np.asarray(binning._gather_aligned_runs(
            values, jnp.asarray(base), block))
        want = np.asarray(values)[src]
        assert np.array_equal(got, want), f"block={block}"


def test_gather_aligned_runs_clamps_out_of_range_base():
    values = jnp.arange(256, dtype=jnp.int32)
    base = jnp.asarray([0, 10_000, -5], jnp.int32)  # callers mask via `valid`
    out = np.asarray(binning._gather_aligned_runs(values, base, 8))
    assert out.shape == (24,)
    assert np.array_equal(out[:8], np.arange(8))  # in-range block is exact


def test_dense_expansion_matches_scatter():
    """expand='dense' (capped per-gaussian slots, no scatter) must produce
    the same image and gradients as the scatter expansion when the cap
    covers every run; with a tight cap it drops the excess and reports it."""
    import dataclasses
    from scenes import make_camera, random_gaussians

    cam = make_camera(W=48, H=48)
    means, scales, rot, opac, shs = random_gaussians(n=150, deg=1, seed=41)
    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rot),
            jnp.asarray(opac), jnp.asarray(shs))
    base = rast.RasterizeSettings(capacity=1 << 13, max_per_tile=512, chunk=8,
                                  block_x=16, block_y=16,
                                  backend="xla", tight_culling=True)
    dense = dataclasses.replace(base, expand="dense", dense_cap=64)
    bg = jnp.asarray([0.2, 0.1, 0.3])

    o_s = rast.rasterize(*args, 1, cam, bg, base)
    o_d = rast.rasterize(*args, 1, cam, bg, dense)
    assert int(o_d.dropped) == 0
    assert int(o_d.num_rendered) == int(o_s.num_rendered)
    np.testing.assert_allclose(np.asarray(o_d.color), np.asarray(o_s.color),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(o_d.final_t),
                               np.asarray(o_s.final_t), atol=2e-6)

    gt = jnp.zeros((3, cam.height, cam.width))

    def grads(settings):
        def f(means, scales, rot, opac, shs):
            out = rast.rasterize(means, scales, rot, opac, shs, 1, cam, bg,
                                 settings)
            return jnp.sum((out.color - gt) ** 2) + jnp.sum(out.final_t)
        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(*args)

    gs = grads(dataclasses.replace(base, grad_reduce="scatter"))
    gd = grads(dataclasses.replace(dense, grad_reduce="auto"))
    for name, a, b in zip(["means", "scales", "rot", "opac", "shs"], gs, gd):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b, a, atol=2e-5 * scale, rtol=1e-3,
                                   err_msg=name)

    # precise_cull variant agrees too (dense uses raw f32 intervals)
    pc_s = dataclasses.replace(base, precise_cull=True)
    pc_d = dataclasses.replace(dense, precise_cull=True)
    o_ps = rast.rasterize(*args, 1, cam, bg, pc_s)
    o_pd = rast.rasterize(*args, 1, cam, bg, pc_d)
    np.testing.assert_allclose(np.asarray(o_pd.color),
                               np.asarray(o_ps.color), atol=2e-6)
    assert int(o_pd.culled) > 0

    # tight cap: drops counted, render still finite and close
    tight = dataclasses.replace(dense, dense_cap=1)
    o_t = rast.rasterize(*args, 1, cam, bg, tight)
    assert int(o_t.dropped) > 0
    assert np.isfinite(np.asarray(o_t.color)).all()
