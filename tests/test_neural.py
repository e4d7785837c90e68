"""Neural-feature pipeline tests: idxmap z-buffer, PE, decoders, training."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuralgaussiansplatting_tpu.ops import idxmap as idxmap_ops
from neuralgaussiansplatting_tpu.ops import projection as proj
from neuralgaussiansplatting_tpu.models import gaussians as gm
from neuralgaussiansplatting_tpu.models import nets
from neuralgaussiansplatting_tpu import gaussian_renderer as gr
from neuralgaussiansplatting_tpu.train import neural_loop

from scenes import make_camera, random_gaussians


def test_positional_encoding_layout():
    d = jnp.asarray([[0.3, -0.5, 0.8]])
    pe = np.asarray(idxmap_ops.positional_encoding_3d(d))[0]
    assert pe.shape == (24,)
    # dim-major [dim][freq][sin,cos] per rasterizer_impl.cu:26-42
    for dim, x in enumerate([0.3, -0.5, 0.8]):
        for f in range(4):
            base = dim * 8 + f * 2
            np.testing.assert_allclose(pe[base], np.sin(2 ** f * np.pi * x),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(pe[base + 1], np.cos(2 ** f * np.pi * x),
                                       rtol=1e-5, atol=1e-6)


def test_idxmap_picks_closest():
    cam = make_camera(W=32, H=32)
    # two points projecting to the image center at different depths
    near = np.array([[0.0, 0.0, 0.0]])
    far_off = -np.asarray(cam.campos) / np.linalg.norm(cam.campos)
    far = near + far_off[None, :] * 1.0  # further along the view ray
    means = jnp.asarray(np.concatenate([far, near]).astype(np.float32))
    idx, depth, _ = idxmap_ops.compute_idxmap(means, cam, capacity=4096)
    idx = np.asarray(idx).reshape(32, 32)
    # center pixel must be won by the nearer point (index 1)
    cx = cy = 16
    region = idx[cy - 2:cy + 2, cx - 2:cx + 2]
    assert (region == 1).any()
    assert not (region == 0).any()  # the far point never wins where near covers
    d = np.asarray(depth)
    assert d[1] < d[0]


def test_idxmap_miss_is_minus_one():
    cam = make_camera(W=16, H=16)
    means = jnp.asarray(np.full((5, 3), 50.0, np.float32))  # off-screen
    idx, _, _ = idxmap_ops.compute_idxmap(means, cam, capacity=512)
    assert (np.asarray(idx) == -1).all()


def test_featuremap_contents():
    cam = make_camera(W=24, H=24)
    means, scales, rot, opac, shs = random_gaussians(n=50, deg=0, seed=1)
    feats = np.random.default_rng(2).normal(
        size=(50, 64)).astype(np.float32)
    maps = idxmap_ops.render_idxmaps(
        jnp.asarray(means), jnp.asarray(feats), cam, capacity=1 << 14)
    idx = np.asarray(maps.idxmap)
    fmap = np.asarray(maps.featuremap)
    hit = idx >= 0
    assert hit.any()
    ys, xs = np.nonzero(hit)
    y, x = ys[0], xs[0]
    g = idx[y, x]
    # feature[0] = depth
    assert fmap[y, x, 0] == pytest.approx(np.asarray(maps.depthmap)[y, x])
    # dims 25..63 copy the winner's feature vector
    np.testing.assert_allclose(fmap[y, x, 25:], feats[g, 25:], rtol=1e-6)
    # colmap is the normalized view direction
    d = means[g] - np.asarray(cam.campos)
    d = d / np.linalg.norm(d)
    np.testing.assert_allclose(np.asarray(maps.colmap)[y, x], d, atol=1e-5)
    # misses are zero
    assert (fmap[~hit] == 0).all()


def test_feature_gradients_flow_and_geometry_frozen():
    cam = make_camera(W=16, H=16)
    means, *_ = random_gaussians(n=30, deg=0, seed=4)
    feats = jnp.asarray(np.random.default_rng(5).normal(
        size=(30, 64)).astype(np.float32))

    def loss(f, m):
        maps = idxmap_ops.render_idxmaps(m, f, cam, capacity=4096)
        return jnp.sum(maps.featuremap ** 2)

    gf, gm_ = jax.grad(loss, argnums=(0, 1))(feats, jnp.asarray(means))
    gf, gm_ = np.asarray(gf), np.asarray(gm_)
    assert np.abs(gf[:, 25:]).max() > 0        # features train
    assert (gf[:, :25] == 0).all()             # PE/depth dims don't
    assert (gm_ == 0).all()                    # geometry frozen (ref parity)


def test_denoiser_identity_kernel():
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.random((12, 12, 3)).astype(np.float32))
    kernels = np.zeros((12, 12, 81), np.float32)
    kernels[:, :, 40] = 1.0  # center tap of the 9x9 kernel
    out = nets.denoise(img, jnp.asarray(kernels))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_decoder_shapes():
    key = jax.random.PRNGKey(0)
    p = gr.init_decoders(key)
    x = jnp.zeros((32, 32, 64))
    assert nets.FeatureToRGBMLP().apply(p["mlp"], x).shape == (32, 32, 3)
    assert nets.UNet().apply(p["unet"], x).shape == (32, 32, 3)
    assert nets.CNN().apply(p["cnn"], x).shape == (32, 32, 81)
    assert nets.PureCNN().apply(p["pure_cnn"], x).shape == (32, 32, 3)


@pytest.mark.parametrize("sw", [1, 2, 3])
def test_neural_render_paths(sw):
    cam = make_camera(W=16, H=16)
    means, scales, rot, opac, shs = random_gaussians(n=40, deg=0, seed=8)
    params, state = gm.create_from_pcd(
        means, np.random.rand(40, 3), np.zeros((40, 3)), 0, capacity=64)
    net_params = gr.init_decoders(jax.random.PRNGKey(1))
    out = neural_loop.RENDER_FNS[sw](cam, params, net_params, capacity=4096)
    assert out["render"].shape == (3, 16, 16)
    assert np.isfinite(np.asarray(out["render"])).all()


def test_neural_training_reduces_loss():
    cam = make_camera(W=16, H=16)
    means, *_ = random_gaussians(n=60, deg=0, seed=9)
    g = gm.GaussianModel(sh_degree=0)
    g.params, g.state = gm.create_from_pcd(
        means, np.random.rand(60, 3), np.zeros((60, 3)), 0, capacity=64)
    trainer = neural_loop.NeuralTrainer(g, sw=1, capacity=4096)
    gt = jnp.asarray(np.random.default_rng(10).random(
        (3, 16, 16)).astype(np.float32) * 0.2 + 0.4)
    losses_seen = [float(trainer.step(cam, gt)["loss"]) for _ in range(60)]
    assert np.mean(losses_seen[-5:]) < np.mean(losses_seen[:5]) * 0.8


def test_neural_trainer_mixed_precision():
    cam = make_camera(W=16, H=16)
    means, *_ = random_gaussians(n=30, deg=0, seed=12)
    g = gm.GaussianModel(sh_degree=0)
    g.params, g.state = gm.create_from_pcd(
        means, np.random.rand(30, 3), np.zeros((30, 3)), 0, capacity=32)
    trainer = neural_loop.NeuralTrainer(g, sw=2, capacity=2048,
                                        mixed_precision=True)
    gt = jnp.full((3, 16, 16), 0.5)
    m = trainer.step(cam, gt)
    assert np.isfinite(float(m["loss"]))


def test_idxmap_alive_mask_excludes_padding():
    cam = make_camera(W=16, H=16)
    # one real gaussian off to the side; padding slots sit at the origin
    # (screen center) and must NOT win any pixel when masked
    means = np.array([[0.6, 0.6, 0.0]], np.float32)
    params, state = gm.create_from_pcd(
        means, np.random.rand(1, 3), np.zeros((1, 3)), 0, capacity=64)
    idx, _, _ = idxmap_ops.compute_idxmap(
        params.xyz, cam, capacity=4096, alive=state.alive)
    idx = np.asarray(idx)
    assert set(np.unique(idx)).issubset({-1, 0})
    # without the mask, origin-sitting padding slots would win center pixels
    idx2, _, _ = idxmap_ops.compute_idxmap(params.xyz, cam, capacity=4096)
    assert (np.unique(np.asarray(idx2)) > 0).any()
