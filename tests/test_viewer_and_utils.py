"""Tests: network_gui wire protocol (loopback), video/image utils, distributed helpers."""

import json
import math
import os
import socket
import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuralgaussiansplatting_tpu.viewer import network_gui
from neuralgaussiansplatting_tpu.utils import image as image_utils
from neuralgaussiansplatting_tpu.utils import video as video_utils
from neuralgaussiansplatting_tpu.utils import feature_analysis
from neuralgaussiansplatting_tpu.utils import losses
from neuralgaussiansplatting_tpu.parallel import distributed

from scenes import make_camera


def test_network_gui_roundtrip():
    network_gui.init("127.0.0.1", 0)
    port = network_gui.listener.getsockname()[1]

    # fake SIBR viewer client
    cam = make_camera(W=32, H=24)
    wv = np.asarray(cam.world_view_transform if hasattr(
        cam, "world_view_transform") else cam.view)
    # viewer wire format: transposed storage with columns 1,2 negated
    wv_wire = np.asarray(cam.view).T.copy()
    wv_wire[:, 1] *= -1
    wv_wire[:, 2] *= -1
    fp_wire = np.asarray(cam.full_proj).T.copy()
    fp_wire[:, 1] *= -1

    msg = {
        "resolution_x": 32, "resolution_y": 24,
        "train": True, "fov_y": cam.tan_fovy and 0.6, "fov_x": 0.8,
        "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False,
        "keep_alive": True, "scaling_modifier": 1.0,
        "view_matrix": wv_wire.reshape(-1).tolist(),
        "view_projection_matrix": fp_wire.reshape(-1).tolist(),
    }

    received = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port), timeout=5)
        payload = json.dumps(msg).encode()
        s.sendall(len(payload).to_bytes(4, "little") + payload)
        img = s.recv(32 * 24 * 3, socket.MSG_WAITALL)
        n = int.from_bytes(s.recv(4), "little")
        verify = s.recv(n).decode("ascii")
        received["img_len"] = len(img)
        received["verify"] = verify
        s.close()

    t = threading.Thread(target=client)
    t.start()
    for _ in range(100):
        network_gui.try_connect()
        if network_gui.conn is not None:
            break
    assert network_gui.conn is not None
    out = network_gui.receive()
    cam_v, do_training, _, _, keep_alive, scaling = out
    assert cam_v is not None and do_training and keep_alive
    assert cam_v.width == 32 and cam_v.height == 24
    # the reconstructed view matrix matches ours
    np.testing.assert_allclose(np.asarray(cam_v.view), np.asarray(cam.view),
                               atol=1e-5)
    img = np.random.default_rng(0).random((3, 24, 32)).astype(np.float32)
    network_gui.send(network_gui.render_to_bytes(img), "source/path")
    t.join(timeout=5)
    assert received["img_len"] == 32 * 24 * 3
    assert received["verify"] == "source/path"
    network_gui.conn.close()
    network_gui.conn = None


def test_make_grid_and_psnr():
    imgs = [np.random.default_rng(i).random((8, 10, 3)) for i in range(5)]
    grid = image_utils.make_grid(imgs, cols=3)
    assert grid.shape[0] >= 16 and grid.shape[1] >= 30
    assert image_utils.psnr(imgs[0], imgs[0]) == float("inf")
    assert image_utils.mse(imgs[0], imgs[1]) > 0


def test_video_frames_and_mp4(tmp_path):
    import types
    from neuralgaussiansplatting_tpu.models import gaussians as gm
    from neuralgaussiansplatting_tpu import gaussian_renderer as gr
    from scenes import random_gaussians
    from neuralgaussiansplatting_tpu.scene.cameras import Camera

    means, *_ = random_gaussians(n=30, deg=0, seed=0)
    g = gm.GaussianModel(0)
    g.params, g.state = gm.create_from_pcd(
        means, np.random.rand(30, 3), np.zeros((30, 3)), 0, capacity=32)
    net_params = gr.init_decoders(jax.random.PRNGKey(0))

    cp = make_camera(W=16, H=16)
    cam = types.SimpleNamespace(params=lambda: cp)
    scene = types.SimpleNamespace(get_video_cameras=lambda scale=1.0: [cam, cam])
    frames = video_utils.render_video_frames(
        scene, g, net_params, 10, str(tmp_path), sw=1,
        modes=("rgb", "depth"), archive_every=1)
    assert len(frames) == 4
    arch = os.path.join(str(tmp_path), "video", "iter_10", "archive_0000.npz")
    assert os.path.exists(arch)
    with np.load(arch) as z:
        assert z["featuremap"].shape == (16, 16, 64)

    mp4 = video_utils.create_video_from_frames(
        os.path.join(str(tmp_path), "video", "iter_10", "rgb"),
        str(tmp_path / "out.mp4"))
    assert mp4 and os.path.getsize(mp4) > 0

    video_utils.save_depth_histogram(
        np.random.rand(16, 16), str(tmp_path / "dh.png"))
    assert os.path.exists(tmp_path / "dh.png")


def test_feature_analysis_outputs(tmp_path):
    feats = np.random.default_rng(0).normal(size=(100, 64)).astype(np.float32)
    p = feature_analysis.analyze_gaussian_features(feats, 5, str(tmp_path))
    assert os.path.exists(p)
    feature_analysis.analyze_gaussian_features(feats * 2, 10, str(tmp_path))
    plots = feature_analysis.plot_feature_distributions(feats, 5, str(tmp_path))
    assert all(os.path.exists(x) for x in plots)
    trend = feature_analysis.plot_history_trends(str(tmp_path))
    assert trend and os.path.exists(trend)
    dens = feature_analysis.plot_density(feats, 5, str(tmp_path))
    assert dens and os.path.exists(dens)
    p64 = feature_analysis.plot_64d_analysis(feats, 5, str(tmp_path))
    assert p64 and os.path.exists(p64)
    assert os.path.exists(os.path.join(
        str(tmp_path), "feature_analysis", "64d_detailed_stats_iter_5.txt"))


def test_distributed_single_process():
    distributed.initialize()
    mesh = distributed.make_global_mesh(n_tile=2)
    assert dict(mesh.shape) == {"data": 4, "tile": 2}
    start, size = distributed.process_local_batch_slice(16)
    assert (start, size) == (0, 16)
    tree = distributed.host_broadcast_pytree({"a": 1})
    assert tree["a"] == 1
    distributed.assert_synchronized(42)


def test_lpips_with_random_weights(tmp_path, monkeypatch):
    from neuralgaussiansplatting_tpu.utils import lpips as lpips_mod
    rng = np.random.default_rng(0)
    # synthesize a weight file matching the expected schema
    out = {}
    cin = 3
    li = 0
    for c, n_convs in lpips_mod.VGG16_STAGES:
        for _ in range(n_convs):
            out[f"conv{li}_w"] = rng.normal(
                scale=0.05, size=(3, 3, cin, c)).astype(np.float32)
            out[f"conv{li}_b"] = np.zeros(c, np.float32)
            cin = c
            li += 1
    for i, (c, _) in enumerate(lpips_mod.VGG16_STAGES):
        out[f"lin{i}_w"] = np.full(c, 1.0 / c, np.float32)
    path = str(tmp_path / "w.npz")
    np.savez(path, **out)
    monkeypatch.setenv("NGS_LPIPS_WEIGHTS", path)
    lpips_mod._load_params.cache_clear()
    fn = lpips_mod.lpips_fn("vgg")
    assert fn is not None
    a = rng.random((3, 32, 32)).astype(np.float32)
    b = rng.random((3, 32, 32)).astype(np.float32)
    assert fn(a, a) == pytest.approx(0.0, abs=1e-6)
    assert fn(a, b) > 0
    monkeypatch.delenv("NGS_LPIPS_WEIGHTS")
    lpips_mod._load_params.cache_clear()
