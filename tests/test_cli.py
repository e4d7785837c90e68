"""End-to-end CLI smoke: train.py -> render.py -> metrics.py on a tiny scene."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from test_scene import _make_blender_scene
from neuralgaussiansplatting_tpu.scene import ply as ply_io

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, timeout=420):
    env = dict(os.environ)
    env["NGS_PLATFORM"] = "cpu"
    r = subprocess.run([sys.executable] + cmd, cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, f"{cmd}\nSTDOUT:{r.stdout[-2000:]}\nSTDERR:{r.stderr[-3000:]}"
    return r


@pytest.mark.slow
def test_train_render_metrics_cli(tmp_path):
    src = str(tmp_path / "scene")
    model = str(tmp_path / "model")
    _make_blender_scene(src, n_frames=6, size=32)
    rng = np.random.default_rng(0)
    ply_io.store_point_cloud(os.path.join(src, "points3d.ply"),
                             rng.normal(size=(200, 3)) * 0.8,
                             rng.random((200, 3)))

    _run(["train.py", "-s", src, "-m", model, "--eval", "--iterations", "25",
          "--test_iterations", "25", "--save_iterations", "25",
          "--checkpoint_iterations", "25",
          "--model_capacity", "512", "--capacity", "8192", "--backend", "xla",
          "--disable_viewer", "--quiet"])
    assert os.path.exists(os.path.join(
        model, "point_cloud", "iteration_25", "point_cloud.ply"))
    assert os.path.exists(os.path.join(model, "chkpnt25.ckpt"))
    assert os.path.exists(os.path.join(model, "cfg_args"))
    assert os.path.exists(os.path.join(model, "cfg_args.json"))
    assert os.path.exists(os.path.join(model, "cameras.json"))
    assert os.path.exists(os.path.join(model, "input.ply"))

    _run(["render.py", "-m", model, "--skip_train", "--backend", "xla"])
    renders = os.path.join(model, "test", "ours_25", "renders")
    assert len(os.listdir(renders)) > 0

    _run(["metrics.py", "-m", model])
    with open(os.path.join(model, "results.json")) as f:
        res = json.load(f)
    m = res["ours_25"]
    assert "PSNR" in m and np.isfinite(m["PSNR"])
    assert "SSIM" in m and np.isfinite(m["SSIM"])
    assert os.path.exists(os.path.join(model, "per_view.json"))


@pytest.mark.slow
def test_trainn_cli(tmp_path):
    src = str(tmp_path / "scene")
    model = str(tmp_path / "modeln")
    _make_blender_scene(src, n_frames=4, size=32)
    rng = np.random.default_rng(1)
    ply_io.store_point_cloud(os.path.join(src, "points3d.ply"),
                             rng.normal(size=(150, 3)) * 0.8,
                             rng.random((150, 3)))
    _run(["trainn.py", "-s", src, "-m", model, "--iterations", "8",
          "--sw", "1", "--save_iterations", "8",
          "--video_interval", "0", "--analysis_interval", "4",
          "--model_capacity", "256"])
    assert os.path.exists(os.path.join(
        model, "point_cloud", "iteration_8", "point_cloud.ply"))
    fa = os.path.join(model, "feature_analysis")
    assert os.path.exists(os.path.join(fa, "history.csv"))


@pytest.mark.slow
def test_train_colmap_scene_cli(tmp_path):
    """COLMAP-layout dataset through the full train.py CLI."""
    import struct
    from PIL import Image

    src = str(tmp_path / "cscene")
    sparse = os.path.join(src, "sparse", "0")
    images_dir = os.path.join(src, "images")
    os.makedirs(sparse)
    os.makedirs(images_dir)

    rng = np.random.default_rng(0)
    W = H = 48
    focal = 40.0
    n_views = 4

    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 0, W, H))  # SIMPLE_PINHOLE
        f.write(struct.pack("<ddd", focal, W / 2, H / 2))

    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_views))
        for i in range(n_views):
            ang = 2 * np.pi * i / n_views
            fwd = -np.array([np.cos(ang), np.sin(ang), 0.0])
            up = np.array([0.0, 0.0, 1.0])
            right = np.cross(up, fwd); right /= np.linalg.norm(right)
            true_up = np.cross(fwd, right)
            Rc2w = np.stack([right, true_up, fwd], axis=1)
            cam_pos = -fwd * 4.0
            Rw2c = Rc2w.T
            t = -Rw2c @ cam_pos
            # rotation -> colmap qvec (w2c rotation)
            from neuralgaussiansplatting_tpu.scene.colmap import rotmat2qvec
            q = rotmat2qvec(Rw2c)
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<dddd", *q))
            f.write(struct.pack("<ddd", *t))
            f.write(struct.pack("<i", 1))
            f.write(f"im{i}.png\x00".encode())
            f.write(struct.pack("<Q", 0))
            arr = (rng.random((H, W, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(images_dir, f"im{i}.png"))

    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        n_pts = 120
        f.write(struct.pack("<Q", n_pts))
        pts = rng.uniform(-1, 1, (n_pts, 3))
        for i in range(n_pts):
            f.write(struct.pack("<QdddBBBd", i, *pts[i],
                                *rng.integers(0, 255, 3), 0.5))
            f.write(struct.pack("<Q", 0))

    model = str(tmp_path / "cmodel")
    _run(["train.py", "-s", src, "-m", model, "--iterations", "12",
          "--test_iterations", "12", "--save_iterations", "12",
          "--model_capacity", "256", "--capacity", "8192", "--backend", "xla",
          "--disable_viewer", "--quiet"])
    assert os.path.exists(os.path.join(
        model, "point_cloud", "iteration_12", "point_cloud.ply"))
    # input.ply persisted from the COLMAP points
    assert os.path.exists(os.path.join(model, "input.ply"))


@pytest.mark.slow
def test_train_dp_cli(tmp_path):
    """--data_parallel N end-to-end on the virtual CPU mesh: the DP trainer
    is reachable from the CLI, evals/saves/checkpoints fire at crossings."""
    src = str(tmp_path / "scene")
    model = str(tmp_path / "model_dp")
    _make_blender_scene(src, n_frames=6, size=32)
    rng = np.random.default_rng(0)
    ply_io.store_point_cloud(os.path.join(src, "points3d.ply"),
                             rng.normal(size=(200, 3)) * 0.8,
                             rng.random((200, 3)))

    env = dict(os.environ)
    env["NGS_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    r = subprocess.run(
        [sys.executable, "train.py", "-s", src, "-m", model, "--eval",
         "--iterations", "24", "--data_parallel", "4",
         "--test_iterations", "24", "--save_iterations", "24",
         "--checkpoint_iterations", "24",
         "--model_capacity", "512", "--capacity", "8192",
         "--backend", "xla", "--disable_viewer"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, f"STDOUT:{r.stdout[-2000:]}\nSTDERR:{r.stderr[-3000:]}"
    assert "Evaluating test:" in r.stdout
    assert os.path.exists(os.path.join(
        model, "point_cloud", "iteration_24", "point_cloud.ply"))
    assert os.path.exists(os.path.join(model, "chkpnt24.ckpt"))

    # mutual exclusion with --steps_per_call
    r2 = subprocess.run(
        [sys.executable, "train.py", "-s", src, "-m", model,
         "--iterations", "8", "--data_parallel", "4", "--steps_per_call", "4",
         "--backend", "xla", "--disable_viewer", "--quiet"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=420)
    assert r2.returncode != 0
    assert "mutually exclusive" in (r2.stdout + r2.stderr)
