"""Data-layer tests: PLY I/O, COLMAP parsing, Blender scenes, model init."""

import json
import os
import struct

import numpy as np
import pytest

from neuralgaussiansplatting_tpu.scene import ply as ply_io
from neuralgaussiansplatting_tpu.scene import colmap as colmap_io
from neuralgaussiansplatting_tpu.scene.scene import Scene
from neuralgaussiansplatting_tpu.models import gaussians as gm
from neuralgaussiansplatting_tpu.ops import knn


def test_ply_roundtrip(tmp_path):
    path = str(tmp_path / "test.ply")
    rng = np.random.default_rng(0)
    cols = rng.normal(size=(17, 5)).astype(np.float32)
    names = ["x", "y", "z", "opacity", "scale_0"]
    ply_io.write_ply(path, names, cols)
    v = ply_io.read_ply(path)
    assert v.dtype.names == tuple(names)
    for i, n in enumerate(names):
        np.testing.assert_allclose(v[n], cols[:, i])


def test_store_fetch_point_cloud(tmp_path):
    path = str(tmp_path / "pc.ply")
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(10, 3))
    rgb = rng.random((10, 3))
    ply_io.store_point_cloud(path, xyz, rgb)
    pts, colors, normals = ply_io.fetch_point_cloud(path)
    np.testing.assert_allclose(pts, xyz, atol=1e-6)
    np.testing.assert_allclose(colors, (rgb * 255).astype(np.uint8) / 255.0,
                               atol=1e-6)
    assert normals.shape == (10, 3)


def _write_colmap_binary(sparse):
    os.makedirs(sparse, exist_ok=True)
    # one PINHOLE camera
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))  # PINHOLE id=1
        f.write(struct.pack("<dddd", 60.0, 60.0, 32.0, 24.0))
    # two images
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        for iid, name in [(1, "im0.png"), (2, "im1.png")]:
            q = np.array([1.0, 0, 0, 0])
            t = np.array([0.0, 0, 4.0 + iid])
            f.write(struct.pack("<i", iid))
            f.write(struct.pack("<dddd", *q))
            f.write(struct.pack("<ddd", *t))
            f.write(struct.pack("<i", 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ddq", 1.0, 2.0, 7))
    # three points
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 3))
        for i in range(3):
            f.write(struct.pack("<QdddBBBd", i, i * 1.0, 0.5, -1.0,
                                10 * i, 20, 30, 0.5))
            f.write(struct.pack("<Q", 2))
            f.write(struct.pack("<ii", 0, 0) * 2)


def test_colmap_binary_parsers(tmp_path):
    sparse = str(tmp_path / "sparse" / "0")
    _write_colmap_binary(sparse)
    cams = colmap_io.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    assert cams[1].model == "PINHOLE" and cams[1].width == 64
    np.testing.assert_allclose(cams[1].params, [60, 60, 32, 24])
    ims = colmap_io.read_images_binary(os.path.join(sparse, "images.bin"))
    assert ims[2].name == "im1.png"
    np.testing.assert_allclose(ims[1].tvec, [0, 0, 5])
    assert ims[1].point3D_ids.tolist() == [7]
    xyz, rgb, err = colmap_io.read_points3d_binary(
        os.path.join(sparse, "points3D.bin"))
    assert xyz.shape == (3, 3) and rgb[2, 0] == 20
    np.testing.assert_allclose(xyz[:, 0], [0, 1, 2])


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(2)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = colmap_io.qvec2rotmat(q)
    np.testing.assert_allclose(colmap_io.rotmat2qvec(R), q, atol=1e-8)


def _make_blender_scene(root, n_frames=4, size=32):
    from PIL import Image
    os.makedirs(root, exist_ok=True)
    frames = []
    rng = np.random.default_rng(3)
    for i in range(n_frames):
        ang = 2 * np.pi * i / n_frames
        fwd = -np.array([np.cos(ang), np.sin(ang), 0.0])
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(up, fwd)
        # OpenGL cam-to-world: x right, y up, z backward
        c2w = np.eye(4)
        c2w[:3, 0] = right
        c2w[:3, 1] = up
        c2w[:3, 2] = -fwd
        c2w[:3, 3] = -fwd * 4.0
        frames.append({"file_path": f"./train/r_{i}",
                       "transform_matrix": c2w.tolist()})
        os.makedirs(os.path.join(root, "train"), exist_ok=True)
        arr = (rng.random((size, size, 4)) * 255).astype(np.uint8)
        Image.fromarray(arr, "RGBA").save(
            os.path.join(root, "train", f"r_{i}.png"))
    for split in ("train", "test"):
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)


def test_blender_scene_and_model_init(tmp_path):
    src = str(tmp_path / "lego")
    model = str(tmp_path / "out")
    _make_blender_scene(src)
    # pre-seed a small init cloud so the 100k random default isn't used
    rng = np.random.default_rng(7)
    ply_io.store_point_cloud(os.path.join(src, "points3d.ply"),
                             rng.normal(size=(100, 3)), rng.random((100, 3)))
    g = gm.GaussianModel(sh_degree=2)
    scene = Scene(src, model, g, white_background=True, eval_split=True,
                  shuffle=False, capacity=256)
    # random init cloud persisted
    assert os.path.exists(os.path.join(src, "points3d.ply"))
    assert os.path.exists(os.path.join(model, "cameras.json"))
    assert len(scene.get_train_cameras()) == 4
    assert len(scene.get_test_cameras()) == 4
    cam = scene.get_train_cameras()[0]
    assert cam.image.shape == (3, 32, 32)
    # camera looks at origin
    v = cam.world_view_transform @ np.array([0, 0, 0, 1.0])
    np.testing.assert_allclose(v[:3], [0, 0, 4.0], atol=1e-5)
    # model init
    assert g.num_alive == 100
    assert g.capacity == 256


def test_gaussian_init_semantics():
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    colors = rng.random((50, 3))
    normals = rng.normal(size=(50, 3))
    params, state = gm.create_from_pcd(pts, colors, normals, 3, capacity=64)
    assert params.xyz.shape == (64, 3)
    assert params.features_rest.shape == (64, 45)
    assert params.features.shape == (64, 64)
    assert int(np.asarray(state.alive).sum()) == 50
    # opacity activates to 0.1; padding slots render at 0
    op = np.asarray(gm.get_opacity(params, state.alive))
    np.testing.assert_allclose(op[:50], 0.1, atol=1e-6)
    np.testing.assert_allclose(op[50:], 0.0)
    # scale init = log sqrt mean 3-nn dist
    d2 = knn.mean_sq_dist_3nn(pts)
    np.testing.assert_allclose(np.asarray(params.scaling)[:50, 0],
                               np.log(np.sqrt(np.maximum(d2, 1e-7))),
                               rtol=1e-5)
    # DC from colors
    np.testing.assert_allclose(
        np.asarray(params.features_dc)[:50],
        (colors - 0.5) / 0.28209479177387814, rtol=1e-5)


def test_gaussian_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(30, 3)).astype(np.float32)
    params, state = gm.create_from_pcd(
        pts, rng.random((30, 3)), rng.normal(size=(30, 3)), 3, capacity=40)
    params = params._replace(
        features=params.features + rng.normal(size=params.features.shape).astype(np.float32),
        features_rest=params.features_rest + 0.1,
    )
    path = str(tmp_path / "ckpt.ply")
    gm.save_ply(path, params, state.alive)
    params2, state2, deg = gm.load_ply(path, capacity=40)
    assert deg == 3
    assert int(np.asarray(state2.alive).sum()) == 30
    for k in params._fields:
        a = np.asarray(getattr(params, k))[:30]
        b = np.asarray(getattr(params2, k))[:30]
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=k)


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(6)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    got = knn.mean_sq_dist_3nn(pts)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.sort(d2, axis=1)[:, :3].mean(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4)
