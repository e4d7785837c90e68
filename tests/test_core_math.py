"""Unit tests for SH / quaternion / covariance / projection math."""

import numpy as np
import jax.numpy as jnp

from neuralgaussiansplatting_tpu.ops import sh as sh_ops
from neuralgaussiansplatting_tpu.ops import transforms
from neuralgaussiansplatting_tpu.ops import projection as proj

from scenes import make_camera
import oracle


def test_sh_deg0_constant():
    sh = np.zeros((5, 1, 3), np.float32)
    sh[:, 0, :] = 1.0
    dirs = np.random.default_rng(0).normal(size=(5, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    out = sh_ops.eval_sh(0, jnp.asarray(sh), jnp.asarray(dirs))
    np.testing.assert_allclose(out, sh_ops.SH_C0, rtol=1e-6)


def test_sh_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    for deg in range(4):
        k = (deg + 1) ** 2
        sh = rng.normal(size=(7, k, 3)).astype(np.float32)
        dirs = rng.normal(size=(7, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        got = np.asarray(sh_ops.eval_sh(deg, jnp.asarray(sh), jnp.asarray(dirs)))
        want = np.stack([oracle.eval_sh_np(deg, sh[i], dirs[i]) for i in range(7)])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_rgb2sh_roundtrip():
    rgb = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (10, 3)))
    np.testing.assert_allclose(
        sh_ops.SH2RGB(sh_ops.RGB2SH(rgb)), rgb, rtol=1e-6)


def test_quat_to_rotmat_orthonormal():
    rng = np.random.default_rng(3)
    q = rng.normal(size=(20, 4)).astype(np.float32)
    R = np.asarray(transforms.quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (20, 3, 3)),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_identity_quat_identity_rotation():
    q = jnp.asarray([[1.0, 0, 0, 0]])
    np.testing.assert_allclose(transforms.quat_to_rotmat(q)[0], np.eye(3),
                               atol=1e-7)


def test_covariance_psd_and_eigvals():
    rng = np.random.default_rng(4)
    s = rng.uniform(0.1, 2.0, (10, 3)).astype(np.float32)
    q = rng.normal(size=(10, 4)).astype(np.float32)
    cov = np.asarray(transforms.build_covariance_3d(
        jnp.asarray(s), 1.0, jnp.asarray(q)))
    for i in range(10):
        ev = np.sort(np.linalg.eigvalsh(cov[i]))
        np.testing.assert_allclose(ev, np.sort(s[i] ** 2), rtol=1e-4)


def test_strip_unstrip_roundtrip():
    rng = np.random.default_rng(5)
    s = rng.uniform(0.1, 2.0, (4, 3)).astype(np.float32)
    q = rng.normal(size=(4, 4)).astype(np.float32)
    cov = transforms.build_covariance_3d(jnp.asarray(s), 1.0, jnp.asarray(q))
    again = transforms.unstrip_symmetric(transforms.strip_symmetric(cov))
    np.testing.assert_allclose(again, cov, rtol=1e-6)


def test_projection_matrix_matches_reference_convention():
    cam = make_camera()
    # A point on the optical axis at znear maps to ndc z=0... the reference
    # projection maps z=znear to 0 and z=zfar to ~1 (after perspective divide).
    znear, zfar = 0.01, 100.0
    P = proj.get_projection_matrix(znear, zfar, 0.8, 0.6)
    for z, want in [(znear, 0.0), (zfar, 1.0)]:
        p = np.array([0, 0, z, 1.0])
        out = P @ p
        np.testing.assert_allclose(out[2] / out[3], want, atol=1e-5)

    # camera center maps to itself: view @ [campos,1] == origin
    v = cam.view @ np.array([*cam.campos, 1.0])
    np.testing.assert_allclose(v[:3], 0.0, atol=1e-5)


def test_world_to_view_places_lookat_on_axis():
    cam = make_camera(dist=4.0)
    # the scene origin should be straight ahead at depth `dist`
    v = cam.view @ np.array([0, 0, 0, 1.0])
    np.testing.assert_allclose(v[:3], [0, 0, 4.0], atol=1e-5)
    ndc = np.asarray(proj.project_points(jnp.zeros((1, 3)), jnp.asarray(cam.full_proj)))
    np.testing.assert_allclose(ndc[0, :2], 0.0, atol=1e-5)


def test_inverse_sigmoid():
    x = jnp.asarray([0.1, 0.5, 0.9])
    np.testing.assert_allclose(
        1 / (1 + np.exp(-np.asarray(transforms.inverse_sigmoid(x)))), x,
        rtol=1e-6)
