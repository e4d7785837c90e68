"""The Gaussian point-cloud model as a capacity-padded JAX pytree.

Behavioral parity target: reference scene/gaussian_model.py (parameters :49-56,
activations :28-43 & :113-148, ``create_from_pcd`` :150-183, PLY I/O :293-392,
``reset_opacity`` :331-334). The torch ``nn.Parameter`` + optimizer-surgery
design (:394-464) is replaced TPU-style: every array is allocated at a fixed
``capacity`` with an ``alive`` mask, so densify/clone/split/prune are masked
index operations under jit with **static shapes** — no reallocation, no
optimizer surgery (optax state rides along through the same index ops; see
train/densify.py).

Parameter semantics match the reference exactly:
- ``scaling`` stores log-scale (activation exp), init log(sqrt(mean 3-NN
  squared distance)) clamped at 1e-7.
- ``opacity`` stores logit (activation sigmoid), init inverse_sigmoid(0.1).
- ``rotation`` raw quaternion wxyz, init identity; normalized on use.
- ``features_dc``/``features_rest`` SH coefficients, DC init RGB2SH(colors).
- ``features`` the fork's 64-d per-Gaussian neural features, zero-init
  (reference :176); ``normals`` carried from the input cloud (:50-51).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from neuralgaussiansplatting_tpu.ops import knn
from neuralgaussiansplatting_tpu.ops.sh import RGB2SH
from neuralgaussiansplatting_tpu.ops.transforms import inverse_sigmoid
from neuralgaussiansplatting_tpu.scene import ply as ply_io

NUM_NEURAL_FEATURES = 64  # rasterizer2 cuda_rasterizer/config.h:3


class GaussianParams(NamedTuple):
    """Trainable parameters; every leaf is capacity-padded along axis 0."""

    xyz: jnp.ndarray            # (P, 3)
    normals: jnp.ndarray        # (P, 3) (neural pipeline; not optimized group)
    features_dc: jnp.ndarray    # (P, 3) SH DC (rgb)
    features_rest: jnp.ndarray  # (P, 3*(K-1)) higher SH, coefficient-major
                                # ([l1 rgb, l2 rgb, ...]). Stored FLAT: a
                                # rank-3 (P, K-1, 3) array takes a TPU tiled
                                # layout padding the 3-wide minor dim to 128
                                # lanes — 42x memory, an observed 41 GB
                                # staging copy at 5M Gaussians. The reference
                                # PLY schema (channel-major f_rest) is
                                # converted at I/O time only.
    features: jnp.ndarray       # (P, 64) neural features
    scaling: jnp.ndarray        # (P, 3) log-scale
    rotation: jnp.ndarray       # (P, 4) quaternion wxyz
    opacity: jnp.ndarray        # (P, 1) logit


class GaussianState(NamedTuple):
    """Non-trainable per-Gaussian state (alive mask + densification stats)."""

    alive: jnp.ndarray               # (P,) bool
    max_radii2d: jnp.ndarray         # (P,) float32
    xyz_gradient_accum: jnp.ndarray  # (P,) float32
    denom: jnp.ndarray               # (P,) float32


# ---------------------------------------------------------------------------
# Activations (reference scene/gaussian_model.py:28-43,113-148)
# ---------------------------------------------------------------------------

def get_scaling(p: GaussianParams) -> jnp.ndarray:
    # clamp the exponent far above any physical scale: squaring e^25 twice
    # in the covariance chain would overflow f32 into inf -> NaN gradients
    return jnp.exp(jnp.minimum(p.scaling, 25.0))


def get_rotation(p: GaussianParams) -> jnp.ndarray:
    return p.rotation / jnp.sqrt(jnp.maximum(
        jnp.sum(p.rotation * p.rotation, axis=-1, keepdims=True), 1e-16))


def get_opacity(p: GaussianParams, alive: jnp.ndarray | None = None) -> jnp.ndarray:
    """(P,) activated opacity; dead (padding) slots are forced to 0 so they
    can never rasterize."""
    o = jnp.squeeze(jnp.asarray(jnp.reciprocal(1.0 + jnp.exp(-p.opacity))), -1)
    if alive is not None:
        o = jnp.where(alive, o, 0.0)
    return o


def get_features(p: GaussianParams) -> jnp.ndarray:
    """(P, 3*K) concatenated SH coefficients (dc + rest), coefficient-major
    flat (see GaussianParams.features_rest for why not (P, K, 3))."""
    return jnp.concatenate([p.features_dc, p.features_rest], axis=1)


def normalize_params(params: GaussianParams) -> GaussianParams:
    """Flatten legacy rank-3 SH leaves ((P, 1, 3) / (P, K-1, 3) from
    pre-flat-layout checkpoints) into the current flat coefficient-major
    (P, 3) / (P, 3*(K-1)) storage. Row-major reshape IS the coefficient-major
    flattening, so the conversion is a view."""
    dc, rest = params.features_dc, params.features_rest
    if hasattr(dc, "ndim") and dc.ndim == 3:
        dc = dc.reshape(dc.shape[0], -1)
    if hasattr(rest, "ndim") and rest.ndim == 3:
        rest = rest.reshape(rest.shape[0], -1)
    return params._replace(features_dc=dc, features_rest=rest)


def get_covariance(p: GaussianParams, scaling_modifier: float = 1.0) -> jnp.ndarray:
    """(P, 6) packed world covariance (reference get_covariance,
    scene/gaussian_model.py:143-144 via build_covariance_from_scaling_rotation)."""
    from neuralgaussiansplatting_tpu.ops import transforms
    cov = transforms.build_covariance_3d(
        get_scaling(p), scaling_modifier, get_rotation(p))
    return transforms.strip_symmetric(cov)


def repad(params: GaussianParams, state, capacity: int):
    """Re-pad a (params, state) pair to a new capacity.

    Growing pads with zeros (identity quaternions for dead rotation slots —
    NaN containment); shrinking is only legal when no alive slot lies beyond
    the new capacity (raises ValueError otherwise — silently truncating live
    Gaussians would corrupt the model). Used by checkpoint restores that
    request an explicit --model_capacity different from the stored padding.
    """
    cap0 = params.xyz.shape[0]
    if capacity == cap0:
        return params, state
    if capacity < cap0:
        if bool(jnp.any(state.alive[capacity:])):
            raise ValueError(
                f"cannot shrink capacity {cap0} -> {capacity}: alive "
                f"Gaussians exist beyond the requested capacity")
        cut = lambda a: a[:capacity] if (
            hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == cap0) else a
        return (GaussianParams(*[cut(l) for l in params]),
                type(state)(*[cut(l) for l in state]))

    def grow(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == cap0:
            pad_width = [(0, capacity - cap0)] + [(0, 0)] * (leaf.ndim - 1)
            return jnp.pad(leaf, pad_width)
        return leaf

    new_params = GaussianParams(*[grow(l) for l in params])
    new_params = new_params._replace(
        rotation=new_params.rotation.at[cap0:, 0].set(1.0))
    return new_params, type(state)(*[grow(l) for l in state])


# ---------------------------------------------------------------------------
# Construction
# ---------------------------------------------------------------------------

def _pad(a: np.ndarray, capacity: int) -> np.ndarray:
    pad = [(0, capacity - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad)


def _pad_rotation(a: np.ndarray, capacity: int) -> np.ndarray:
    """Pad quaternions with identity (w=1) so dead slots stay numerically
    benign (a zero quaternion NaNs through normalization)."""
    out = np.zeros((capacity, 4), a.dtype)
    out[:, 0] = 1.0
    out[: a.shape[0]] = a
    return out


def create_from_pcd(points: np.ndarray, colors: np.ndarray,
                    normals: np.ndarray, sh_degree: int,
                    capacity: int | None = None):
    """Build (GaussianParams, GaussianState) from a point cloud.

    Reference create_from_pcd (scene/gaussian_model.py:150-183).
    ``capacity`` defaults to the point count (no headroom); pass a larger
    value to leave room for densification.
    """
    n = points.shape[0]
    capacity = capacity or n
    assert capacity >= n
    k = (sh_degree + 1) ** 2

    fused_color = np.asarray(RGB2SH(np.asarray(colors, np.float32)))
    features_dc = fused_color                                  # (N, 3)
    features_rest = np.zeros((n, 3 * (k - 1)), np.float32)

    dist2 = np.maximum(knn.mean_sq_dist_3nn(points), 1e-7)
    scales = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1)

    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0

    opacities = np.asarray(
        inverse_sigmoid(0.1 * np.ones((n, 1), np.float32)))

    params = GaussianParams(
        xyz=jnp.asarray(_pad(np.asarray(points, np.float32), capacity)),
        normals=jnp.asarray(_pad(np.asarray(normals, np.float32), capacity)),
        features_dc=jnp.asarray(_pad(features_dc, capacity)),
        features_rest=jnp.asarray(_pad(features_rest, capacity)),
        features=jnp.asarray(np.zeros((capacity, NUM_NEURAL_FEATURES), np.float32)),
        scaling=jnp.asarray(_pad(scales.astype(np.float32), capacity)),
        rotation=jnp.asarray(_pad_rotation(rots, capacity)),
        opacity=jnp.asarray(_pad(opacities.astype(np.float32), capacity)),
    )
    state = GaussianState(
        alive=jnp.arange(capacity) < n,
        max_radii2d=jnp.zeros(capacity, jnp.float32),
        xyz_gradient_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
    )
    return params, state


# ---------------------------------------------------------------------------
# PLY serialization (reference schema, scene/gaussian_model.py:293-392)
# ---------------------------------------------------------------------------

def ply_attribute_names(params: GaussianParams):
    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(params.features_dc.shape[1])]
    names += [f"f_rest_{i}" for i in range(params.features_rest.shape[1])]
    names += [f"features_{i}" for i in range(params.features.shape[1])]
    names += ["opacity"]
    names += [f"scale_{i}" for i in range(params.scaling.shape[1])]
    names += [f"rot_{i}" for i in range(params.rotation.shape[1])]
    return names


def save_ply(path: str, params: GaussianParams, alive: jnp.ndarray):
    """Write alive Gaussians with the reference attribute layout (f_dc/f_rest
    flattened channel-major via the transpose at gaussian_model.py:316-317)."""
    mask = np.asarray(alive)
    p = {k: np.asarray(v)[mask] for k, v in params._asdict().items()}
    n = p["xyz"].shape[0]
    # reference schema stores f_rest channel-major (gaussian_model.py:
    # 316-317 transpose); our flat storage is coefficient-major -> convert
    f_rest = p["features_rest"].reshape(n, -1, 3).transpose(0, 2, 1)
    cols = np.concatenate([
        p["xyz"], p["normals"],
        p["features_dc"],
        f_rest.reshape(n, -1),
        p["features"], p["opacity"], p["scaling"], p["rotation"],
    ], axis=1)
    ply_io.write_ply(path, ply_attribute_names(params), cols)


def load_ply(path: str, capacity: int | None = None):
    """Read a reference-schema checkpoint back into padded params.

    Tolerates checkpoints without the fork's ``features_*``/non-zero normals
    (plain upstream 3DGS files load fine). Reference load_ply
    (scene/gaussian_model.py:336-392).
    """
    v = ply_io.read_ply(path)
    names = set(v.dtype.names)
    n = len(v)
    capacity = capacity or n

    def grab(prefix, count):
        return np.stack([v[f"{prefix}_{i}"] for i in range(count)], axis=1)

    xyz = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
    if "nx" in names:
        normals = np.stack([v["nx"], v["ny"], v["nz"]], axis=1).astype(np.float32)
    else:
        normals = np.zeros_like(xyz)
    f_dc = grab("f_dc", 3)
    n_rest = len([x for x in names if x.startswith("f_rest_")])
    if n_rest:
        # channel-major on disk (reference schema) -> coefficient-major flat
        f_rest = grab("f_rest", n_rest).reshape(
            n, 3, n_rest // 3).transpose(0, 2, 1).reshape(n, -1)
    else:
        f_rest = np.zeros((n, 0), np.float32)
    n_feat = len([x for x in names if x.startswith("features_")])
    feats = grab("features", n_feat) if n_feat else np.zeros(
        (n, NUM_NEURAL_FEATURES), np.float32)
    opacity = v["opacity"].reshape(n, 1)
    n_scale = len([x for x in names if x.startswith("scale_")])
    scaling = grab("scale", n_scale)
    n_rot = len([x for x in names if x.startswith("rot_")])
    rotation = grab("rot", n_rot)

    params = GaussianParams(
        xyz=jnp.asarray(_pad(xyz, capacity)),
        normals=jnp.asarray(_pad(normals, capacity)),
        features_dc=jnp.asarray(_pad(f_dc.astype(np.float32), capacity)),
        features_rest=jnp.asarray(_pad(f_rest.astype(np.float32), capacity)),
        features=jnp.asarray(_pad(feats.astype(np.float32), capacity)),
        scaling=jnp.asarray(_pad(scaling.astype(np.float32), capacity)),
        rotation=jnp.asarray(_pad_rotation(rotation.astype(np.float32), capacity)),
        opacity=jnp.asarray(_pad(opacity.astype(np.float32), capacity)),
    )
    state = GaussianState(
        alive=jnp.arange(capacity) < n,
        max_radii2d=jnp.zeros(capacity, jnp.float32),
        xyz_gradient_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
    )
    sh_degree = int(round((n_rest // 3 + 1) ** 0.5)) - 1
    return params, state, sh_degree


class GaussianModel:
    """Host-side convenience wrapper mirroring the reference class API.

    Holds the functional (params, state) pytrees plus the SH warmup counter
    (reference ``active_sh_degree``/``oneupSHdegree``, gaussian_model.py:
    58-60,147-148) and the scene extent used by densification.
    """

    def __init__(self, sh_degree: int = 3):
        self.max_sh_degree = sh_degree
        self.active_sh_degree = 0
        self.params: GaussianParams | None = None
        self.state: GaussianState | None = None
        self.spatial_lr_scale = 1.0

    @property
    def num_alive(self) -> int:
        return int(np.asarray(self.state.alive).sum())

    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]

    def oneup_sh_degree(self):
        if self.active_sh_degree < self.max_sh_degree:
            self.active_sh_degree += 1

    def create_from_pcd(self, pcd, spatial_lr_scale: float,
                        capacity: int | None = None):
        self.spatial_lr_scale = float(spatial_lr_scale)
        self.params, self.state = create_from_pcd(
            pcd.points, pcd.colors, pcd.normals, self.max_sh_degree, capacity)

    def capture(self):
        """Serializable full-state tuple (reference capture,
        gaussian_model.py:75-90); optimizer state is owned by the Trainer and
        checkpointed there."""
        import numpy as np
        return {
            "active_sh_degree": self.active_sh_degree,
            "max_sh_degree": self.max_sh_degree,
            "spatial_lr_scale": self.spatial_lr_scale,
            "params": jax.tree_util.tree_map(np.asarray, self.params),
            "state": jax.tree_util.tree_map(np.asarray, self.state),
        }

    def restore(self, payload):
        """Inverse of capture (reference restore, gaussian_model.py:92-111)."""
        self.active_sh_degree = payload["active_sh_degree"]
        self.max_sh_degree = payload["max_sh_degree"]
        self.spatial_lr_scale = payload["spatial_lr_scale"]
        self.params = normalize_params(GaussianParams(
            *[jnp.asarray(x) for x in payload["params"]]))
        self.state = GaussianState(
            *[jnp.asarray(x) for x in payload["state"]])

    def save_ply(self, path: str):
        save_ply(path, self.params, self.state.alive)

    def load_ply(self, path: str, capacity: int | None = None):
        self.params, self.state, deg = load_ply(path, capacity)
        self.active_sh_degree = self.max_sh_degree = max(deg, 0)
