"""Strip-sharded rendering: one frame's pixels across many chips (SP analog).

SURVEY §2.3: this workload's "sequence parallelism" is spatial — the tile
grid. A large frame is split into horizontal viewport strips, each rendered
by the *unchanged* single-chip pipeline under ``vmap`` with the strip axis
sharded over the mesh's ``tile`` axis; Gaussians stay replicated, XLA keeps
each strip's whole render local to its device and the only cross-chip traffic
is the final strip concatenation (and, when training, the gradient psum that
also carries the DP axis).

A strip is expressed purely through camera math — an asymmetric frustum: the
projection's y row becomes a*P_y + b*P_w so the strip's NDC range maps onto
its global pixel rows, tan_fovy scales by strip_h/H so the EWA focal is
unchanged, and the full frame's 1.3*tan_fov clamp limits are passed through —
making the sharded render *bit-identical* to the monolithic one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from neuralgaussiansplatting_tpu.gaussian_renderer import render
from neuralgaussiansplatting_tpu.ops.preprocess import CameraParams


def strip_cameras(cam: CameraParams, n_strips: int) -> CameraParams:
    """Split a camera into ``n_strips`` equal horizontal strips (batched
    CameraParams with a leading strip axis). Requires height % n_strips == 0
    (pad the camera first otherwise)."""
    h_full = cam.height
    assert h_full % n_strips == 0, "pad the frame height to the strip count"
    h = h_full // n_strips

    view = jnp.asarray(cam.view, jnp.float32)
    fp = np.asarray(cam.full_proj, np.float32)

    projs = []
    for s in range(n_strips):
        y0 = s * h
        a = h_full / h
        b = (h_full - 2 * y0 - h) / h
        m = fp.copy()
        m[1] = a * fp[1] + b * fp[3]
        projs.append(m)

    return CameraParams(
        view=jnp.broadcast_to(view, (n_strips, 4, 4)),
        full_proj=jnp.asarray(np.stack(projs)),
        campos=jnp.broadcast_to(jnp.asarray(cam.campos), (n_strips, 3)),
        tan_fovx=cam.tan_fovx,
        tan_fovy=cam.tan_fovy * h / h_full,
        width=cam.width,
        height=h,
        limit_x=cam.limit_x,
        limit_y=cam.limit_y,
    )


def render_strips(cams: CameraParams, params, alive, sh_degree, bg, settings):
    """vmap the standard render over the strip axis; returns (3, H, W)."""
    def one(cam):
        return render(cam, params, alive, sh_degree, bg, settings)["render"]
    strips = jax.vmap(one)(cams)              # (S, 3, h, W)
    s, c, h, w = strips.shape
    return jnp.transpose(strips, (1, 0, 2, 3)).reshape(c, s * h, w)


def make_sharded_renderer(mesh, *, sh_degree, settings, n_strips=None):
    """Jitted sharded full-frame renderer over the mesh's ``tile`` axis."""
    n_strips = n_strips or mesh.shape["tile"]
    strip_sh = NamedSharding(mesh, P(None, "tile"))

    def fn(cams, params, alive, bg):
        return render_strips(cams, params, alive, sh_degree, bg, settings)

    jfn = jax.jit(fn)

    def call(cam: CameraParams, params, alive, bg):
        cams = strip_cameras(cam, n_strips)
        # shard the strip axis of the batched camera leaves
        sh = NamedSharding(mesh, P("tile"))
        cams = CameraParams(
            view=jax.device_put(cams.view, sh),
            full_proj=jax.device_put(cams.full_proj, sh),
            campos=jax.device_put(cams.campos, sh),
            tan_fovx=cams.tan_fovx, tan_fovy=cams.tan_fovy,
            width=cams.width, height=cams.height,
            limit_x=cams.limit_x, limit_y=cams.limit_y)
        return jfn(cams, params, alive, bg)

    del strip_sh
    return call
