"""Core differentiable ops (pure JAX + Pallas TPU kernels)."""

from neuralgaussiansplatting_tpu.ops.sh import (  # noqa: F401
    eval_sh,
    RGB2SH,
    SH2RGB,
)
from neuralgaussiansplatting_tpu.ops.transforms import (  # noqa: F401
    quat_to_rotmat,
    build_scaling_rotation,
    build_covariance_3d,
    strip_symmetric,
)
from neuralgaussiansplatting_tpu.ops.projection import (  # noqa: F401
    get_world_to_view,
    get_projection_matrix,
    fov2focal,
    focal2fov,
    project_points,
    compute_cov2d,
    ndc2pix,
)
