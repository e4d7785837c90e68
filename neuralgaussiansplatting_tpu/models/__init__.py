"""Model layer: the Gaussian point cloud and screen-space neural decoders."""

from neuralgaussiansplatting_tpu.models.gaussians import (  # noqa: F401
    GaussianParams,
    GaussianModel,
)
