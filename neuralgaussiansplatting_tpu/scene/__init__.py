"""Scene/data layer: dataset loading, cameras, PLY I/O."""

from neuralgaussiansplatting_tpu.scene.scene import Scene  # noqa: F401
from neuralgaussiansplatting_tpu.scene.cameras import Camera, CameraInfo  # noqa: F401
