from splatt3r_slam_tpu.parallel.mesh import make_mesh  # noqa: F401
from splatt3r_slam_tpu.parallel.trainer import (  # noqa: F401
    TrainConfig,
    Trainer,
)
