from splatt3r_slam_tpu.splat.gaussians import (  # noqa: F401
    RGB2SH,
    SH2RGB,
    build_covariance,
    GaussianAccumulator,
)
from splatt3r_slam_tpu.splat.rasterizer import render_tiles  # noqa: F401
from splatt3r_slam_tpu.splat.decoder import DecoderSplatting  # noqa: F401
