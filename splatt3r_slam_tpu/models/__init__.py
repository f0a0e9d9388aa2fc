from splatt3r_slam_tpu.models.two_view import (  # noqa: F401
    Splatt3RModel,
    TwoViewConfig,
    forward_pair,
    init_model,
)
