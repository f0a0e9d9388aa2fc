from splatt3r_slam_tpu.geometry.projective import (  # noqa: F401
    backproject,
    constrain_points_to_ray,
    decompose_K,
    get_pixel_coords,
    point_to_dist,
    point_to_ray_dist,
    project_calib,
)
from splatt3r_slam_tpu.geometry.robust import check_convergence, huber, tukey  # noqa: F401
