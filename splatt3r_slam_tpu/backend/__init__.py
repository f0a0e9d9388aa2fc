from splatt3r_slam_tpu.backend.factor_graph import FactorGraph  # noqa: F401
