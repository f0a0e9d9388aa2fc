from splatt3r_slam_tpu.retrieval.database import RetrievalDatabase  # noqa: F401
