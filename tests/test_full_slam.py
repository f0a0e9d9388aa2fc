"""Full-system integration: frontend + backend factor graph + retrieval.

Tiny random model on synthetic frames; asserts the whole pipeline
(INIT→TRACKING with inline backend solves and retrieval-backed loop
closure candidates) runs and leaves finite state.
"""

import pathlib

import numpy as np
import pytest

from splatt3r_slam_tpu import config as cfgmod
from splatt3r_slam_tpu.backend import FactorGraph
from splatt3r_slam_tpu.models import TwoViewConfig, init_model
from splatt3r_slam_tpu.retrieval import RetrievalDatabase
from splatt3r_slam_tpu.runtime.frame import create_frame
from splatt3r_slam_tpu.runtime.inference import InferenceEngine
from splatt3r_slam_tpu.runtime.system import SLAMSystem
from splatt3r_slam_tpu.splat import GaussianAccumulator

ROOT = pathlib.Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_full_slam_with_backend(tmp_path):
    cfgmod.load_config(str(ROOT / "config" / "base.yaml"))
    cfgmod.config["tracking"]["max_iters"] = 3
    cfgmod.config["tracking"]["min_match_frac"] = 0.0
    cfgmod.config["matching"]["max_iter"] = 2
    cfgmod.config["local_opt"]["max_iters"] = 2
    # force frequent keyframes so the backend actually runs
    cfgmod.config["tracking"]["match_frac_thresh"] = 2.0

    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
    h, w = 48, 64
    model, params = init_model(cfg, h, w)
    engine = InferenceEngine(model, params, h, w)

    retrieval = RetrievalDatabase(feat_dim=cfg.enc_embed_dim,
                                  proj_dim=cfg.enc_embed_dim,
                                  n_words=256, nfeat=16)
    system = SLAMSystem(engine, h, w)
    backend = FactorGraph(engine, system.keyframes, retrieval=retrieval)
    system.backend = backend
    system.gaussian_module = GaussianAccumulator(
        spatial_stride=4, min_confidence=0.0, max_scale=1e9,
        depth_max_percentile=1.0, depth_min=-1e9,
    )

    rng = np.random.default_rng(0)
    base = rng.random((h * 2, w * 2, 3)).astype(np.float32)
    for i in range(5):
        img = base[i : i + h, 2 * i : 2 * i + w]
        frame = create_frame(i, img, img_size=w)
        system.process_frame(frame)

    assert len(system.keyframes) >= 2
    # backend created at least the neighbor edges and solved
    assert len(backend.ii) >= 1
    for i in range(len(system.keyframes)):
        T = np.asarray(system.keyframes[i].T_WC)
        assert np.isfinite(T).all()
    # retrieval database grew with keyframes
    assert retrieval.kf_counter == len(system.keyframes)
    # gaussians accumulated
    assert system.pool.n > 0
