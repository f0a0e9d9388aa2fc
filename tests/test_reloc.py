"""Relocalization: tracking loss → RELOC mode → retrieval re-anchoring.

Drives the state machine with a scene change (uncorrelated frames) to
force low match fractions, then revisits the original scene; the system
must enter RELOC and recover via the retrieval database
(spec: main.py:76-119, 508-518; tracker.py:67-70).
"""

import pathlib

import numpy as np
import pytest

from splatt3r_slam_tpu import config as cfgmod
from splatt3r_slam_tpu.backend import FactorGraph
from splatt3r_slam_tpu.models import TwoViewConfig, init_model
from splatt3r_slam_tpu.retrieval import RetrievalDatabase
from splatt3r_slam_tpu.runtime.frame import Mode, create_frame
from splatt3r_slam_tpu.runtime.inference import InferenceEngine
from splatt3r_slam_tpu.runtime.system import SLAMSystem

ROOT = pathlib.Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_reloc_cycle():
    cfgmod.load_config(str(ROOT / "config" / "base.yaml"))
    cfgmod.config["tracking"]["max_iters"] = 3
    cfgmod.config["matching"]["max_iter"] = 2
    cfgmod.config["local_opt"]["max_iters"] = 2
    # trip RELOC easily, accept reloc easily (random weights)
    cfgmod.config["tracking"]["min_match_frac"] = 0.9
    cfgmod.config["reloc"]["min_match_frac"] = 0.0
    cfgmod.config["reloc"]["strict"] = False
    cfgmod.config["retrieval"]["min_thresh"] = 0.0

    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
    h, w = 48, 64
    model, params = init_model(cfg, h, w)
    engine = InferenceEngine(model, params, h, w)
    retrieval = RetrievalDatabase(feat_dim=cfg.enc_embed_dim,
                                  proj_dim=cfg.enc_embed_dim,
                                  n_words=128, nfeat=16)
    system = SLAMSystem(engine, h, w, fused=False)
    system.backend = FactorGraph(engine, system.keyframes,
                                 retrieval=retrieval)

    rng = np.random.default_rng(0)
    sceneA = rng.random((h, w, 3)).astype(np.float32)

    # INIT on scene A
    system.process_frame(create_frame(0, sceneA, img_size=w))
    assert system.mode == Mode.TRACKING

    # wildly different frame → low match fraction → RELOC
    sceneB = rng.random((h, w, 3)).astype(np.float32)
    system.process_frame(create_frame(1, sceneB, img_size=w))
    assert system.mode == Mode.RELOC

    # revisit scene A: retrieval should re-anchor and resume tracking
    n_kfs_before = len(system.keyframes)
    system.process_frame(create_frame(2, sceneA, img_size=w))
    assert system.mode == Mode.TRACKING
    assert len(system.keyframes) == n_kfs_before + 1
    T = np.asarray(system.keyframes[-1].T_WC)
    assert np.isfinite(T).all()


def test_reloc_seeds_pose_from_top_scoring_candidate(monkeypatch):
    """Regression: candidates must stay in retrieval-SCORE order, and the
    reseeded pose must come from the top-scoring keyframe — not the
    lowest-index one (spec: main.py:96-109, `keyframes.T_WC[kf_idx[0]]`
    with kf_idx in retrieval-score order)."""
    cfgmod.load_config(str(ROOT / "config" / "base.yaml"))

    from splatt3r_slam_tpu.lie import sim3
    from splatt3r_slam_tpu.runtime.frame import KeyframeBuffer

    h, w = 48, 64
    kfs = KeyframeBuffer(h, w)
    poses = []
    for i in range(3):
        f = create_frame(i, np.zeros((h, w, 3), np.float32), img_size=w)
        tau = np.zeros((1, 7), np.float32)
        tau[0, 0] = float(i + 1)  # distinct translations
        f.T_WC = sim3.exp(tau)
        kfs.append(f)
        poses.append(np.asarray(sim3.matrix(f.T_WC)))

    class FakeRetrieval:
        def update(self, frame, add_after_query, k, min_thresh):
            # score order: kf 2 best, then kf 0, with a duplicate —
            # index order (0, 2) differs from score order (2, 0)
            return [2, 0, 2]

        def add_to_database(self, frame):
            pass

    graph = FactorGraph(engine=None, frames=kfs, retrieval=FakeRetrieval())
    captured = {}

    def fake_add_factors(ii, jj, min_match_frac, is_reloc=False):
        captured["ii"] = list(ii)
        return True

    monkeypatch.setattr(graph, "add_factors", fake_add_factors)
    monkeypatch.setattr(graph, "solve", lambda: None)

    query = create_frame(9, np.zeros((h, w, 3), np.float32), img_size=w)
    query.T_WC = sim3.identity((1,))
    assert graph.relocalize(query)

    assert captured["ii"] == [2, 0], "score order must be preserved, deduped"
    np.testing.assert_allclose(
        np.asarray(sim3.matrix(kfs[-1].T_WC)), poses[2], atol=1e-6,
        err_msg="pose must be seeded from the TOP-SCORING keyframe (2)")
