"""Fast-path knob accuracy bounds on the sub-pixel synthetic oracle.

Pins the measured accuracy cost of the TPU fast-path knobs
(match_stride=2, gn_stride=4, closed_form_init, refine_quantize) against
reference-exact settings. The full 5-seed sweep lives in
scripts/sweep_accuracy.py (table in PARITY.md); this is the single-seed
regression guard. See tests/synthetic_pair.py for the oracle design.
"""

import numpy as np
import pytest

from splatt3r_slam_tpu import config as cfgmod
from splatt3r_slam_tpu.tracking.tracker import TrackingConfig

import synthetic_pair as sp

H, W = 96, 128


@pytest.fixture(scope="module")
def scene_cfg():
    cfgmod.load_config("config/base.yaml")
    return sp.make_scene(H, W), TrackingConfig.from_config(cfgmod.config)


def _track_errors(sc, tcfg, **kw):
    rng = np.random.default_rng(0)
    views = sp.make_trajectory(sc, 4, rng)
    rot, trn = [], []
    for k in range(3):
        vk, vf = views[k], views[k + 1]
        Xc = sp.cross_pointmap(sc, vk, vf["T"], rng)
        ang, terr, fail, frac = sp.track_pair(sc, vf, vk, Xc, tcfg, **kw)
        assert not fail
        assert frac > 0.3, f"matcher collapsed: frac={frac}"
        rot.append(ang)
        trn.append(terr)
    return float(np.mean(rot)), float(np.mean(trn))


def test_reference_exact_baseline_accuracy(scene_cfg):
    """With realistic network noise the exact pipeline recovers each
    pair's pose to sub-0.2-degree / sub-centimeter (at ~2 m scene
    depth)."""
    sc, tcfg = scene_cfg
    rot, trn = _track_errors(sc, tcfg, match_stride=1,
                             closed_form_init=False, max_iter=10,
                             refine_quantize=False)
    # measured (logs/sweep_accuracy.json): ~0.54 deg / 0.026 mean over 5
    # seeds — dominated by the matcher's integer-pixel quantization at
    # 128 px width (present in the reference too, matching.py:66 .long())
    assert rot < 1.0, f"baseline rotation error {rot:.4f} deg"
    assert trn < 0.05, f"baseline translation error {trn:.5f}"


@pytest.mark.parametrize("kw,label,rot_mult,trn_mult", [
    (dict(match_stride=2), "match_stride=2", 3.0, 3.0),
    (dict(closed_form_init=True, polish_iters=2), "closed_form_init",
     2.0, 2.0),
    (dict(refine_quantize=True), "refine_quantize", 2.0, 2.0),
    (dict(match_stride=2, closed_form_init=True, polish_iters=2,
          refine_quantize=True), "tpu-fast", 3.5, 3.5),
])
def test_fast_path_penalty_bounded(scene_cfg, kw, label, rot_mult,
                                   trn_mult):
    sc, tcfg = scene_cfg
    base = dict(match_stride=1, closed_form_init=False, max_iter=10,
                refine_quantize=False)
    rot0, trn0 = _track_errors(sc, tcfg, **base)
    rot1, trn1 = _track_errors(sc, tcfg, **{**base, **kw})
    # bounded multiple of the exact path, plus an absolute floor so a
    # lucky ultra-tight baseline can't turn jitter into a failure
    assert rot1 < max(rot0 * rot_mult, 0.05), (label, rot0, rot1)
    assert trn1 < max(trn0 * trn_mult, 0.005), (label, trn0, trn1)


@pytest.mark.slow
def test_gn_stride_penalty_bounded(scene_cfg):
    sc, _ = scene_cfg
    rng = np.random.default_rng(100)
    views = sp.make_trajectory(sc, 5, rng)
    ate1 = sp.solve_graph(sc, views, rng, gn_stride=1)
    ate4 = sp.solve_graph(sc, views, rng, gn_stride=4)
    assert ate1 < 0.02, f"exact backend ATE {ate1:.5f}"
    assert ate4 < max(3.0 * ate1, 0.025), (ate1, ate4)
