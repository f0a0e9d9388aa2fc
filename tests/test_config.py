import pytest

import pathlib

from splatt3r_slam_tpu import config as cfgmod



pytestmark = pytest.mark.smoke
def test_load_base():
    root = pathlib.Path(__file__).resolve().parents[1]
    cfg = cfgmod.load_config(str(root / "config" / "base.yaml"))
    assert cfg["tracking"]["max_iters"] == 50
    assert isinstance(cfg["tracking"]["rel_error"], float)
    assert cfg["tracking"]["rel_error"] == 1e-3
    assert isinstance(cfg["local_opt"]["window_size"], float)


def test_eval_configs_are_reference_exact():
    """The deterministic eval protocol must NOT inherit the TPU
    fast-path approximations (VERDICT r1 §missing-2): full-res matching
    and all-pixels global opt, as in the reference eval YAMLs."""
    root = pathlib.Path(__file__).resolve().parents[1]
    for name in ("eval_calib.yaml", "eval_no_calib.yaml"):
        cfg = cfgmod.load_config(str(root / "config" / name))
        assert cfg["matching"]["match_stride"] == 1, name
        assert cfg["local_opt"]["gn_stride"] == 1, name
        assert cfg["single_thread"] is True, name
        assert cfg["dataset"]["subsample"] == 2, name


def test_max_edges_eviction():
    """Sliding-window edge capacity: oldest loop-closure edges evicted
    first, then oldest odometry edges; parallel per-edge lists stay
    aligned."""
    import numpy as np

    from splatt3r_slam_tpu.backend.factor_graph import FactorGraph

    root = pathlib.Path(__file__).resolve().parents[1]
    cfgmod.load_config(str(root / "config" / "base.yaml"))
    fg = FactorGraph.__new__(FactorGraph)
    fg.cfg = dict(cfgmod.config["local_opt"])
    fg.cfg["max_edges"] = 6
    # 8 edges: 5 odometry (i, i+1) and 3 loop closures (0, j)
    fg.ii = [0, 1, 0, 2, 3, 0, 4, 0]
    fg.jj = [1, 2, 5, 3, 4, 7, 5, 9]
    tag = list(range(8))
    for name in ("idx_ii2jj", "idx_jj2ii", "valid_match_j",
                 "valid_match_i", "Q_ii2jj", "Q_jj2ii"):
        setattr(fg, name, list(tag))
    fg._enforce_max_edges()
    assert len(fg.ii) == 6
    # the two oldest loop closures (tags 2, 5) are gone; all odometry kept
    assert fg.idx_ii2jj == [0, 1, 3, 4, 6, 7]
    assert fg.ii == [0, 1, 2, 3, 4, 0]
    assert fg.jj == [1, 2, 3, 4, 5, 9]
    assert fg.Q_jj2ii == [0, 1, 3, 4, 6, 7]
    assert np.all(np.asarray(fg.ii) <= np.asarray(fg.jj))


def test_inherit_merge(tmp_path):
    (tmp_path / "parent.yaml").write_text("a: 1\nb:\n  c: 2\n  d: 3\n")
    (tmp_path / "child.yaml").write_text(
        f'inherit: "{tmp_path / "parent.yaml"}"\nb:\n  d: 9\ne: 5\n'
    )
    cfg = cfgmod.load_config(str(tmp_path / "child.yaml"))
    assert cfg["a"] == 1
    assert cfg["b"]["c"] == 2
    assert cfg["b"]["d"] == 9
    assert cfg["e"] == 5
    assert cfgmod.config["e"] == 5
