import pathlib

from splatt3r_slam_tpu import config as cfgmod


def test_load_base():
    root = pathlib.Path(__file__).resolve().parents[1]
    cfg = cfgmod.load_config(str(root / "config" / "base.yaml"))
    assert cfg["tracking"]["max_iters"] == 50
    assert isinstance(cfg["tracking"]["rel_error"], float)
    assert cfg["tracking"]["rel_error"] == 1e-3
    assert isinstance(cfg["local_opt"]["window_size"], float)


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
