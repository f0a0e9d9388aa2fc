"""Portrait-orientation frames run at their TRUE orientation end to end.

(The net is shape-polymorphic; checkpoint-parity of the portrait protocol
is proven in tests/test_reference_parity.py::test_portrait_forward_parity.)
"""

import numpy as np
import pytest

from splatt3r_slam_tpu.runtime.frame import create_frame


def test_create_frame_portrait(rng):
    img = rng.random((96, 64, 3)).astype(np.float32)  # portrait H>W
    f = create_frame(0, img, img_size=96)
    assert f.portrait
    # stored at true orientation: H > W
    assert f.img.shape[1] > f.img.shape[2]
    assert f.uimg.shape[0] > f.uimg.shape[1]
    hs = f.img_shape.reshape(-1)
    assert hs[0] > hs[1]


def test_create_frame_landscape(rng):
    img = rng.random((64, 96, 3)).astype(np.float32)
    f = create_frame(0, img, img_size=96)
    assert not f.portrait
    assert f.img.shape[2] >= f.img.shape[1]


@pytest.mark.slow
def test_portrait_pipeline(rng, tmp_path):
    """Portrait frames through the SLAM loop + keyframe PNG export."""
    import pathlib

    from splatt3r_slam_tpu import config as cfgmod
    from splatt3r_slam_tpu.models import TwoViewConfig, init_model
    from splatt3r_slam_tpu.runtime.evaluate import save_keyframes
    from splatt3r_slam_tpu.runtime.inference import InferenceEngine
    from splatt3r_slam_tpu.runtime.system import SLAMSystem

    root = pathlib.Path(__file__).resolve().parents[1]
    cfgmod.load_config(str(root / "config" / "base.yaml"))
    cfgmod.config["tracking"]["max_iters"] = 2
    cfgmod.config["tracking"]["min_match_frac"] = 0.0
    cfgmod.config["matching"]["max_iter"] = 1

    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
    h, w = 64, 48  # portrait working shape (true orientation)
    model, params = init_model(cfg, h, w)
    engine = InferenceEngine(model, params, h, w)
    sysm = SLAMSystem(engine, h, w)

    base = rng.random((2 * 64, 2 * 48, 3)).astype(np.float32)  # portrait
    for i in range(3):
        img = base[i : i + 64, i : i + 48]  # 64x48 portrait
        f = create_frame(i, img, img_size=64)
        assert f.portrait
        assert f.img.shape[1:3] == (64, 48)
        sysm.process_frame(f)

    assert len(sysm.keyframes) >= 1
    save_keyframes(tmp_path, [f"{i}" for i in range(3)], sysm.keyframes)
    import cv2

    png = cv2.imread(str(next(tmp_path.glob("*.png"))))
    assert png.shape[0] > png.shape[1]  # exported as portrait
