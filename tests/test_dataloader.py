"""Dataset-format readers: TUM / EuRoC / ETH3D / 7-Scenes / MP4 / RGB.

Fixtures synthesize each dataset's on-disk layout (the formats are fixed
by the datasets themselves — spec: reference splatt3r_slam/dataloader.py:
20-338) and check enumeration, timestamps, calibration, undistortion,
and the path-token dispatch of load_dataset.
"""

import pathlib

import cv2
import numpy as np
import pytest

from splatt3r_slam_tpu import config as cfgmod
from splatt3r_slam_tpu.runtime import dataloader as dl


pytestmark = pytest.mark.smoke
ROOT = pathlib.Path(__file__).resolve().parents[1]


@pytest.fixture(autouse=True)
def _base_config():
    cfgmod.load_config(str(ROOT / "config" / "base.yaml"))
    yield


def _write_img(path, w=64, h=48, seed=0):
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    path.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), img)
    return img


# ---------------------------------------------------------------- TUM


def _make_tum(tmp_path, n=3):
    seq = tmp_path / "tum" / "rgbd_dataset_freiburg1_desk"
    lines = ["# timestamp filename"]
    for i in range(n):
        ts = 1305031452.0 + 0.033 * i
        rel = f"rgb/{ts:.6f}.png"
        _write_img(seq / rel, seed=i)
        lines.append(f"{ts:.6f} {rel}")
    (seq / "rgb.txt").write_text("\n".join(lines) + "\n")
    return seq


def test_tum_layout(tmp_path):
    seq = _make_tum(tmp_path)
    ds = dl.load_dataset(str(seq))
    assert isinstance(ds, dl.TUMDataset)
    assert len(ds) == 3
    ts, img = ds[0]
    assert float(ts) == pytest.approx(1305031452.0)
    assert img.dtype == np.float32 and img.shape == (48, 64, 3)
    assert 0.0 <= img.min() and img.max() <= 1.0
    # comment line ignored; files resolve relative to the sequence dir
    assert all(p.exists() for p in ds.rgb_files)


def test_tum_factory_calibration(tmp_path):
    seq = _make_tum(tmp_path)
    cfgmod.config["use_calib"] = True
    try:
        ds = dl.TUMDataset(str(seq))
        assert ds.has_calib()
        # freiburg1 factory fx (reference dataloader.py fr1 row)
        assert ds.camera_intrinsics.K_orig[0, 0] == pytest.approx(517.3)
        # K_frame is rescaled to the 512-crop of the 640x480 sensor
        K = ds.camera_intrinsics.K_frame
        assert K.shape == (3, 3) and K[0, 0] > 0 and K[1, 1] > 0
        # undistortion remap preserves shape at sensor resolution
        raw = np.zeros((480, 640, 3), np.uint8)
        assert ds.camera_intrinsics.remap(raw).shape == raw.shape
    finally:
        cfgmod.config["use_calib"] = False


def test_tum_subsample(tmp_path):
    seq = _make_tum(tmp_path, n=6)
    ds = dl.TUMDataset(str(seq))
    ds.subsample(2)
    assert len(ds) == 3
    assert float(ds.get_timestamp(1)) == pytest.approx(1305031452.0 + 0.066)


# ---------------------------------------------------------------- EuRoC


def _make_euroc(tmp_path, n=3):
    seq = tmp_path / "euroc" / "MH_01_easy"
    cam = seq / "mav0" / "cam0"
    rows = []
    for i in range(n):
        ts = 1403636579763555584 + i * 50_000_000
        name = f"{ts}.png"
        rng = np.random.default_rng(i)
        img = (rng.random((32, 40)) * 255).astype(np.uint8)  # grayscale
        (cam / "data").mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(cam / "data" / name), img)
        rows.append(f"{ts},{name}")
    (cam / "data.csv").write_text("\n".join(rows) + "\n")
    (cam / "sensor.yaml").write_text(
        "resolution: [40, 32]\n"
        "intrinsics: [35.0, 35.0, 20.0, 16.0]\n"
        "distortion_coefficients: [-0.28, 0.07, 0.0002, 0.00002]\n"
    )
    return seq


def test_euroc_layout(tmp_path):
    seq = _make_euroc(tmp_path)
    ds = dl.load_dataset(str(seq))
    assert isinstance(ds, dl.EurocDataset)
    assert len(ds) == 3
    # EuRoC always undistorts (heavy radial distortion) even without
    # use_calib — reference dataloader semantics
    assert ds.has_calib()
    ts, img = ds[0]
    assert img.shape == (32, 40, 3)  # grayscale promoted to RGB
    # grayscale promotion: all three channels equal
    assert np.allclose(img[..., 0], img[..., 1])


# ---------------------------------------------------------------- ETH3D


def test_eth3d_layout(tmp_path):
    seq = tmp_path / "eth3d" / "sofa_1"
    lines = ["# ts file"]
    for i in range(2):
        rel = f"rgb/{i:05d}.png"
        _write_img(seq / rel, seed=i)
        lines.append(f"{i}.0 {rel}")
    (seq / "rgb.txt").write_text("\n".join(lines) + "\n")
    (seq / "calibration.txt").write_text("55.0 55.0 32.0 24.0\n")
    ds = dl.load_dataset(str(seq))
    assert isinstance(ds, dl.ETH3DDataset)
    assert len(ds) == 2
    _, img = ds[1]
    assert img.shape == (48, 64, 3)


# ------------------------------------------------------------- 7-Scenes


def test_seven_scenes_layout(tmp_path):
    seq = tmp_path / "7-scenes" / "chess"
    # deliberately unsorted write order; loader must natural-sort
    for i in (2, 0, 10, 1):
        _write_img(seq / "seq-01" / f"frame-{i:06d}.color.png", seed=i)
    ds = dl.load_dataset(str(seq))
    assert isinstance(ds, dl.SevenScenesDataset)
    assert [p.name for p in ds.rgb_files] == [
        "frame-000000.color.png", "frame-000001.color.png",
        "frame-000002.color.png", "frame-000010.color.png",
    ]
    assert ds.timestamps == [0.0, 1.0, 2.0, 3.0]


# ------------------------------------------------------------------ MP4


def test_mp4_layout(tmp_path):
    path = tmp_path / "clip.mp4"
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                         30.0, (64, 48))
    if not wr.isOpened():  # codec unavailable in this OpenCV build
        pytest.skip("no mp4 encoder in this OpenCV build")
    rng = np.random.default_rng(0)
    for _ in range(6):
        wr.write((rng.random((48, 64, 3)) * 255).astype(np.uint8))
    wr.release()
    ds = dl.load_dataset(str(path))
    assert isinstance(ds, dl.MP4Dataset)
    assert len(ds) == 6
    _, img = ds[0]
    assert img.shape == (48, 64, 3)
    assert ds.get_timestamp(0) == pytest.approx(0.0)
    ds.subsample(2)
    assert len(ds) == 3


# ------------------------------------------------------- RGB dir + misc


def test_rgb_files_natural_sort(tmp_path):
    seq = tmp_path / "frames"
    for i in (10, 2, 1):
        _write_img(seq / f"img{i}.png", seed=i)
    _write_img(seq / "img3.jpg", seed=3)
    ds = dl.load_dataset(str(seq))
    assert isinstance(ds, dl.RGBFiles)
    assert [p.name for p in ds.rgb_files] == [
        "img1.png", "img2.png", "img3.jpg", "img10.png"]
    assert ds.timestamps[1] == pytest.approx(1 / 30.0)


def test_intrinsics_rescale_to_crop():
    """K_frame maps sensor intrinsics through the resize+crop transform
    (reference Intrinsics: K adjusted by scale and half-crop)."""
    cfgmod.config["use_calib"] = True
    try:
        intr = dl.Intrinsics.from_calib(
            512, 640, 480, [500.0, 500.0, 320.0, 240.0])
        assert intr is not None
        # 640x480 -> long side 512: scale 1.25, so fx ≈ 500/1.25 = 400
        assert intr.K_frame[0, 0] == pytest.approx(400.0, rel=0.05)
        # principal point lands inside the crop
        assert 0 < intr.K_frame[0, 2] < 512
        assert 0 < intr.K_frame[1, 2] < 512
    finally:
        cfgmod.config["use_calib"] = False


def test_from_calib_disabled_returns_none():
    assert not cfgmod.config.get("use_calib", False)
    assert dl.Intrinsics.from_calib(
        512, 640, 480, [500.0, 500.0, 320.0, 240.0]) is None


def test_webcam_mocked(monkeypatch):
    """Webcam loader logic with a mocked cv2.VideoCapture (no hardware):
    frame reads convert BGR->RGB, timestamps accumulate at 30 Hz,
    save_results stays off (reference dataloader.py webcam semantics)."""
    frames = [np.full((8, 12, 3), v, np.uint8) for v in (10, 20, 30)]

    class FakeCap:
        def __init__(self, dev):
            self.i = 0

        def read(self):
            if self.i >= len(frames):
                return False, None
            self.i += 1
            return True, frames[self.i - 1]

    monkeypatch.setattr(dl.cv2, "VideoCapture", FakeCap)
    cam = dl.Webcam()
    assert len(cam) == 999_999
    assert cam.save_results is False
    img0 = cam.read_img(0)
    img1 = cam.read_img(1)
    # BGR constant frames stay constant through the RGB conversion
    assert img0.max() == 10 and img1.max() == 20
    assert cam.get_timestamp(0) == 0.0
    assert cam.get_timestamp(1) == pytest.approx(1 / 30.0)
    with pytest.raises(ValueError):
        for _ in range(3):
            cam.read_img(2)  # exhausted capture surfaces a clear error


def test_realsense_mocked(monkeypatch):
    """RealsenseDataset wiring with a stub pyrealsense2 module: stream
    config, timestamp conversion (ms->s), BGR->RGB conversion, and the
    calibrated-intrinsics path (reference dataloader.py realsense)."""
    import sys
    import types

    rs = types.SimpleNamespace()

    class _Pipeline:
        def start(self, cfg):
            return types.SimpleNamespace(
                get_stream=lambda s: "color_stream")

        def wait_for_frames(self):
            img = np.full((8, 12, 3), 42, np.uint8)
            return types.SimpleNamespace(
                get_timestamp=lambda: 1500.0,
                get_color_frame=lambda: types.SimpleNamespace(
                    get_data=lambda: img),
            )

    class _Config:
        def __init__(self):
            self.streams = []

        def enable_stream(self, *a):
            self.streams.append(a)

    intr = types.SimpleNamespace(fx=400.0, fy=400.0, ppx=320.0, ppy=240.0)
    rs.pipeline = _Pipeline
    rs.config = _Config
    rs.stream = types.SimpleNamespace(color="color")
    rs.format = types.SimpleNamespace(bgr8="bgr8")
    rs.video_stream_profile = lambda s: types.SimpleNamespace(
        get_intrinsics=lambda: intr)
    monkeypatch.setitem(sys.modules, "pyrealsense2", rs)

    cfgmod.config["use_calib"] = True
    try:
        ds = dl.RealsenseDataset()
        ds.use_calibration = True
        assert ds.save_results is False
        assert (ds.h, ds.w) == (480, 640)
        img = ds.read_img(0)
        assert img.shape == (8, 12, 3) and img.max() == 42
        assert ds.get_timestamp(0) == pytest.approx(1.5)  # ms -> s
    finally:
        cfgmod.config["use_calib"] = False


def test_load_dataset_routes_live_sources(monkeypatch):
    """'webcam'/'realsense' path tokens dispatch to the live loaders
    (reference dataloader.py:320-338) — constructor stubs only."""
    sentinel_w, sentinel_r = object(), object()
    monkeypatch.setattr(dl, "Webcam", lambda: sentinel_w)
    monkeypatch.setattr(dl, "RealsenseDataset", lambda: sentinel_r)
    assert dl.load_dataset("webcam") is sentinel_w
    assert dl.load_dataset("realsense") is sentinel_r


def test_mp4_sequential_fast_path(tmp_path):
    """Sequential reads must not seek (cap.set rewinds the decoder to a
    keyframe and re-decodes forward every frame); random access (rewind)
    must still work and return the same frames."""
    path = tmp_path / "seq.mp4"
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                         30.0, (64, 48))
    if not wr.isOpened():
        pytest.skip("no mp4 encoder in this OpenCV build")
    rng = np.random.default_rng(1)
    n = 24
    for _ in range(n):
        wr.write((rng.random((48, 64, 3)) * 255).astype(np.uint8))
    wr.release()

    class SeekCountingCap:
        """cv2.VideoCapture attrs are read-only; delegate + count seeks."""

        def __init__(self, cap, seeks):
            self._cap, self._seeks = cap, seeks

        def set(self, prop, val):
            if prop == cv2.CAP_PROP_POS_FRAMES:
                self._seeks.append(val)
            return self._cap.set(prop, val)

        def __getattr__(self, name):
            return getattr(self._cap, name)

    ds = dl.load_dataset(str(path))
    seeks = []
    ds.cap = SeekCountingCap(ds.cap, seeks)
    seq = [ds.read_img(i) for i in range(n)]
    assert seeks == [], "sequential decode must not seek"

    # stride > 1 skips via grab(), still no seek
    ds2 = dl.load_dataset(str(path))
    ds2.subsample(3)
    ds2.cap = SeekCountingCap(ds2.cap, seeks)
    strided = [ds2.read_img(i) for i in range(len(ds2))]
    assert seeks == [], "strided sequential decode must not seek"
    for k, img in enumerate(strided):
        np.testing.assert_array_equal(img, seq[3 * k])

    # rewind: one seek, identical pixels
    again = ds.read_img(5)
    assert seeks == [5]
    np.testing.assert_array_equal(again, seq[5])


def test_mp4_sequential_throughput(tmp_path):
    """The grab()-based sequential path must beat per-frame POS_FRAMES
    seeks on a long-GOP stream (VERDICT r03 next-9 done-criterion)."""
    import time

    path = tmp_path / "tp.mp4"
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                         30.0, (320, 240))
    if not wr.isOpened():
        pytest.skip("no mp4 encoder in this OpenCV build")
    rng = np.random.default_rng(2)
    base = (rng.random((240, 320, 3)) * 255).astype(np.uint8)
    n = 90
    for i in range(n):
        frame = np.roll(base, i, axis=1)  # inter-coded motion, long GOP
        wr.write(frame)
    wr.release()

    ds = dl.load_dataset(str(path))
    t0 = time.perf_counter()
    for i in range(n):
        ds.read_img(i)
    t_fast = time.perf_counter() - t0

    cap = cv2.VideoCapture(str(path))
    t0 = time.perf_counter()
    for i in range(n):
        cap.set(cv2.CAP_PROP_POS_FRAMES, i)
        ok, img = cap.read()
        assert ok
        cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    t_seek = time.perf_counter() - t0
    cap.release()

    assert t_fast < t_seek, (
        f"sequential path {t_fast:.3f}s not faster than seek {t_seek:.3f}s")
