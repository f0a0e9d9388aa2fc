"""Host-side dataset readers (CPU feeding the TPU pipeline).

Dataset-format spec: reference `splatt3r_slam/dataloader.py:20-338` —
TUM rgb.txt lists, EuRoC mav0 csv + sensor.yaml, ETH3D calibration.txt,
7-Scenes seq-01/*.color.png, MP4/video, RGB folders, webcam/realsense
live sources; undistortion with an optimal new camera matrix and
intrinsics rescale to the 512-crop.

Dataloading is deliberately host code (OpenCV/NumPy) — it is not device
work (SURVEY.md §2b, torchcodec/pyrealsense2/OpenCV row).
"""

from __future__ import annotations

import pathlib
import re

import cv2
import numpy as np
import yaml

from splatt3r_slam_tpu.config import config
from splatt3r_slam_tpu.utils.image import resize_img


def _natsorted(paths):
    def key(p):
        return [int(t) if t.isdigit() else t
                for t in re.split(r"(\d+)", str(p))]

    return sorted(paths, key=key)


class MonocularDataset:
    """Sequential RGB source: returns (timestamp, float image in [0,1])."""

    def __init__(self):
        self.rgb_files = []
        self.timestamps = []
        self.img_size = 512
        self.camera_intrinsics: Intrinsics | None = None
        self.use_calibration = config.get("use_calib", False)
        self.save_results = True
        self.dataset_path = None

    def __len__(self):
        return len(self.rgb_files)

    def __getitem__(self, idx):
        img = self.get_image(idx)
        return self.get_timestamp(idx), img

    def get_timestamp(self, idx):
        return self.timestamps[idx]

    def read_img(self, idx):
        img = cv2.imread(str(self.rgb_files[idx]))
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def get_image(self, idx):
        img = self.read_img(idx)
        if self.use_calibration and self.camera_intrinsics is not None:
            img = self.camera_intrinsics.remap(img)
        return img.astype(np.float32) / 255.0

    def get_img_shape(self):
        img = self.read_img(0)
        raw_shape = img.shape
        out = resize_img(img.astype(np.float32) / 255.0, self.img_size)
        return tuple(out["img"].shape[1:3]), raw_shape[:2]

    def subsample(self, stride):
        self.rgb_files = self.rgb_files[::stride]
        self.timestamps = self.timestamps[::stride]

    def has_calib(self):
        return self.camera_intrinsics is not None


class TUMDataset(MonocularDataset):
    """TUM RGB-D sequences; fr1/fr2/fr3 factory calibrations."""

    _CALIB = {
        1: [517.3, 516.5, 318.6, 255.3, 0.2624, -0.9531, -0.0054, 0.0026, 1.1633],
        2: [520.9, 521.0, 325.1, 249.7, 0.2312, -0.7849, -0.0033, -0.0001, 0.9172],
        3: [535.4, 539.2, 320.1, 247.6],
    }

    def __init__(self, dataset_path):
        super().__init__()
        self.dataset_path = pathlib.Path(dataset_path)
        entries = np.loadtxt(self.dataset_path / "rgb.txt", dtype=str,
                             comments="#")
        self.rgb_files = [self.dataset_path / f for f in entries[:, 1]]
        self.timestamps = list(entries[:, 0])
        m = re.search(r"freiburg(\d+)", str(dataset_path))
        calib = np.array(self._CALIB[int(m.group(1))]) if m else None
        if calib is not None:
            self.camera_intrinsics = Intrinsics.from_calib(
                self.img_size, 640, 480, calib
            )


class EurocDataset(MonocularDataset):
    """EuRoC MAV cam0 (grayscale, always undistorted — heavy distortion)."""

    def __init__(self, dataset_path):
        super().__init__()
        self.use_calibration = True
        self.dataset_path = pathlib.Path(dataset_path)
        entries = np.loadtxt(
            self.dataset_path / "mav0/cam0/data.csv", delimiter=",", dtype=str
        )
        self.rgb_files = [
            self.dataset_path / "mav0/cam0/data" / f for f in entries[:, 1]
        ]
        self.timestamps = list(entries[:, 0])
        with open(self.dataset_path / "mav0/cam0/sensor.yaml") as f:
            cam0 = yaml.safe_load(f)
        W, H = cam0["resolution"]
        self.camera_intrinsics = Intrinsics.from_calib(
            self.img_size, W, H,
            [*cam0["intrinsics"], *cam0["distortion_coefficients"]],
            always_undistort=True,
        )

    def read_img(self, idx):
        img = cv2.imread(str(self.rgb_files[idx]), cv2.IMREAD_GRAYSCALE)
        return cv2.cvtColor(img, cv2.COLOR_GRAY2RGB)


class ETH3DDataset(MonocularDataset):
    def __init__(self, dataset_path):
        super().__init__()
        self.dataset_path = pathlib.Path(dataset_path)
        entries = np.loadtxt(self.dataset_path / "rgb.txt", dtype=str,
                             comments="#")
        self.rgb_files = [self.dataset_path / f for f in entries[:, 1]]
        self.timestamps = list(entries[:, 0])
        calib = np.loadtxt(self.dataset_path / "calibration.txt",
                           dtype=np.float32)
        _, (H, W) = self.get_img_shape()
        self.camera_intrinsics = Intrinsics.from_calib(self.img_size, W, H,
                                                       calib)


class SevenScenesDataset(MonocularDataset):
    def __init__(self, dataset_path):
        super().__init__()
        self.dataset_path = pathlib.Path(dataset_path)
        self.rgb_files = _natsorted(
            (self.dataset_path / "seq-01").glob("*.color.png")
        )
        self.timestamps = [float(i) for i in range(len(self.rgb_files))]
        self.camera_intrinsics = Intrinsics.from_calib(
            self.img_size, 640, 480, [585.0, 585.0, 320.0, 240.0]
        )


class MP4Dataset(MonocularDataset):
    """MP4 video source with a sequential-decode fast path.

    The SLAM loop reads frames in order; per-frame `cap.set(POS_FRAMES)`
    forces the decoder back to the nearest keyframe and re-decodes
    forward every time (the reference avoids this with torchcodec,
    dataloader.py:236-244 — not in this image). Instead, track the
    capture's cursor and only `grab()` (decode without conversion/copy)
    past skipped frames; random access falls back to a seek."""

    def __init__(self, dataset_path):
        super().__init__()
        self.use_calibration = False
        self.dataset_path = pathlib.Path(dataset_path)
        self.cap = cv2.VideoCapture(str(self.dataset_path))
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or 30.0
        self.total_frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.stride = config["dataset"]["subsample"]
        self.timestamps = []
        self._pos = 0  # raw frame index the capture will decode next

    def __len__(self):
        return self.total_frames // self.stride

    def get_timestamp(self, idx):
        return self.timestamps[idx] if idx < len(self.timestamps) else idx / self.fps

    def read_img(self, idx):
        target = idx * self.stride
        if target < self._pos:  # rewind: the one case that needs a seek
            self.cap.set(cv2.CAP_PROP_POS_FRAMES, target)
            self._pos = target
        while self._pos < target:
            if not self.cap.grab():
                raise ValueError(f"Failed to read frame {idx}")
            self._pos += 1
        ret, img = self.cap.read()
        if not ret:
            raise ValueError(f"Failed to read frame {idx}")
        self._pos += 1
        self.timestamps.append(target / self.fps)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def subsample(self, stride):
        self.stride *= stride


class RGBFiles(MonocularDataset):
    def __init__(self, dataset_path):
        super().__init__()
        self.use_calibration = False
        self.dataset_path = pathlib.Path(dataset_path)
        files = list(self.dataset_path.glob("*.png"))
        files += list(self.dataset_path.glob("*.jpg"))
        self.rgb_files = _natsorted(files)
        self.timestamps = [i / 30.0 for i in range(len(self.rgb_files))]


class Webcam(MonocularDataset):
    def __init__(self):
        super().__init__()
        self.use_calibration = False
        self.cap = cv2.VideoCapture(-1)
        self.save_results = False
        self.timestamps = []

    def __len__(self):
        return 999_999

    def get_timestamp(self, idx):
        return self.timestamps[idx]

    def read_img(self, idx):
        ret, img = self.cap.read()
        if not ret:
            raise ValueError("Failed to read webcam frame")
        self.timestamps.append(idx / 30.0)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class RealsenseDataset(MonocularDataset):
    """Intel RealSense live color stream (requires pyrealsense2)."""

    def __init__(self):
        super().__init__()
        try:
            import pyrealsense2 as rs
        except ImportError as e:  # pragma: no cover - hardware dependent
            raise RuntimeError(
                "pyrealsense2 is not installed; realsense input unavailable"
            ) from e
        self.save_results = False
        self.timestamps = []
        self.h, self.w = 480, 640
        self.pipeline = rs.pipeline()
        rs_config = rs.config()
        rs_config.enable_stream(rs.stream.color, self.w, self.h,
                                rs.format.bgr8, 30)
        self.profile = self.pipeline.start(rs_config)
        self.rgb_profile = rs.video_stream_profile(
            self.profile.get_stream(rs.stream.color)
        )
        if self.use_calibration:
            i = self.rgb_profile.get_intrinsics()
            self.camera_intrinsics = Intrinsics.from_calib(
                self.img_size, self.w, self.h, [i.fx, i.fy, i.ppx, i.ppy]
            )

    def __len__(self):
        return 999_999

    def get_timestamp(self, idx):
        return self.timestamps[idx]

    def read_img(self, idx):
        frames = self.pipeline.wait_for_frames()
        self.timestamps.append(frames.get_timestamp() / 1000.0)
        img = np.asanyarray(frames.get_color_frame().get_data())
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class Intrinsics:
    """Camera calibration: undistortion maps + rescale to the 512-crop.

    Spec: reference dataloader.py:277-317 (optimal new camera matrix,
    rectify maps, K_frame adjusted by the resize/crop transform).
    """

    def __init__(self, img_size, W, H, K_orig, K, distortion, mapx, mapy):
        self.img_size = img_size
        self.W, self.H = W, H
        self.K_orig = K_orig
        self.K = K
        self.distortion = distortion
        self.mapx = mapx
        self.mapy = mapy
        _, (scale_w, scale_h, half_crop_w, half_crop_h) = resize_img(
            np.zeros((H, W, 3), np.float32), img_size,
            return_transformation=True,
        )
        self.K_frame = K.copy().astype(np.float32)
        self.K_frame[0, 0] = K[0, 0] / scale_w
        self.K_frame[1, 1] = K[1, 1] / scale_h
        self.K_frame[0, 2] = K[0, 2] / scale_w - half_crop_w
        self.K_frame[1, 2] = K[1, 2] / scale_h - half_crop_h

    def remap(self, img):
        return cv2.remap(img, self.mapx, self.mapy, cv2.INTER_LINEAR)

    def refine_pose_with_calibration(self, T_WC8, X_canon, img_size):
        """Hook for calibration-aware trajectory refinement (reference
        `Intrinsics.refine_pose_with_calibration`); currently identity on
        the SE3 part — scale is dropped by the caller."""
        return T_WC8

    @staticmethod
    def from_calib(img_size, W, H, calib, always_undistort=False):
        if not config.get("use_calib", False) and not always_undistort:
            return None
        fx, fy, cx, cy = [float(c) for c in calib[:4]]
        distortion = np.zeros(4)
        if len(calib) > 4:
            distortion = np.array(calib[4:], dtype=np.float64)
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float64)
        center = config.get("dataset", {}).get("center_principle_point", True)
        K_opt, _ = cv2.getOptimalNewCameraMatrix(
            K, distortion, (W, H), 0, (W, H), centerPrincipalPoint=center
        )
        mapx, mapy = cv2.initUndistortRectifyMap(
            K, distortion, None, K_opt, (W, H), cv2.CV_32FC1
        )
        return Intrinsics(img_size, W, H, K, K_opt, distortion, mapx, mapy)


def load_dataset(dataset_path: str) -> MonocularDataset:
    """Dispatch on path tokens (spec: dataloader.py:320-338)."""
    parts = dataset_path.split("/")
    if "tum" in parts:
        return TUMDataset(dataset_path)
    if "euroc" in parts:
        return EurocDataset(dataset_path)
    if "eth3d" in parts:
        return ETH3DDataset(dataset_path)
    if "7-scenes" in parts:
        return SevenScenesDataset(dataset_path)
    if "realsense" in parts:
        return RealsenseDataset()
    if "webcam" in parts:
        return Webcam()
    ext = parts[-1].split(".")[-1].lower()
    if ext in ("mp4", "avi", "mov"):
        return MP4Dataset(dataset_path)
    return RGBFiles(dataset_path)
