"""Interactive / headless visualization.

Parity target: reference `splatt3r_slam/visualization.py:48-725` — a viewer
process showing (a) interactive Gaussian-splat rendering from a free
camera, (b) keyframe thumbnails + current frame, (c) camera frustums and
factor-graph edges, with GUI controls flowing back to the main loop as
`WindowMsg`.

TPU re-design: rasterization of the interactive view runs **on device**
(`splat.rasterizer.render_tiles` over the shared GaussianPool) — the
viewer is a thin host display client. Display backend is OpenCV HighGUI
(present in this image; moderngl/imgui are not), and a headless mode
writes the same composited canvas to PNG/MP4 — which also makes the
viewer testable in CI. Control messages mirror WindowMsg
(visualization.py:48-55).
"""

from __future__ import annotations

import dataclasses
import pathlib

import numpy as np

from splatt3r_slam_tpu.lie import sim3
from splatt3r_slam_tpu.utils.queues import new_queue, try_get_msg


@dataclasses.dataclass
class WindowMsg:
    is_terminated: bool = False
    is_paused: bool = False
    next: bool = False
    C_conf_threshold: float = 1.5
    gs_on: bool = True
    max_gaussians: int = -1


def depth2rgb(depth: np.ndarray, min_d=0.1, max_d=10.0):
    """Colorize a depth map (visualization_utils.depth2rgb parity)."""
    import cv2

    d = np.clip((depth - min_d) / max(max_d - min_d, 1e-9), 0, 1)
    d8 = (d * 255).astype(np.uint8)
    return cv2.applyColorMap(d8, cv2.COLORMAP_TURBO)[..., ::-1]


def vfov_to_intrinsics(vfov_deg: float, h: int, w: int) -> np.ndarray:
    """Vertical FOV → pixel intrinsics (visualization.py camera path)."""
    f = 0.5 * h / np.tan(np.radians(vfov_deg) / 2)
    return np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)


def opengl_to_opencv_cam(T_gl: np.ndarray) -> np.ndarray:
    """OpenGL camera (−z forward, +y up) → OpenCV (+z forward, +y down)
    (visualization.py:467-600 conversion)."""
    flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(T_gl.dtype)
    return T_gl @ flip


def orbit_pose(center, radius, yaw, pitch) -> np.ndarray:
    """Camera-to-world 4x4 orbiting `center` (OpenCV convention)."""
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    eye = center + radius * np.array([cy * cp, sp, sy * cp])
    fwd = center - eye
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right) + 1e-9
    down = np.cross(fwd, right)
    T = np.eye(4, dtype=np.float32)
    T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, down, fwd, eye
    return T


class Viewer:
    """GS viewer: interactive (cv2 window) or headless (PNG/MP4 sink)."""

    def __init__(self, system, hw=(384, 512), headless=True,
                 out_dir="logs/viz", vfov=60.0):
        self.system = system
        self.h, self.w = hw
        self.headless = headless
        self.out_dir = pathlib.Path(out_dir)
        self.K = vfov_to_intrinsics(vfov, self.h, self.w)
        self.msg_queue = new_queue()
        self.state = WindowMsg()
        self.yaw, self.pitch, self.radius = 0.0, 0.3, 4.0
        self._frame_idx = 0
        if headless:
            self.out_dir.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------------
    def render_gs_view(self, T_WC_4x4=None):
        """Rasterize the accumulated world gaussians from a camera (device)."""
        import jax.numpy as jnp

        from splatt3r_slam_tpu.splat.rasterizer import render_tiles

        data = self.system.pool.get_all()
        if data is None:
            return np.zeros((self.h, self.w, 3), np.float32)
        means, cov, colors, opa = data
        if T_WC_4x4 is None:
            center = np.asarray(means.mean(axis=0))
            T_WC_4x4 = orbit_pose(center, self.radius, self.yaw, self.pitch)
        view = np.linalg.inv(T_WC_4x4).astype(np.float32)
        img = render_tiles(
            means, cov, colors, opa, jnp.asarray(view),
            jnp.asarray(self.K), (self.h, self.w), k_max=256,
        )
        return np.clip(np.asarray(img), 0, 1)

    def _compose(self):
        import cv2

        gs = (self.render_gs_view() * 255).astype(np.uint8)
        canvas = gs.copy()
        # keyframe thumbnail strip
        kfs = self.system.keyframes
        thumbs = []
        for i in range(max(0, len(kfs) - 4), len(kfs)):
            t = (np.asarray(kfs[i].uimg) * 255).astype(np.uint8)
            t = cv2.resize(t, (self.w // 4, self.h // 4))
            thumbs.append(t)
        if thumbs:
            strip = np.concatenate(thumbs, axis=1)
            canvas[-strip.shape[0]:, : strip.shape[1]] = strip
        n_g = self.system.pool.n
        cv2.putText(canvas, f"gaussians: {n_g}  kfs: {len(kfs)}  "
                    f"mode: {self.system.mode.name}",
                    (8, 20), cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255),
                    1)
        return canvas

    def update(self):
        """One viewer tick; returns the current WindowMsg state."""
        canvas = self._compose()
        self.yaw += 0.05  # slow orbit
        if self.headless:
            import cv2

            cv2.imwrite(str(self.out_dir / f"{self._frame_idx:06d}.png"),
                        cv2.cvtColor(canvas, cv2.COLOR_RGB2BGR))
        else:  # pragma: no cover - needs a display
            import cv2

            cv2.imshow("splatt3r-slam-tpu", cv2.cvtColor(canvas,
                                                         cv2.COLOR_RGB2BGR))
            key = cv2.waitKey(1) & 0xFF
            if key == ord("q"):
                self.state.is_terminated = True
            elif key == ord(" "):
                self.state.is_paused = not self.state.is_paused
            elif key == ord("a"):
                self.yaw -= 0.2
            elif key == ord("d"):
                self.yaw += 0.2
            elif key == ord("w"):
                self.radius *= 0.9
            elif key == ord("s"):
                self.radius *= 1.1
            self.msg_queue.put(self.state)
        self._frame_idx += 1
        return self.state

    def poll_msg(self):
        return try_get_msg(self.msg_queue)
