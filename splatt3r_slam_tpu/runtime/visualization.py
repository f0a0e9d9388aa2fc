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
from splatt3r_slam_tpu.runtime.frame import uimg01
from splatt3r_slam_tpu.utils.queues import new_queue, try_get_msg


@dataclasses.dataclass
class WindowMsg:
    """GUI → main control channel (reference visualization.py:48-55;
    consumed live by the main loop like reference main.py:368-386)."""

    is_terminated: bool = False
    is_paused: bool = False
    next: bool = False
    C_conf_threshold: float = 1.5
    gs_on: bool = True
    max_gaussians: int = -1
    spatial_stride: int = 4
    show_keyframes: bool = True
    show_edges: bool = True
    # display controls (reference GUI surface, visualization.py:303-448)
    render_mode: str = "rgb"  # "rgb" | "depth"
    show_images: bool = True  # keyframe strip + current-frame panel
    # pointmap display when gs_on is off: "surfel" renders oriented
    # discs through the device rasterizer (reference GLSL surfel mode,
    # visualization.py:602-624); "scatter" is the cheap point fallback
    pointmap_mode: str = "surfel"


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
                 out_dir="logs/viz", vfov=60.0, rasterizer="auto",
                 k_max=512):
        # rasterizer: "auto" (pallas on TPU, xla elsewhere), "xla", or
        # "pallas" — both share bin_tiles, benchmarked in
        # scripts/bench_rasterizer.py; k_max matches the render path's
        # default (splat/decoder.py) so the viewer shows what the
        # exported renders show
        if rasterizer == "auto":
            from splatt3r_slam_tpu.splat.rasterizer import (
                default_rasterizer,
            )

            rasterizer = default_rasterizer()
        self.rasterizer = rasterizer
        self.k_max = int(k_max)
        self.system = system
        self.h, self.w = hw
        self.headless = headless
        self.out_dir = pathlib.Path(out_dir)
        self.K = vfov_to_intrinsics(vfov, self.h, self.w)
        self.msg_queue = new_queue()
        self.state = WindowMsg()
        self.yaw, self.pitch, self.radius = 0.0, 0.3, 4.0
        # free-camera state (reference's user-steered camera,
        # visualization.py:162-301): pan offset added to the orbit
        # center; user_cam stops the auto-orbit once the user steers
        self.center_offset = np.zeros(3, np.float32)
        self.user_cam = False
        self.show_help = False
        self._drag = None  # (button, last_x, last_y)
        self._last_T_cam = np.eye(4, dtype=np.float32)
        self._window_ready = False
        self._frame_idx = 0
        if headless:
            self.out_dir.mkdir(parents=True, exist_ok=True)

    # ---- free camera ---------------------------------------------------
    def set_camera(self, yaw=None, pitch=None, radius=None,
                   center_offset=None):
        """Programmatic camera control (same effect as mouse steering)."""
        if yaw is not None:
            self.yaw = float(yaw)
        if pitch is not None:
            self.pitch = float(np.clip(pitch, -1.5, 1.5))
        if radius is not None:
            self.radius = float(max(radius, 1e-3))
        if center_offset is not None:
            self.center_offset = np.asarray(center_offset, np.float32)
        self.user_cam = True

    def _on_mouse(self, event, x, y, flags, param=None):
        """cv2 mouse callback: L-drag orbit, R-drag pan, wheel dolly
        (reference free camera + imgui panel, visualization.py:162-448)."""
        import cv2

        if event in (cv2.EVENT_LBUTTONDOWN, cv2.EVENT_RBUTTONDOWN,
                     cv2.EVENT_MBUTTONDOWN):
            self._drag = (event, x, y)
            self.user_cam = True
            return
        if event in (cv2.EVENT_LBUTTONUP, cv2.EVENT_RBUTTONUP,
                     cv2.EVENT_MBUTTONUP):
            self._drag = None
            return
        if event == cv2.EVENT_MOUSEWHEEL:
            # dolly: flags carry the wheel delta's sign
            self.radius *= 0.9 if flags > 0 else 1.1
            self.user_cam = True
            return
        if event == cv2.EVENT_MOUSEMOVE and self._drag is not None:
            btn, lx, ly = self._drag
            dx, dy = x - lx, y - ly
            self._drag = (btn, x, y)
            pan = (btn in (cv2.EVENT_RBUTTONDOWN, cv2.EVENT_MBUTTONDOWN)
                   or bool(flags & cv2.EVENT_FLAG_SHIFTKEY))
            if pan:
                # translate the orbit center in the current image plane
                right = self._last_T_cam[:3, 0]
                down = self._last_T_cam[:3, 1]
                k = 0.0015 * self.radius
                self.center_offset = (
                    self.center_offset - k * dx * right - k * dy * down
                ).astype(np.float32)
            else:
                self.yaw += 0.008 * dx
                self.pitch = float(np.clip(self.pitch + 0.008 * dy,
                                           -1.5, 1.5))

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
        if self.state.render_mode == "depth":
            # depth-render display mode (reference GUI "render depth",
            # cuda_splatting.py:227-269 path)
            from splatt3r_slam_tpu.splat.decoder import render_depth

            d = np.asarray(render_depth(
                means, cov, opa, jnp.asarray(view), jnp.asarray(self.K),
                (self.h, self.w), mode="depth", k_max=self.k_max,
            ))
            lo, hi = (np.percentile(d[d > 0], [2, 98])
                      if (d > 0).any() else (0.1, 10.0))
            return depth2rgb(d, float(lo), float(max(hi, lo + 1e-3))
                             ).astype(np.float32) / 255.0
        if self.rasterizer == "pallas":
            from splatt3r_slam_tpu.splat.pallas_rasterizer import (
                render_tiles_pallas,
            )

            img = render_tiles_pallas(
                means, cov, colors, opa, jnp.asarray(view),
                jnp.asarray(self.K), (self.h, self.w), k_max=self.k_max,
            )
        else:
            img = render_tiles(
                means, cov, colors, opa, jnp.asarray(view),
                jnp.asarray(self.K), (self.h, self.w), k_max=self.k_max,
            )
        return np.clip(np.asarray(img), 0, 1)

    # ---- overlays: frustums, graph edges, pointmap mode ----------------
    def _project_pts(self, pts_w, view):
        """World points (N,3) → pixel coords (N,2) + in-front mask."""
        Xc = pts_w @ view[:3, :3].T + view[:3, 3]
        z = Xc[:, 2]
        ok = z > 1e-3
        zs = np.where(ok, z, 1.0)
        u = self.K[0, 0] * Xc[:, 0] / zs + self.K[0, 2]
        v = self.K[1, 1] * Xc[:, 1] / zs + self.K[1, 2]
        return np.stack([u, v], -1), ok, z

    def _kf_centers_mats(self):
        kfs = self.system.keyframes
        mats = [np.asarray(sim3.matrix(kf.T_WC)) for kf in kfs]
        return mats

    def _draw_overlays(self, canvas, view):
        """Camera frustums (red) + factor-graph edges (green), projected
        into the free camera (reference visualization.py:233-268)."""
        import cv2

        mats = self._kf_centers_mats()
        if not mats:
            return canvas
        s = 0.1  # frustum scale
        # frustum corners in camera coords: apex + 4 image-plane corners
        local = np.array(
            [[0, 0, 0], [-s, -s, 2 * s], [s, -s, 2 * s],
             [s, s, 2 * s], [-s, s, 2 * s]], np.float32
        )
        lines = [(0, 1), (0, 2), (0, 3), (0, 4),
                 (1, 2), (2, 3), (3, 4), (4, 1)]
        if self.state.show_keyframes:
            for T in mats:
                pts_w = local @ T[:3, :3].T + T[:3, 3]
                uv, ok, _ = self._project_pts(pts_w, view)
                for a, b in lines:
                    if ok[a] and ok[b]:
                        cv2.line(canvas, tuple(uv[a].astype(int)),
                                 tuple(uv[b].astype(int)), (255, 64, 64), 1)
        backend = getattr(self.system, "backend", None)
        if self.state.show_edges and backend is not None and backend.ii:
            centers = np.stack([T[:3, 3] for T in mats])
            uv, ok, _ = self._project_pts(centers, view)
            for i, j in zip(backend.ii, backend.jj):
                if i < len(mats) and j < len(mats) and ok[i] and ok[j]:
                    cv2.line(canvas, tuple(uv[i].astype(int)),
                             tuple(uv[j].astype(int)), (64, 255, 64), 1)
        return canvas

    def render_surfel_view(self, T_WC_4x4):
        """Pointmap surfel mode: keyframe pointmaps as oriented discs,
        rasterized ON DEVICE by the same tile pipeline as the GS path
        (reference GLSL surfel shaders, visualization.py:602-624 +
        resources/programs/surfels.glsl — no GL needed here)."""
        import jax.numpy as jnp

        from splatt3r_slam_tpu.splat.gaussians import pointmap_to_surfels
        from splatt3r_slam_tpu.splat.rasterizer import render_tiles

        stride = max(1, int(self.state.spatial_stride))
        parts = [[], [], [], []]
        for kf in list(self.system.keyframes)[-16:]:
            if kf.X_canon is None:
                continue
            hw = tuple(int(v) for v in
                       np.asarray(kf.img_shape).reshape(-1)[:2])
            X = kf.X_canon.reshape(hw[0], hw[1], 3)
            col = jnp.asarray(uimg01(kf), jnp.float32)
            out = pointmap_to_surfels(X, col, kf.T_WC, stride=stride)
            for acc, o in zip(parts, out):
                acc.append(o)
        if not parts[0]:
            return np.zeros((self.h, self.w, 3), np.float32)
        means, cov, colors, opa = (jnp.concatenate(p) for p in parts)
        view = np.linalg.inv(T_WC_4x4).astype(np.float32)
        if self.rasterizer == "pallas":
            from splatt3r_slam_tpu.splat.pallas_rasterizer import (
                render_tiles_pallas,
            )

            img = render_tiles_pallas(
                means, cov, colors, opa, jnp.asarray(view),
                jnp.asarray(self.K), (self.h, self.w), k_max=self.k_max,
            )
        else:
            img = render_tiles(
                means, cov, colors, opa, jnp.asarray(view),
                jnp.asarray(self.K), (self.h, self.w), k_max=self.k_max,
            )
        return np.clip(np.asarray(img), 0, 1)

    def render_pointmap_view(self, view):
        """Pointmap scatter fallback (`pointmap_mode: "scatter"`):
        subsampled keyframe points, far-to-near painter's order."""
        canvas = np.zeros((self.h, self.w, 3), np.float32)
        kfs = self.system.keyframes
        pts_all, col_all = [], []
        for kf in list(kfs)[-16:]:
            if kf.X_canon is None:
                continue
            X = np.asarray(kf.X_canon).reshape(-1, 3)[::7]
            T = np.asarray(sim3.matrix(kf.T_WC))
            pts_all.append(X @ T[:3, :3].T + T[:3, 3])
            col_all.append(uimg01(kf).reshape(-1, 3)[::7])
        if not pts_all:
            return canvas
        pts = np.concatenate(pts_all)
        cols = np.concatenate(col_all)
        uv, ok, z = self._project_pts(pts, view)
        inb = ok & (uv[:, 0] >= 0) & (uv[:, 0] < self.w) & \
            (uv[:, 1] >= 0) & (uv[:, 1] < self.h)
        uv, cols, z = uv[inb], cols[inb], z[inb]
        order = np.argsort(-z)  # far first
        ui = uv[order].astype(np.int32)
        canvas[ui[:, 1], ui[:, 0]] = cols[order]
        return canvas

    def _compose(self):
        import cv2

        center = None
        kfs = self.system.keyframes
        mats = self._kf_centers_mats()
        if mats:
            center = np.stack([T[:3, 3] for T in mats]).mean(axis=0)
        data = self.system.pool.get_all() if self.state.gs_on else None
        if center is None and data is not None:
            center = np.asarray(data[0].mean(axis=0))
        if center is None:
            center = np.zeros(3, np.float32)
        T_cam = orbit_pose(center + self.center_offset, self.radius,
                           self.yaw, self.pitch)
        self._last_T_cam = T_cam  # pan axes for the mouse callback
        view = np.linalg.inv(T_cam).astype(np.float32)

        if self.state.gs_on and data is not None:
            gs = (self.render_gs_view(T_cam) * 255).astype(np.uint8)
        elif self.state.pointmap_mode == "surfel":
            gs = (self.render_surfel_view(T_cam) * 255).astype(np.uint8)
        else:
            gs = (self.render_pointmap_view(view) * 255).astype(np.uint8)
        canvas = gs.copy()
        canvas = self._draw_overlays(canvas, view)
        # image panels (reference GUI keyframe/current pictures,
        # visualization.py:356-448): keyframe strip bottom-left,
        # current camera frame picture-in-picture top-right
        kfs = self.system.keyframes
        if self.state.show_images:
            thumbs = []
            for i in range(max(0, len(kfs) - 4), len(kfs)):
                t = (uimg01(kfs[i]) * 255).astype(np.uint8)
                t = cv2.resize(t, (self.w // 4, self.h // 4))
                thumbs.append(t)
            if thumbs:
                strip = np.concatenate(thumbs, axis=1)
                canvas[-strip.shape[0]:, : strip.shape[1]] = strip
            cur = getattr(self.system, "current_frame", None)
            if cur is not None and cur.uimg is not None:
                pip = (uimg01(cur) * 255).astype(np.uint8)
                pip = cv2.resize(pip, (self.w // 4, self.h // 4))
                ph, pw = pip.shape[:2]
                canvas[2 : 2 + ph, self.w - pw - 2 : self.w - 2] = pip
                cv2.rectangle(canvas, (self.w - pw - 2, 2),
                              (self.w - 2, 2 + ph), (255, 255, 255), 1)
        n_g = self.system.pool.n
        cv2.putText(canvas, f"gaussians: {n_g}  kfs: {len(kfs)}  "
                    f"mode: {self.system.mode.name}",
                    (8, 20), cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255),
                    1)
        # on-canvas control readouts (reference imgui panel values,
        # visualization.py:303-448)
        st = self.state
        mg = st.max_gaussians if st.max_gaussians > 0 else "-"
        cv2.putText(
            canvas,
            f"conf[{st.C_conf_threshold:.1f}] stride[{st.spatial_stride}] "
            f"maxg[{mg}] {st.render_mode}"
            + (" paused" if st.is_paused else ""),
            (8, 38), cv2.FONT_HERSHEY_SIMPLEX, 0.45, (200, 255, 200), 1)
        if self.show_help:
            for li, txt in enumerate((
                "drag: orbit   shift/right-drag: pan   wheel: dolly",
                "space pause  n next  q quit  g gaussians  x depth",
                "p surfel/scatter pointmap",
                "[/] conf  ,/. stride  -/= max gaussians  h help",
            )):
                cv2.putText(canvas, txt, (8, 58 + 16 * li),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.4,
                            (255, 255, 160), 1)
        return canvas

    def _handle_key(self, key: int):
        """Keyboard control surface (key-bound equivalents of the
        reference's imgui sliders, visualization.py:303-448). Separated
        from update() so CI can drive it without a display."""
        if key == ord("q"):
            self.state.is_terminated = True
        elif key == ord(" "):
            self.state.is_paused = not self.state.is_paused
        elif key == ord("n"):
            self.state.next = True
        elif key == ord("h"):
            self.show_help = not self.show_help
        elif key == ord("a"):
            self.set_camera(yaw=self.yaw - 0.2)
        elif key == ord("d"):
            self.set_camera(yaw=self.yaw + 0.2)
        elif key == ord("w"):
            self.set_camera(radius=self.radius * 0.9)
        elif key == ord("s"):
            self.set_camera(radius=self.radius * 1.1)
        elif key == ord("o"):
            self.user_cam = False  # resume the auto-orbit
        # GUI → main runtime controls (reference main.py:368-386)
        elif key == ord("x"):
            self.state.render_mode = (
                "depth" if self.state.render_mode == "rgb" else "rgb")
        elif key == ord("i"):
            self.state.show_images = not self.state.show_images
        elif key == ord("g"):
            self.state.gs_on = not self.state.gs_on
        elif key == ord("p"):
            self.state.pointmap_mode = (
                "scatter" if self.state.pointmap_mode == "surfel"
                else "surfel")
        elif key == ord("k"):
            self.state.show_keyframes = not self.state.show_keyframes
        elif key == ord("e"):
            self.state.show_edges = not self.state.show_edges
        elif key == ord("["):
            self.state.C_conf_threshold = max(
                0.0, self.state.C_conf_threshold - 0.1)
        elif key == ord("]"):
            self.state.C_conf_threshold += 0.1
        elif key == ord(","):
            self.state.spatial_stride = max(
                1, self.state.spatial_stride - 1)
        elif key == ord("."):
            self.state.spatial_stride += 1
        elif key == ord("-"):
            if self.state.max_gaussians > 0:
                self.state.max_gaussians //= 2
            else:
                self.state.max_gaussians = 2 * 1024 * 1024
        elif key == ord("="):
            if self.state.max_gaussians > 0:
                self.state.max_gaussians *= 2

    def update(self):
        """One viewer tick; returns the current WindowMsg state."""
        canvas = self._compose()
        if not self.user_cam:
            self.yaw += 0.05  # slow auto-orbit until the user steers
        if self.headless:
            import cv2

            cv2.imwrite(str(self.out_dir / f"{self._frame_idx:06d}.png"),
                        cv2.cvtColor(canvas, cv2.COLOR_RGB2BGR))
        else:  # pragma: no cover - needs a display
            import cv2

            if not self._window_ready:
                cv2.namedWindow("splatt3r-slam-tpu")
                cv2.setMouseCallback("splatt3r-slam-tpu", self._on_mouse)
                self._window_ready = True
            cv2.imshow("splatt3r-slam-tpu", cv2.cvtColor(canvas,
                                                         cv2.COLOR_RGB2BGR))
            self._handle_key(cv2.waitKey(1) & 0xFF)
        # GUI → main channel (WindowMsg semantics): keep only the latest
        # state so an undrained queue cannot grow over a long run
        try_get_msg(self.msg_queue)
        self.msg_queue.put(self.state)
        self._frame_idx += 1
        return self.state

    def poll_msg(self):
        return try_get_msg(self.msg_queue)
