"""Frame state, keyframe store, and Gaussian pool (single-process).

Re-design of the reference's shared-memory data plane
(`splatt3r_slam/frame.py:17-463`). The reference needs cross-process CUDA
shared tensors + locks for its 3-process pipeline; on TPU the runtime is a
single host process with async dispatch, so:

- `Frame` is a light host dataclass holding device arrays;
- `KeyframeBuffer` keeps per-keyframe device arrays in host lists (append
  is O(1), no ring-buffer copies, no locks) while exposing the same API
  (append / last_keyframe / update_T_WCs / dirty tracking for viz);
- `GaussianPool` replaces SharedGaussians with a preallocated device pool
  written in fixed-size chunks (invalid gaussians carry opacity 0 so the
  rasterizer ignores them — masking instead of boolean compaction), with
  the same FIFO drop-oldest-half eviction policy (frame.py:421-434).
"""

from __future__ import annotations

import dataclasses
import functools
from enum import Enum
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from splatt3r_slam_tpu.lie import sim3


class Mode(Enum):
    INIT = 0
    TRACKING = 1
    RELOC = 2
    TERMINATED = 3


# -----------------------------------------------------------------------------
# Pointmap fusion (spec: frame.py:52-116, six filtering modes)
# -----------------------------------------------------------------------------

FILTERING_MODES = (
    "first",
    "recent",
    "best_score",
    "indep_conf",
    "weighted_pointmap",
    "weighted_spherical",
)


@jax.jit
def _fuse_weighted(X_old, C_old, X, C):
    Xn = (C_old * X_old + C * X) / (C_old + C)
    return Xn, C_old + C


@jax.jit
def _fuse_indep_conf(X_old, C_old, X, C):
    m = C > C_old
    return jnp.where(m, X, X_old), jnp.where(m, C, C_old)


@jax.jit
def _fuse_weighted_spherical(X_old, C_old, X, C):
    def to_sph(P):
        r = jnp.linalg.norm(P, axis=-1, keepdims=True)
        phi = jnp.arctan2(P[..., 1:2], P[..., 0:1])
        theta = jnp.arccos(jnp.clip(P[..., 2:3] / r, -1.0, 1.0))
        return jnp.concatenate([r, phi, theta], axis=-1)

    def to_cart(s):
        r, phi, theta = s[..., 0:1], s[..., 1:2], s[..., 2:3]
        st = jnp.sin(theta)
        return jnp.concatenate(
            [r * st * jnp.cos(phi), r * st * jnp.sin(phi), r * jnp.cos(theta)],
            axis=-1,
        )

    s = (C_old * to_sph(X_old) + C * to_sph(X)) / (C_old + C)
    return to_cart(s), C_old + C


@dataclasses.dataclass
class Frame:
    """Per-frame state (spec: frame.py:17-119)."""

    frame_id: int
    img: jnp.ndarray  # (1, h, w, 3) normalized NHWC
    img_shape: np.ndarray  # (1, 2) [h, w] after downsample
    img_true_shape: np.ndarray  # (1, 2)
    uimg: np.ndarray  # (h, w, 3) uint8 host (uimg01() for float)
    T_WC: jnp.ndarray = None  # (8,) Sim3
    # host copy of T_WC[:3], ridden on the fused tracker's flags pull —
    # lets the gaussian-append motion policy avoid a per-frame device sync
    T_WC_host: Optional[np.ndarray] = None
    X_canon: Optional[jnp.ndarray] = None  # (N, 3)
    C: Optional[jnp.ndarray] = None  # (N, 1)
    feat: Optional[jnp.ndarray] = None  # (1, P, 1024)
    pos: Optional[jnp.ndarray] = None  # (1, P, 2)
    N: int = 0
    N_updates: int = 0
    K: Optional[jnp.ndarray] = None
    score: float = 0.0
    gaussian_pred: Optional[dict] = None
    gaussian_pred_cross: Optional[dict] = None
    # decoder hook tokens kept by the tracking-mode frontend for lazy
    # Gaussian materialization (InferenceEngine.materialize_gaussians)
    gauss_hooks: Optional[dict] = None
    # one direction of the prospective (kf, frame) backend edge, computed
    # free by the fused tracking step (idx_j2i/valid_i/Qi, subgrid rows);
    # consumed by FactorGraph when the frame becomes a keyframe
    edge_half: Optional[dict] = None
    # Portrait frames run at their true orientation (the net is shape-
    # polymorphic; matches the reference's ManyAR portrait protocol,
    # dust3r/patch_embed.py:33-71 + dust3r/utils/misc.py:55-95).
    portrait: bool = False

    def __post_init__(self):
        if self.T_WC is None:
            self.T_WC = sim3.identity()

    def update_pointmap(self, X: jnp.ndarray, C: jnp.ndarray,
                        filtering_mode="weighted_pointmap",
                        filtering_score="median"):
        if self.N == 0:
            self.X_canon, self.C = X, C
            self.N = 1
            self.N_updates = 1
            if filtering_mode == "best_score":
                self.score = float(
                    jnp.median(C) if filtering_score == "median" else jnp.mean(C)
                )
            return
        if filtering_mode == "first":
            if self.N_updates == 1:
                self.X_canon, self.C, self.N = X, C, 1
        elif filtering_mode == "recent":
            self.X_canon, self.C, self.N = X, C, 1
        elif filtering_mode == "best_score":
            new_score = float(
                jnp.median(C) if filtering_score == "median" else jnp.mean(C)
            )
            if new_score > self.score:
                self.X_canon, self.C, self.N = X, C, 1
                self.score = new_score
        elif filtering_mode == "indep_conf":
            self.X_canon, self.C = _fuse_indep_conf(self.X_canon, self.C, X, C)
            self.N = 1
        elif filtering_mode == "weighted_pointmap":
            self.X_canon, self.C = _fuse_weighted(self.X_canon, self.C, X, C)
            self.N += 1
        elif filtering_mode == "weighted_spherical":
            self.X_canon, self.C = _fuse_weighted_spherical(
                self.X_canon, self.C, X, C
            )
            self.N += 1
        else:
            raise ValueError(f"unknown filtering_mode {filtering_mode}")
        self.N_updates += 1

    def get_average_conf(self):
        return self.C / self.N if self.C is not None else None

    def release_transients(self):
        """Drop per-frame prediction buffers once the gaussian pool has
        absorbed them (gaussian_pred ~22 MB + hook tokens ~50 MB per
        keyframe otherwise accumulate until HBM exhausts; the reference
        likewise keeps only pointmaps on keyframes, frame.py:17-119)."""
        self.gaussian_pred = None
        self.gaussian_pred_cross = None
        self.gauss_hooks = None
        # tracking-edge half (~1.8 MB at stride 1): consumed by
        # FactorGraph.add_neighbor_edge_from_tracking at this keyframe's
        # own backend event; if the config gate or a reloc skipped it,
        # drop it here instead of holding it for the keyframe's lifetime.
        # (A threaded-backend task that loses this benign race falls back
        # to full matching — the reader null-checks.)
        self.edge_half = None


@functools.lru_cache(maxsize=1)
def _device_normalize():
    """uint8 (h, w, 3) → fp32 (1, h, w, 3) in [-1, 1], computed on device.

    Shipping uint8 and normalizing on-chip cuts host→device bytes 4x —
    significant over a remote-TPU link (ImgNorm mean/std 0.5, spec
    `dust3r/dust3r/utils/image.py:23`)."""
    return jax.jit(lambda u8: u8.astype(jnp.float32)[None] / 127.5 - 1.0)


def uimg01(frame_or_arr) -> np.ndarray:
    """Frame.uimg as float [0, 1] (uimg is stored uint8 — converting
    ~7 MB/frame to float on the hot ingest path cost ~3 ms/frame of host
    time; keyframe consumers convert lazily here)."""
    u = frame_or_arr.uimg if hasattr(frame_or_arr, "uimg") else frame_or_arr
    u = np.asarray(u)
    return u.astype(np.float32) / 255.0 if u.dtype == np.uint8 else u


class FramePrefetcher:
    """1-deep lookahead frame source: dataset read + create_frame run on a
    worker thread so host ingest overlaps device compute (the reference
    runs its dataloader in a separate process, `main.py` 3-process
    pipeline; here a thread suffices — the tracker's only host work is a
    4-float sync)."""

    def __init__(self, load_fn, n: int):
        from concurrent.futures import ThreadPoolExecutor

        self._ex = ThreadPoolExecutor(1)
        self._load = load_fn
        self._n = n
        self._next = 0
        self._fut = self._ex.submit(load_fn, 0) if n > 0 else None

    def get(self, i: int):
        """Return item i (must be called with consecutive i from 0)."""
        if i != self._next:
            raise IndexError(
                f"FramePrefetcher.get({i}) out of order "
                f"(expected {self._next}); this source is sequential-only"
            )
        out = self._fut.result()
        self._next = i + 1
        if i + 1 < self._n:
            self._fut = self._ex.submit(self._load, i + 1)
        return out

    def close(self):
        self._ex.shutdown(wait=False, cancel_futures=True)


def create_frame(i, img, T_WC=None, img_size=512, downsample=1,
                 use_native=True) -> Frame:
    from splatt3r_slam_tpu.utils.image import resize_img

    out = None
    H0, W0 = img.shape[:2]
    if (img_size != 224 and max(H0, W0) == img_size and H0 % 16 == 0
            and W0 % 16 == 0 and H0 != W0):
        # already at target geometry: resize/crop are identity — go
        # straight to uint8 + device upload (camera/bench pipelines at
        # native working resolution skip ~8 ms/frame of host resampling)
        u8 = (img if img.dtype == np.uint8
              else np.uint8(np.clip(img, 0, 1) * 255))
        out = dict(unnormalized_img=u8, true_shape=np.int32([[H0, W0]]))
    if out is None and use_native and img_size != 224:
        try:
            from splatt3r_slam_tpu import native

            if native.available():
                out = native.resize_img_native(img, img_size)
        except Exception:
            out = None
    if out is None:
        out = resize_img(img, img_size)
    rgb = _device_normalize()(jnp.asarray(out["unnormalized_img"]))
    img_shape = out["true_shape"].copy()
    uimg = out["unnormalized_img"]  # uint8; consumers use uimg01()
    # Portrait frames run at their true orientation: the net is shape-
    # polymorphic and the reference's ManyAR patch embed computes portrait
    # tokens/RoPE at portrait orientation (verified checkpoint-parity in
    # tests/test_reference_parity.py::test_portrait_forward_parity) —
    # transposing to landscape would change RoPE and the DPT convs.
    portrait = rgb.shape[1] > rgb.shape[2]
    if downsample > 1:
        uimg = uimg[::downsample, ::downsample]
        img_shape = img_shape // downsample
    return Frame(i, rgb, img_shape, img_shape.copy(), uimg,
                 T_WC if T_WC is not None else sim3.identity(),
                 portrait=portrait)


class KeyframeBuffer:
    """Keyframe store with the SharedKeyframes API (spec: frame.py:247-354).

    Device arrays live in host lists (no locks needed single-process, no
    full-buffer copies on append). `buffer` caps capacity like the
    reference's 512-slot ring.
    """

    def __init__(self, h: int, w: int, buffer: int = 512):
        self.h, self.w = h, w
        self.buffer = buffer
        self.frames: list[Frame] = []
        self.is_dirty: list[bool] = []
        self.K: Optional[jnp.ndarray] = None

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, idx) -> Frame:
        kf = self.frames[idx]
        if self.K is not None:
            kf.K = self.K
        return kf

    def __setitem__(self, idx, value: Frame):
        self.frames[idx] = value
        self.is_dirty[idx] = True

    def append(self, value: Frame):
        if len(self.frames) == self.buffer:
            # The reference's 512-slot ring hard-fails past capacity
            # (frame.py:248,322); ours is a host list, so a long sequence
            # can continue — warn once instead of killing the run. Device
            # memory still grows ~6 MB per 512x384 keyframe: the backend's
            # max_edges window stops optimizing old keyframes, but their
            # pointmaps stay resident for retrieval/reloc.
            print(
                f"WARNING: keyframe count exceeds the reference buffer "
                f"capacity ({self.buffer}); continuing with an unbounded "
                f"buffer (device memory grows per keyframe)."
            )
        self.frames.append(value)
        self.is_dirty.append(True)

    def pop_last(self):
        self.frames.pop()
        self.is_dirty.pop()

    def last_keyframe(self) -> Optional[Frame]:
        return self.frames[-1] if self.frames else None

    def update_T_WCs(self, T_WCs: jnp.ndarray, idx) -> None:
        # one fetch + per-row device_put: per-row eager slicing compiles a
        # tiny program per keyframe on remote-TPU platforms (~seconds)
        rows = np.asarray(T_WCs)
        for k, i in enumerate(np.atleast_1d(np.asarray(idx))):
            self.frames[int(i)].T_WC = jnp.asarray(rows[k])
            self.frames[int(i)].T_WC_host = rows[k][:3].copy()
            self.is_dirty[int(i)] = True

    def release_older_transients(self):
        """Release prediction buffers on all but the newest keyframe (the
        current one may still be rendered / re-materialized this frame)."""
        for f in self.frames[:-1]:
            f.release_transients()

    def get_dirty_idx(self):
        idx = [i for i, d in enumerate(self.is_dirty) if d]
        for i in idx:
            self.is_dirty[i] = False
        return idx

    def set_intrinsics(self, K):
        self.K = jnp.asarray(K, jnp.float32)

    def get_intrinsics(self):
        return self.K

    # --- batched views for the backend solver ---
    def stacked(self, idx):
        """(T_WC (m,8), X (m,N,3), C_avg (m,N,1)) for keyframe indices."""
        fr = [self.frames[int(i)] for i in idx]
        T = jnp.stack([f.T_WC for f in fr])
        X = jnp.stack([f.X_canon for f in fr])
        C = jnp.stack([f.get_average_conf() for f in fr])
        return T, X, C


def _pool_append(buf, means, cov_triu, colors, opacities, start,
                 opacity_threshold):
    """Pack + threshold + write in ONE program (each eager op on this
    per-append path costs a dispatch round-trip on a remote-TPU
    platform)."""
    opa = jnp.where(opacities > opacity_threshold, opacities, 0.0)
    chunk = jnp.concatenate(
        [means, cov_triu, colors, opa[:, None]], axis=-1
    ).astype(jnp.float32)
    return jax.lax.dynamic_update_slice_in_dim(buf, chunk, start, axis=0)


_pool_append_jit = jax.jit(_pool_append, donate_argnums=0,
                           static_argnames=("opacity_threshold",))


class GaussianPool:
    """World-space Gaussian accumulator (spec: frame.py:357-463).

    Fixed-size chunk writes with opacity-masked invalids (static shapes →
    no recompiles); drop-oldest-half FIFO eviction. Fields: means (M,3),
    cov_triu (M,6), colors (M,3), opacities (M,), kf_id (M,).
    """

    def __init__(self, max_gaussians: int = 4 * 1024 * 1024):
        self.max_gaussians = int(max_gaussians)
        self.n = 0
        self.data = jnp.zeros((self.max_gaussians, 13), jnp.float32)
        self.kf_id = np.zeros((self.max_gaussians,), np.int32)

    def append_chunk(self, means, cov_triu, colors, opacities, kf_idx: int,
                     opacity_threshold: float = 0.05):
        """Append a fixed-size chunk; sub-threshold opacities are zeroed
        (ignored by the rasterizer) rather than compacted."""
        g = means.shape[0]
        if g > self.max_gaussians:
            means = means[: self.max_gaussians]
            cov_triu = cov_triu[: self.max_gaussians]
            colors = colors[: self.max_gaussians]
            opacities = opacities[: self.max_gaussians]
            g = self.max_gaussians
        if self.n + g > self.max_gaussians:
            half = self.max_gaussians // 2
            keep = self.data[self.n - half : self.n]
            self.data = jnp.zeros_like(self.data).at[:half].set(keep)
            self.kf_id[:half] = self.kf_id[self.n - half : self.n]
            self.n = half
        # start offset as a TRACED operand: a python-int start bakes into
        # the program as a constant, so every append at a new offset
        # would recompile (~5 s each over a remote-TPU tunnel)
        self.data = _pool_append_jit(
            self.data, means, cov_triu, colors, opacities,
            jnp.asarray(self.n, jnp.int32),
            opacity_threshold=float(opacity_threshold),
        )
        self.kf_id[self.n : self.n + g] = kf_idx
        self.n += g

    def get_all(self):
        if self.n == 0:
            return None
        d = self.data[: self.n]
        return d[:, 0:3], d[:, 3:9], d[:, 9:12], d[:, 12]

    def clear(self):
        self.n = 0
