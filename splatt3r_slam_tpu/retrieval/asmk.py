"""ASMK-style binary aggregated match kernel + incremental inverted file.

Spec: the reference's asmk/faiss pipeline as configured in
`mast3r/retrieval/processor.py:91-99` — binary kernel, no IDF, multiple
assignment 1 (build) / 5 (query), similarity σ(s) = s·|s|^(α−1) gated at
threshold 0 with α=3 — and the custom paths in
`splatt3r_slam/retrieval_database.py:96-166` (matmul-trick quantization,
query-then-add with reused top-k codes).

TPU split: quantization (distance matmul + top-k) and residual
aggregation/binarization run on device; the inverted file is append-only
host numpy (tiny, inherently dynamic — SURVEY.md §7 hard-part 7) and never
blocks the device pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


class _Shim:
    """Permissive stand-in for classes from packages absent here (asmk,
    faiss): accepts any construction/state protocol pickle throws at it."""

    def __init__(self, *args, **kwargs):
        self._shim_args = args
        self._shim_kwargs = kwargs

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self._shim_state = state

    def __call__(self, *args, **kwargs):  # e.g. unpickled factory fns
        return _Shim(*args, **kwargs)


class _ShimUnpickler:
    """pickle.Unpickler with a fallback find_class (see Codebook.load)."""

    def __new__(cls, f):
        import pickle

        class _U(pickle.Unpickler):
            def find_class(self, module, name):
                try:
                    return super().find_class(module, name)
                except (ImportError, AttributeError):
                    return type(name, (_Shim,), {"__module__": module})

        return _U(f)


def _shim_unpickle(path: str):
    with open(path, "rb") as f:
        return _ShimUnpickler(f).load()


def _find_centroids(obj) -> np.ndarray | None:
    """BFS the unpickled graph for the visual-word centroid matrix."""
    from collections import deque

    named, arrays = [], []
    seen = set()
    q = deque([(None, obj)])
    while q:
        key, node = q.popleft()
        if id(node) in seen:
            continue
        seen.add(id(node))
        if isinstance(node, np.ndarray):
            if node.ndim == 2 and node.dtype.kind == "f" and node.size:
                (named if _is_centroid_name(key) else arrays).append(node)
            continue
        if isinstance(node, dict):
            q.extend(node.items())
        elif isinstance(node, (list, tuple)):
            q.extend((key, v) for v in node)
        elif hasattr(node, "__dict__"):
            q.extend(node.__dict__.items())
    pool = named or arrays
    if not pool:
        return None
    return max(pool, key=lambda a: a.size)


def _is_centroid_name(key) -> bool:
    return isinstance(key, str) and any(
        s in key.lower() for s in ("centroid", "codebook", "cluster")
    )


class Codebook:
    """Visual-word centroids (K, D)."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = np.asarray(centroids, np.float32)
        self._dev = jnp.asarray(self.centroids)

    @property
    def size(self):
        return self.centroids.shape[0]

    @staticmethod
    def random(k: int, d: int, seed: int = 0) -> "Codebook":
        rng = np.random.default_rng(seed)
        c = rng.standard_normal((k, d)).astype(np.float32)
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        return Codebook(c)

    @staticmethod
    def train_kmeans(data: np.ndarray, k: int, iters: int = 20,
                     seed: int = 0) -> "Codebook":
        """Simple device k-means (codebook training capability parity)."""
        rng = np.random.default_rng(seed)
        init = data[rng.choice(len(data), size=k, replace=len(data) < k)]
        cent = jnp.asarray(init, jnp.float32)
        X = jnp.asarray(data, jnp.float32)

        @jax.jit
        def step(cent):
            d2 = (
                jnp.sum(X**2, 1)[:, None]
                + jnp.sum(cent**2, 1)[None, :]
                - 2 * X @ cent.T
            )
            a = jnp.argmin(d2, axis=1)
            sums = jnp.zeros_like(cent).at[a].add(X)
            cnts = jnp.zeros((cent.shape[0], 1)).at[a].add(1.0)
            return jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1), cent)

        for _ in range(iters):
            cent = step(cent)
        return Codebook(np.asarray(cent))

    @staticmethod
    def load(path: str) -> "Codebook":
        """Load a reference `*_codebook.pkl` (asmk dump).

        The reference builds its codebook with
        `ASMKMethod.initialize_untrained(...).train_codebook(None,
        cache_path=...)` (`mast3r/retrieval/processor.py:91-99`), whose
        cache is a pickle of asmk-library objects. The `asmk` package is
        not importable here, so unpickling uses a shim `find_class` that
        substitutes a tolerant stand-in type for any unresolvable class,
        then walks the recovered object graph for the centroid matrix
        (preferring attributes/keys literally named like centroids, else
        the largest float 2-D array).
        """
        obj = _shim_unpickle(path)
        cent = _find_centroids(obj)
        if cent is None:
            raise ValueError(f"cannot extract centroids from {path}")
        return Codebook(cent)


@functools.partial(jax.jit, static_argnames=("ma",))
def quantize(qvecs: jnp.ndarray, centroids: jnp.ndarray, ma: int = 1):
    """Top-`ma` nearest centroids via the expanded-L2 matmul trick
    (spec: retrieval_database.py:96-105)."""
    d2 = (
        jnp.sum(qvecs**2, axis=1)[:, None]
        + jnp.sum(centroids**2, axis=1)[None, :]
        - 2 * qvecs @ centroids.T
    )
    _, idx = jax.lax.top_k(-d2, ma)
    return idx  # (n, ma)


def aggregate_binary(vecs: np.ndarray, word_ids: np.ndarray,
                     centroids: np.ndarray):
    """Per-word residual sum → sign-binarized descriptors.

    vecs (n, D); word_ids (n·ma,) flattened assignments aligned with
    vecs repeated ma times. Returns (words (w,), bits (w, D) uint8 packed
    along D/8).
    """
    order = np.argsort(word_ids, kind="stable")
    w_sorted = word_ids[order]
    v_sorted = vecs[order]
    c_sorted = centroids[w_sorted]
    resid = v_sorted - c_sorted
    words, starts = np.unique(w_sorted, return_index=True)
    # segment sums as cumsum differences — np.add.reduceat is scalar-slow
    # (~32 ms on the (1500, 1024) query aggregate vs ~2 ms this way).
    # float64 accumulation: a f32 running sum reaches O(100) while true
    # per-segment sums can sit near zero, so f32 cumsum cancellation
    # (~1e-3 abs) could flip sign bits vs the exact per-segment reduction
    cs = np.cumsum(resid, axis=0, dtype=np.float64)
    ends = np.concatenate([starts[1:], [resid.shape[0]]])
    sums = cs[ends - 1].copy()
    nz = starts > 0
    sums[nz] -= cs[starts[nz] - 1]
    bits = np.packbits((sums > 0).astype(np.uint8), axis=1)
    return words.astype(np.int64), bits


def _pack_bits_jax(bools: jnp.ndarray) -> jnp.ndarray:
    """(..., D) bool → (..., D/8) uint8 in np.packbits 'big' bit order."""
    x = bools.astype(jnp.uint8).reshape(*bools.shape[:-1], -1, 8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return (x * weights).sum(-1).astype(jnp.uint8)


def aggregate_binary_jax(vecs: jnp.ndarray, words: jnp.ndarray,
                         centroids: jnp.ndarray):
    """Device-side aggregate_binary (jit-composable).

    vecs (n, D) f32; words (n, ma) int; centroids device (K, D).
    Returns (words (N,) int32, bits (N, D/32) int32 [byte-packed sign
    bits, little-endian within each int32], valid (N,) bool) with
    N = n·ma fixed rows; segment sums occupy the leading `valid` rows in
    ascending word order — identical content to the host
    `aggregate_binary` after filtering by `valid`."""
    n, ma = words.shape
    D = vecs.shape[1]
    v = jnp.repeat(vecs, ma, axis=0)  # (N, D)
    w = words.reshape(-1)
    order = jnp.argsort(w, stable=True)
    ws = w[order]
    resid = v[order] - centroids[ws]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), ws[1:] != ws[:-1]])
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    N = ws.shape[0]
    sums = jax.ops.segment_sum(resid, seg, num_segments=N)
    words_out = jax.ops.segment_max(ws.astype(jnp.int32), seg,
                                    num_segments=N)
    valid = jnp.arange(N) < seg[-1] + 1
    bits = _pack_bits_jax(sums > 0)  # (N, D/8) uint8
    bits_i32 = jax.lax.bitcast_convert_type(
        bits.reshape(N, D // 32, 4), jnp.int32)
    return words_out, bits_i32, valid


_POPCNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                        axis=1).sum(1).astype(np.int32)


def binary_similarity(qbits: np.ndarray, dbits: np.ndarray, dim: int,
                      alpha: float = 3.0, threshold: float = 0.0):
    """σ over packed bit descriptors: s = 1 − 2·hamming/D, gated + powered
    (asmk binary kernel semantics)."""
    ham = _POPCNT[np.bitwise_xor(qbits, dbits)].sum(axis=-1)
    s = 1.0 - 2.0 * ham / dim
    out = np.sign(s) * np.abs(s) ** alpha
    return np.where(s >= threshold, out, 0.0)


class IVF:
    """Append-only inverted file: word → (image ids, packed residual bits).

    Host-side numpy (the reference keeps this in asmk's Cython IVF builder;
    it is tiny at SLAM scale and inherently dynamic)."""

    def __init__(self, n_words: int, dim: int):
        self.n_words = n_words
        self.dim = dim
        # pending per-add chunks, consolidated lazily into word-sorted
        # flat posting arrays (CSR-style) at the next search: the whole
        # query then runs as a handful of vectorized numpy ops instead of
        # a Python loop over query words (~0.2 ms x ~1500 words measured)
        self._pending: list[tuple[np.ndarray, np.ndarray, int]] = []
        self._words = np.zeros((0,), np.int64)  # sorted
        self._bits = np.zeros((0, dim // 8), np.uint8)
        self._imids = np.zeros((0,), np.int64)
        self.n_images = 0
        self.image_norms: list[float] = []  # per-image Σ self-sim = n_words

    def add(self, words: np.ndarray, bits: np.ndarray, imid: int):
        self._pending.append((np.asarray(words, np.int64),
                              np.asarray(bits, np.uint8), int(imid)))
        self.image_norms.append(max(len(words), 1))
        self.n_images = max(self.n_images, imid + 1)

    def _consolidate(self):
        if not self._pending:
            return
        w = np.concatenate([self._words] + [p[0] for p in self._pending])
        b = np.concatenate([self._bits] + [p[1] for p in self._pending])
        i = np.concatenate(
            [self._imids]
            + [np.full(len(p[0]), p[2], np.int64) for p in self._pending]
        )
        order = np.argsort(w, kind="stable")
        self._words, self._bits, self._imids = w[order], b[order], i[order]
        self._pending = []

    def search(self, words: np.ndarray, bits: np.ndarray, alpha=3.0,
               threshold=0.0):
        """Scores against every stored image (ASMK normalized)."""
        self._consolidate()
        scores = np.zeros(self.n_images, np.float64)
        lo = np.searchsorted(self._words, words, side="left")
        hi = np.searchsorted(self._words, words, side="right")
        lens = hi - lo
        total = int(lens.sum())
        if total:
            shift = np.concatenate([[0], np.cumsum(lens)[:-1]])
            sel = np.arange(total) + np.repeat(lo - shift, lens)
            qsel = np.repeat(np.arange(len(words)), lens)
            s = binary_similarity(bits[qsel], self._bits[sel], self.dim,
                                  alpha, threshold)
            np.add.at(scores, self._imids[sel], s)
        qn = np.sqrt(max(len(words), 1))
        xn = np.sqrt(np.asarray(self.image_norms[: self.n_images]))
        return scores / (qn * xn)
