"""Loop-closure retrieval database (query-then-add).

Spec: reference `splatt3r_slam/retrieval_database.py:9-166` — per-keyframe
top-k attention features, ASMK quantize/aggregate/IVF-search, query before
(optionally) adding, own keyframe counter, min-threshold gating.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from splatt3r_slam_tpu.retrieval import asmk as asmk_mod
from splatt3r_slam_tpu.retrieval.model import (
    init_retrieval_params,
    load_retrieval_checkpoint,
    prep_features,
)


@functools.partial(jax.jit, static_argnames=("nfeat", "residual", "ma"))
def _update_device_jit(params, backbone_feat, centroids, nfeat, residual,
                       ma):
    """Whole retrieval-update device program as ONE dispatch: feature
    head (whiten/project/top-k) + codebook quantization + binary ASMK
    aggregation for BOTH the ma-way query and the 1-way database add.
    Output is ONE packed int32 matrix — eagerly this path is ~15
    dispatch round-trips plus a 1.2 MB feature pull and ~45 ms of host
    segment sums per keyframe; here the host receives only ~250 KB of
    words+bits in a single fetch (~35 ms tunnel round-trip total)."""
    feat = prep_features(params, backbone_feat, nfeat=nfeat,
                         residual=residual)[0]
    words = asmk_mod.quantize(feat, centroids, ma)  # (n, ma)

    def pack(w, b, v):
        return jnp.concatenate(
            [w[:, None], b, v[:, None].astype(jnp.int32)], axis=1)

    qw, qb, qv = asmk_mod.aggregate_binary_jax(feat, words, centroids)
    aw, ab, av = asmk_mod.aggregate_binary_jax(feat, words[:, :1],
                                               centroids)
    return jnp.concatenate([pack(qw, qb, qv), pack(aw, ab, av)], axis=0)


class RetrievalDatabase:
    """update(frame, add_after_query, k, min_thresh) → prior keyframe ids."""

    def __init__(self, checkpoint_path=None, codebook_path=None,
                 feat_dim: int = 1024, proj_dim: int = 1024,
                 n_words: int = 65536, nfeat: int = 300, seed: int = 0,
                 ma_query: int = 5, alpha: float = 3.0):
        if checkpoint_path is not None:
            self.params = load_retrieval_checkpoint(checkpoint_path)
            self.nfeat = self.params.get("nfeat", nfeat)
            proj_dim = self.params["postwhiten"]["p"].shape[0]
        else:
            self.params = init_retrieval_params(feat_dim, (proj_dim,), seed)
            self.nfeat = nfeat
        if codebook_path is not None:
            self.codebook = asmk_mod.Codebook.load(codebook_path)
        else:
            self.codebook = asmk_mod.Codebook.random(n_words, proj_dim, seed)
        self.ivf = asmk_mod.IVF(self.codebook.size, proj_dim)
        # device-resident copy of the head weights: numpy leaves in a jit
        # call's args re-upload ~12 MB over the tunnel on EVERY dispatch
        # (~200 ms measured); put them on device once
        self._residual = bool(self.params.get("residual", False))
        self._params_dev = jax.device_put(
            {"prewhiten": self.params["prewhiten"],
             "postwhiten": self.params["postwhiten"],
             "projector": self.params["projector"]}
        )
        self.ma_query = ma_query
        self.alpha = alpha
        self.kf_counter = 0
        self.kf_ids: list[int] = []

    # ------------------------------------------------------------------
    def prep_features(self, backbone_feat):
        return prep_features(
            self.params, backbone_feat, nfeat=self.nfeat,
            residual=bool(self.params.get("residual", False)),
        )

    def _quantize_aggregate(self, feat_np: np.ndarray, ma: int,
                            words_ma: np.ndarray | None = None):
        if words_ma is None:
            words_ma = np.asarray(
                asmk_mod.quantize(jnp.asarray(feat_np), self.codebook._dev,
                                  ma)
            )  # (n, ma)
        vecs = np.repeat(feat_np, ma, axis=0)
        return asmk_mod.aggregate_binary(
            vecs, words_ma.reshape(-1), self.codebook.centroids
        )

    def _device_update(self, backbone_feat):
        """One device dispatch + ONE host pull: returns
        ((qwords, qbits), (awords, abits)) host arrays for the ma-way
        query and the 1-way add (bits (m, D/8) uint8, packbits order)."""
        packed = np.asarray(_update_device_jit(
            self._params_dev, backbone_feat, self.codebook._dev,
            self.nfeat, self._residual, self.ma_query,
        ))
        # rows = n_feat·ma (query) + n_feat (add); n_feat can be below
        # self.nfeat when the image has fewer tokens
        nq = packed.shape[0] // (self.ma_query + 1) * self.ma_query

        def unpack(rows):
            valid = rows[:, -1] > 0
            rows = rows[valid]
            words = rows[:, 0].astype(np.int64)
            bits = np.ascontiguousarray(rows[:, 1:-1]).view(np.uint8)
            return words, bits.reshape(len(rows), -1)

        return unpack(packed[:nq]), unpack(packed[nq:])

    def update(self, frame, add_after_query: bool, k: int,
               min_thresh: float = 0.0):
        """Query the database with this frame, then optionally add it.

        Returns database indices (== keyframe order of addition) of the
        top-k matches above min_thresh (retrieval_database.py:43-72)."""
        (qw, qb), (aw, ab) = self._device_update(frame.feat)

        topk_inds: list[int] = []
        if self.kf_counter > 0:
            scores = self.ivf.search(qw, qb, alpha=self.alpha)
            k_eff = min(k, self.ivf.n_images)
            order = np.argsort(-scores)[:k_eff]
            topk_inds = [int(i) for i in order if scores[i] > min_thresh]

        if add_after_query:
            self._add_np(aw, ab)
        return topk_inds

    def query(self, feat_np: np.ndarray,
              words_ma: np.ndarray | None = None) -> np.ndarray:
        words, bits = self._quantize_aggregate(feat_np, self.ma_query,
                                               words_ma=words_ma)
        return self.ivf.search(words, bits, alpha=self.alpha)

    def add_to_database(self, frame):
        _, (aw, ab) = self._device_update(frame.feat)
        self._add_np(aw, ab)

    def add_to_database_np(self, feat_np: np.ndarray,
                           words1: np.ndarray | None = None):
        words, bits = self._quantize_aggregate(feat_np, ma=1,
                                               words_ma=words1)
        self._add_np(words, bits)

    def _add_np(self, words: np.ndarray, bits: np.ndarray):
        self.ivf.add(words, bits, self.kf_counter)
        self.kf_ids.append(self.kf_counter)
        self.kf_counter += 1
