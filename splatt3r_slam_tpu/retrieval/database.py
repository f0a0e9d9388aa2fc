"""Loop-closure retrieval database (query-then-add).

Spec: reference `splatt3r_slam/retrieval_database.py:9-166` — per-keyframe
top-k attention features, ASMK quantize/aggregate/IVF-search, query before
(optionally) adding, own keyframe counter, min-threshold gating.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from splatt3r_slam_tpu.retrieval import asmk as asmk_mod
from splatt3r_slam_tpu.retrieval.model import (
    init_retrieval_params,
    load_retrieval_checkpoint,
    prep_features,
)


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

    def _quantize_aggregate(self, feat_np: np.ndarray, ma: int):
        words_ma = np.asarray(
            asmk_mod.quantize(jnp.asarray(feat_np), self.codebook._dev, ma)
        )  # (n, ma)
        vecs = np.repeat(feat_np, ma, axis=0)
        return asmk_mod.aggregate_binary(
            vecs, words_ma.reshape(-1), self.codebook.centroids
        )

    def update(self, frame, add_after_query: bool, k: int,
               min_thresh: float = 0.0):
        """Query the database with this frame, then optionally add it.

        Returns database indices (== keyframe order of addition) of the
        top-k matches above min_thresh (retrieval_database.py:43-72)."""
        feat = self.prep_features(frame.feat)
        feat_np = np.asarray(feat[0], np.float32)

        topk_inds: list[int] = []
        if self.kf_counter > 0:
            scores = self.query(feat_np)
            k_eff = min(k, self.ivf.n_images)
            order = np.argsort(-scores)[:k_eff]
            topk_inds = [int(i) for i in order if scores[i] > min_thresh]

        if add_after_query:
            self.add_to_database_np(feat_np)
        return topk_inds

    def query(self, feat_np: np.ndarray) -> np.ndarray:
        words, bits = self._quantize_aggregate(feat_np, self.ma_query)
        return self.ivf.search(words, bits, alpha=self.alpha)

    def add_to_database(self, frame):
        feat = self.prep_features(frame.feat)
        self.add_to_database_np(np.asarray(feat[0], np.float32))

    def add_to_database_np(self, feat_np: np.ndarray):
        words, bits = self._quantize_aggregate(feat_np, ma=1)
        self.ivf.add(words, bits, self.kf_counter)
        self.kf_ids.append(self.kf_counter)
        self.kf_counter += 1
