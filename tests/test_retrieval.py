"""Retrieval / loop-closure tests on synthetic feature clusters."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from splatt3r_slam_tpu.retrieval import RetrievalDatabase
from splatt3r_slam_tpu.retrieval import asmk as asmk_mod
from splatt3r_slam_tpu.retrieval.model import (
    init_retrieval_params,
    prep_features,
)


@dataclasses.dataclass
class FakeFrame:
    feat: jnp.ndarray


def _scene_feat(rng, center, n_tokens=64, dim=64, noise=0.05):
    f = center[None] + rng.normal(size=(n_tokens, dim)) * noise
    return jnp.asarray(f[None], jnp.float32)


def _db(dim=64):
    return RetrievalDatabase(feat_dim=dim, proj_dim=dim, n_words=512,
                             nfeat=32)


def test_quantize_nearest(rng):
    cb = asmk_mod.Codebook.random(64, 16)
    q = cb.centroids[5][None] + 1e-4
    idx = np.asarray(asmk_mod.quantize(jnp.asarray(q), cb._dev, 3))
    assert idx[0, 0] == 5


def test_kmeans_centroids(rng):
    centers = rng.normal(size=(4, 8)).astype(np.float32) * 5
    data = np.concatenate(
        [c + rng.normal(size=(50, 8)).astype(np.float32) * 0.1
         for c in centers]
    )
    cb = asmk_mod.Codebook.train_kmeans(data, 4, iters=30)
    # every true center has a nearby learned centroid
    d = np.linalg.norm(centers[:, None] - cb.centroids[None], axis=-1)
    assert (d.min(axis=1) < 0.5).all()


def test_binary_similarity_extremes():
    a = np.packbits(np.ones(64, np.uint8))
    b = np.packbits(np.zeros(64, np.uint8))
    s_same = asmk_mod.binary_similarity(a, a, 64)
    s_opp = asmk_mod.binary_similarity(a, b, 64)
    np.testing.assert_allclose(s_same, 1.0)
    np.testing.assert_allclose(s_opp, 0.0)  # thresholded at 0


def test_prep_features_shape(rng):
    params = init_retrieval_params(32, (32,))
    feat = jnp.asarray(rng.normal(size=(1, 100, 32)), jnp.float32)
    out = prep_features(params, feat, nfeat=10)
    assert out.shape == (1, 10, 32)


def test_query_returns_matching_scene(rng):
    db = _db()
    centers = [rng.normal(size=64) * 3 for _ in range(4)]
    # add four distinct scenes
    for c in centers:
        db.update(FakeFrame(_scene_feat(rng, c)), add_after_query=True, k=3)
    assert db.kf_counter == 4
    # query near scene 2 without adding
    res = db.update(FakeFrame(_scene_feat(rng, centers[2], noise=0.08)),
                    add_after_query=False, k=1, min_thresh=1e-3)
    assert res == [2], res


def test_min_thresh_filters_unrelated(rng):
    db = _db()
    for _ in range(3):
        db.update(FakeFrame(_scene_feat(rng, rng.normal(size=64) * 3)),
                  add_after_query=True, k=3)
    # a wildly different scene should not pass a high threshold
    res = db.update(FakeFrame(_scene_feat(rng, rng.normal(size=64) * 50)),
                    add_after_query=False, k=3, min_thresh=0.9)
    assert res == []


def test_first_update_adds_without_query(rng):
    db = _db()
    res = db.update(FakeFrame(_scene_feat(rng, rng.normal(size=64))),
                    add_after_query=True, k=3)
    assert res == []
    assert db.kf_counter == 1
    assert db.ivf.n_images == 1
