"""Unit tests for the training-data operators (ops/)."""

import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from ci_log_processing_ray.ops.dedup import (
    embedding_dedup,
    exact_dedup,
    minhash_lsh_dedup,
    simhash_clusters,
)
from ci_log_processing_ray.ops.multimodal import (
    AudioFrameSampler,
    ImageDecoder,
    decode_images,
    encode_fake_image,
)
from ci_log_processing_ray.ops.similarity import knn_bruteforce, knn_lsh
from ci_log_processing_ray.ops.window import forward_fill_by_group, sessionize


def test_exact_dedup(ray_session):
    rows = [
        {"doc_id": 3, "text": "aaa"},
        {"doc_id": 1, "text": "aaa"},
        {"doc_id": 2, "text": "bbb"},
        {"doc_id": 4, "text": "ccc"},
        {"doc_id": 5, "text": "ccc"},
        {"doc_id": 6, "text": "ccc"},
    ]
    out = exact_dedup(ray.data.from_items(rows), "text", "doc_id").to_pandas()
    got = {r.text: (r.doc_id, r.dup_count) for r in out.itertuples()}
    assert got == {"aaa": (1, 2), "bbb": (2, 1), "ccc": (4, 3)}


def test_minhash_finds_near_duplicates(ray_session):
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep green forest while the sun slowly sets") * 3
    near = base.replace("slowly", "quickly")
    far = "completely different content with nothing shared at all " * 6
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": near},
        {"doc_id": 3, "text": far},
    ]
    out = minhash_lsh_dedup(ray.data.from_items(rows), "text", "doc_id",
                            jaccard_threshold=0.7)
    clusters = dict(zip(out["doc_id"], out["cluster_rep"]))
    assert clusters.get(1) == 1 and clusters.get(2) == 1
    assert clusters.get(3, 3) == 3  # far doc not merged into cluster 1


def test_simhash_buckets_identical_bags(ray_session):
    rows = [
        {"doc_id": 1, "text": "alpha beta gamma"},
        {"doc_id": 2, "text": "gamma beta alpha"},  # same bag of words
        {"doc_id": 3, "text": "delta epsilon zeta eta theta"},
    ]
    out = simhash_clusters(ray.data.from_items(rows), "text", "doc_id").to_pandas()
    by_id = out.set_index("doc_id")
    assert by_id.loc[1, "simhash"] == by_id.loc[2, "simhash"]
    assert by_id.loc[1, "bucket_size"] == 2
    assert by_id.loc[3, "bucket_size"] == 1


def test_embedding_dedup(ray_session):
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((20, 64)).astype(np.float32)
    vecs[7] = vecs[3] * 2.5  # same direction -> cosine 1
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(20)]
    out = embedding_dedup(ray.data.from_items(rows), "embedding", "vec_id",
                          cosine_threshold=0.95)
    clusters = dict(zip(out["vec_id"], out["cluster_rep"]))
    assert clusters.get(3) == 3 and clusters.get(7) == 3


def test_knn_bruteforce_matches_numpy(ray_session):
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((100, 64))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(100)]
    q = vecs[:2]
    got = knn_bruteforce(ray.data.from_items(rows), "embedding", "vec_id",
                         q, [0, 1], k=5)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = vn @ qn.T
    for qi in (0, 1):
        order = np.lexsort((np.arange(100), -sims[:, qi]))[:5]
        want = list(order)
        sub = got[got["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
        assert sub == want, (qi, sub, want)


def test_knn_lsh_finds_planted_neighbors(ray_session):
    # LSH on isotropic random data has inherently poor recall (neighbors
    # are near-orthogonal); the meaningful property is that genuinely
    # close vectors share buckets.  Plant 5 near-copies of each query.
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((300, 64))
    for qi in (0, 1, 2):
        for j in range(5):
            vecs[50 + 10 * qi + j] = vecs[qi] + 0.05 * rng.standard_normal(64)
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(300)]
    q = vecs[:3].copy()
    approx = knn_lsh(ray.data.from_items(rows), "embedding", "vec_id",
                     q, [0, 1, 2], k=6, n_planes=8)
    for qi in (0, 1, 2):
        sub = approx[approx["query_id"] == qi].sort_values("rank")
        got = set(sub["vec_id"])
        planted = {qi} | {50 + 10 * qi + j for j in range(5)}
        assert sub.iloc[0]["vec_id"] == qi  # self-match survives
        # most planted near-copies land in probed buckets
        assert len(got & planted) >= 4, (qi, got, planted)


def test_sessionize(ray_session):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        {"event_id": 1, "user_id": 1, "ts": t0},
        {"event_id": 2, "user_id": 1, "ts": t0 + datetime.timedelta(minutes=10)},
        {"event_id": 3, "user_id": 1, "ts": t0 + datetime.timedelta(minutes=50)},
        {"event_id": 4, "user_id": 2, "ts": t0},
    ]
    out = sessionize(ray.data.from_items(rows), "user_id", "ts",
                     gap=datetime.timedelta(minutes=30),
                     tiebreak_cols=["event_id"]).to_pandas()
    sess = out.set_index("event_id")["session_id"].to_dict()
    assert sess == {1: 0, 2: 0, 3: 1, 4: 0}


def test_forward_fill_by_group(ray_session):
    rows = [
        {"k": "a", "i": 1, "v": None},
        {"k": "a", "i": 2, "v": 10.0},
        {"k": "a", "i": 3, "v": None},
        {"k": "b", "i": 1, "v": None},
    ]
    out = forward_fill_by_group(
        ray.data.from_items(rows), "k", "i", "v",
        fill_leading=-1.0, out_col="vf").to_pandas()
    got = {(r.k, r.i): r.vf for r in out.itertuples()}
    assert got == {("a", 1): -1.0, ("a", 2): 10.0, ("a", 3): 10.0, ("b", 1): -1.0}


def test_image_decoder_roundtrip():
    payload = encode_fake_image(5, 24, 16)
    dec = ImageDecoder()
    batch = pa.table({"media_id": pa.array([5], type=pa.int64()),
                      "payload": pa.array([payload], type=pa.binary())})
    out = dec(batch).to_pylist()[0]
    assert (out["width"], out["height"]) == (24, 16)
    assert out["n_bytes"] == 8 + 24 * 16
    pixels = np.frombuffer(payload, dtype=np.uint8, offset=8)
    assert out["mean_intensity"] == pytest.approx(float(pixels.mean()))


def test_decode_images_stage(ray_session):
    rows = [{"media_id": i, "payload": encode_fake_image(i, 16 + i, 16)}
            for i in range(10)]
    out = decode_images(ray.data.from_items(rows)).to_pandas()
    assert len(out) == 10
    assert out.sort_values("media_id")["width"].tolist() == list(range(16, 26))


def test_audio_frame_sampler():
    sampler = AudioFrameSampler(frame_bytes=100, stride=2)
    raw = bytes(range(256)) * 4  # 1024 bytes -> 10 frames -> sampled 0,2,4,6,8
    batch = pa.table({"media_id": pa.array([1], type=pa.int64()),
                      "payload": pa.array([raw], type=pa.binary())})
    out = sampler(batch).to_pylist()
    assert [r["frame_no"] for r in out] == [0, 2, 4, 6, 8]
