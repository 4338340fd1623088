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


def test_minhash_stream_kernel_bit_identical():
    """The flattened-stream signature kernel must equal the per-doc
    reference path bit-for-bit: empty docs, docs shorter than k
    (zero-padding), multi-byte UTF-8, chunked arrays, large_string."""
    from ci_log_processing_ray.ops.dedup import (
        _minhash_signature, _minhash_sigs, _perm_params, _shingle_hashes)

    a, b = _perm_params(64, 97)
    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "ray", "data", "log", "zuul"]
    texts = ["", "ab", "x", "γειά σου κόσμε", " ", "\n\t",
             "the quick brown fox " * 30]
    for _ in range(150):
        texts.append(" ".join(rng.choice(vocab, rng.integers(0, 40))))
    for k in (3, 5, 9):
        chunked = pa.chunked_array([pa.array(texts[:50]),
                                    pa.array(texts[50:])])
        ref = np.vstack([
            _minhash_signature(_shingle_hashes(t, k), a, b) for t in texts])
        assert np.array_equal(_minhash_sigs(chunked, k, a, b), ref)
    large = pa.array(texts, type=pa.large_string())
    ref5 = np.vstack([
        _minhash_signature(_shingle_hashes(t, 5), a, b) for t in texts])
    assert np.array_equal(_minhash_sigs(large, 5, a, b), ref5)
    assert _minhash_sigs(pa.array([], pa.string()), 5, a, b).shape == (0, 64)


def test_doc_shingle_blobs_bit_identical():
    """The whole-batch sorted-unique shingle-blob kernel must equal the
    per-doc ``_shingle_hashes(t, k).tobytes()`` path bit-for-bit,
    including empty docs, docs shorter than k, unicode, chunked and
    large_string inputs."""
    from ci_log_processing_ray.ops.dedup import (
        _doc_shingle_blobs, _shingle_hashes)

    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "ray", "data", "log", "zuul"]
    texts = ["", "ab", "x", "γειά σου κόσμε", " ", "\n\t",
             "the quick brown fox " * 30]
    for _ in range(150):
        texts.append(" ".join(rng.choice(vocab, rng.integers(0, 40))))
    for k in (3, 5, 9):
        chunked = pa.chunked_array([pa.array(texts[:50]),
                                    pa.array(texts[50:])])
        ref = [_shingle_hashes(t, k).tobytes() for t in texts]
        assert _doc_shingle_blobs(chunked, k) == ref
    large = pa.array(texts, type=pa.large_string())
    assert _doc_shingle_blobs(large, 5) == [
        _shingle_hashes(t, 5).tobytes() for t in texts]
    assert _doc_shingle_blobs(pa.array([], pa.string()), 5) == []


def test_jaccard_verify_batch_matches_per_pair_loop():
    """The whole-batch lexsort verify kernel must agree with a direct
    per-pair intersect1d loop on random shingle sets, including empty
    sides and full-overlap pairs."""
    from ci_log_processing_ray.ops.dedup import _shingle_hashes

    rng = np.random.default_rng(11)
    texts = ["".join(rng.choice(list("abcdef "), 60)) for _ in range(30)]
    texts += [texts[0], texts[1] + "xx", ""]  # dup, near-dup, empty
    blobs = [_shingle_hashes(t, 5).tobytes() for t in texts]
    n = len(texts)
    left = rng.integers(0, n, 200)
    right = rng.integers(0, n, 200)
    thr = 0.5

    def ref_keep(ba, bb):
        xa = np.frombuffer(ba, dtype=np.uint64)
        xb = np.frombuffer(bb, dtype=np.uint64)
        inter = len(np.intersect1d(xa, xb, assume_unique=True))
        union = len(xa) + len(xb) - inter
        return (inter / union if union else 1.0) >= thr

    want = [(int(l), int(r)) for l, r in zip(left, right)
            if ref_keep(blobs[l], blobs[r])]

    from ci_log_processing_ray.ops.dedup import _verify_jaccard_batch

    out = _verify_jaccard_batch(
        left, right,
        [blobs[x] for x in left], [blobs[x] for x in right], thr)
    got = list(zip(out["left"].to_pylist(), out["right"].to_pylist()))
    assert got == want
    assert len(_verify_jaccard_batch(
        np.array([], np.int64), np.array([], np.int64), [], [], thr)) == 0


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


def test_minhash_shuffle_verify_matches_broadcast_path(ray_session):
    """broadcast_cand_cap=0 forces the tagged-union bucketed
    shuffle-verify (the 100 TB path); output must equal the
    broadcast-verify path's on the same corpus, including clusters of
    exact copies and marker-word near-dups."""
    rng = np.random.default_rng(3)
    words = ["join", "hash", "row", "batch", "scan", "filter", "small"]
    rows = []
    did = 0
    for d in range(12):
        text = " ".join(rng.choice(words, 40))
        for r in range(4):
            t = text if r == 0 else (text + f" v{r}" if r == 1
                                     else " ".join(rng.choice(words, 40)))
            rows.append({"doc_id": did, "text": t})
            did += 1
    ds = ray.data.from_items(rows)
    a = minhash_lsh_dedup(ds, "text", "doc_id", jaccard_threshold=0.8)
    b = minhash_lsh_dedup(ds, "text", "doc_id", jaccard_threshold=0.8,
                          broadcast_cand_cap=0)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True))


def test_minhash_distributed_closure_matches_driver_path(ray_session):
    """driver_edge_cap=0 forces the verified edges through the
    distributed connected_components closure; clusters must be
    identical to the driver union-find (both compute min reachable
    id)."""
    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep green forest while the sun sets") * 3
    rows = [{"doc_id": i, "text": base.replace("sun", f"sun{i % 2}")}
            for i in range(1, 9)]
    rows.append({"doc_id": 99,
                 "text": "completely different content entirely " * 6})
    ds = ray.data.from_items(rows)
    via_driver = minhash_lsh_dedup(ds, "text", "doc_id",
                                   jaccard_threshold=0.7)
    via_cc = minhash_lsh_dedup(ds, "text", "doc_id",
                               jaccard_threshold=0.7, driver_edge_cap=0)
    a = via_driver.sort_values("doc_id").reset_index(drop=True)
    b = via_cc.sort_values("doc_id").reset_index(drop=True)
    assert len(a) > 0
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["cluster_rep"].tolist() == b["cluster_rep"].tolist()


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


def test_fnv1a_word_hashes_matches_pure_python():
    """The vectorized byte-matrix FNV-1a fold must equal the textbook
    sequential definition (incl. seed folding, unicode words, and the
    dictionary-encode gather for repeated words)."""
    import pyarrow as pa

    from ci_log_processing_ray.ops.dedup import _fnv1a_word_hashes

    def fnv(word, seed):
        h = 0xCBF29CE484222325 ^ seed
        for b in word.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) % (1 << 64)
        return h

    words = ["alpha", "beta", "alpha", "x", "12345", "café",
             "longerwordhere", "alpha"]
    for seed in (0, 3, 11):
        got = _fnv1a_word_hashes(pa.array(words), seed)
        want = np.array([fnv(w, seed) for w in words], dtype=np.uint64)
        assert (got == want).all(), (seed, got, want)


def test_fmix64_matches_reference():
    """The murmur3 finalizer used by the SQL-reproducible sketch hashes
    must match the scalar spec (xor-shift / wraparound multiply)."""
    from ci_log_processing_ray.ops.sketch import _fmix64

    def ref(x):
        m = (1 << 64) - 1
        x ^= x >> 33
        x = (x * 0xFF51AFD7ED558CCD) & m
        x ^= x >> 33
        x = (x * 0xC4CEB9FE1A85EC53) & m
        x ^= x >> 33
        return x

    xs = np.array([0, 1, 2, 255, 2**31, 2**63, 2**64 - 1,
                   1234567890123456789], dtype=np.uint64)
    got = _fmix64(xs)
    want = np.array([ref(int(x)) for x in xs], dtype=np.uint64)
    assert (got == want).all(), (got, want)


def test_hll_rank_histogram_is_sufficient(ray_session):
    """return_state=True's histogram must reproduce the exact same
    estimate as the direct register path (sufficient statistic)."""
    import ray

    from ci_log_processing_ray.ops.sketch import (
        estimate_from_rank_histogram, hll_distinct_by_group)

    rows = [{"g": f"g{i % 3}", "v": i % 500} for i in range(4000)]
    est = hll_distinct_by_group(
        ray.data.from_items(rows).repartition(7), "g", "v", p=10,
        hash="fnv")
    state = hll_distinct_by_group(
        ray.data.from_items(rows).repartition(3), "g", "v", p=10,
        hash="fnv", return_state=True)
    for g, sub in state.groupby("g"):
        from_hist = round(estimate_from_rank_histogram(
            sub["rank"].to_numpy(np.int64),
            sub["n_regs"].to_numpy(np.int64), 10))
        direct = int(est.loc[est["g"] == g, "n_distinct"].iloc[0])
        assert from_hist == direct, (g, from_hist, direct)
        assert int(sub["n_regs"].sum()) == 1 << 10


def test_simhash_vectorized_matches_rowwise_definition():
    """The batch-vectorized kernel must produce bit-identical simhash
    values to the row-at-a-time definition (per-word hash, bit votes,
    MSB-last packing)."""
    import pandas as pd

    from ci_log_processing_ray.ops.dedup import _simhash_batch

    def fnv1a(word, seed):
        h = 0xCBF29CE484222325 ^ seed
        for b in word.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) % (1 << 64)
        return h

    def rowwise(text, seed):
        words = text.split()
        if not words:
            return np.uint64(0)
        h = np.array([fnv1a(w, seed) for w in words], dtype=np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
        votes = bits.astype(np.int64).sum(axis=0) * 2 - len(h)
        return np.uint64(
            int("".join("1" if v > 0 else "0" for v in votes[::-1]), 2))

    texts = ["alpha beta gamma", "", "one", "  spaced   out  words ",
             "repeat repeat repeat unique", "x " * 200,
             "the quick brown fox jumps over the lazy dog"]
    got = _simhash_batch(texts, seed=11)
    want = np.array([rowwise(t, 11) for t in texts], dtype=np.uint64)
    assert (got == want).all(), (got, want)


def test_embedding_dedup(ray_session):
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((20, 64)).astype(np.float32)
    vecs[7] = vecs[3] * 2.5  # same direction -> cosine 1
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(20)]
    out = embedding_dedup(ray.data.from_items(rows), "embedding", "vec_id",
                          cosine_threshold=0.95)
    clusters = dict(zip(out["vec_id"], out["cluster_rep"]))
    assert clusters.get(3) == 3 and clusters.get(7) == 3


def test_semdedup_planted(ray_session):
    """k-means-blocked semantic dedup finds planted same-direction
    pairs and leaves the rest alone, including pairs landing in
    different k-means clusters than other dups."""
    from ci_log_processing_ray.ops.dedup import semdedup

    rng = np.random.default_rng(0)
    # two separated blobs so k-means has real structure to find; shift
    # kept small enough that blob-mates are NOT near-dups (shift 2.0:
    # expected cosine ~ 4/(4+1) = 0.8 < 0.95 threshold)
    vecs = rng.standard_normal((40, 64)).astype(np.float64)
    vecs[:20] += 2.0
    vecs[20:] -= 2.0
    vecs[7] = vecs[3] * 2.5     # dup inside blob 1
    vecs[31] = vecs[25] * 0.5   # dup inside blob 2
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(40)]
    out = semdedup(ray.data.from_items(rows), "embedding", "vec_id",
                   k=2, cosine_threshold=0.95, n_iter=5)
    clusters = dict(zip(out["vec_id"], out["cluster_rep"]))
    assert clusters.get(3) == 3 and clusters.get(7) == 3
    assert clusters.get(25) == 25 and clusters.get(31) == 25
    assert set(clusters) == {3, 7, 25, 31}


def test_pca_project_matches_numpy(ray_session):
    """Distributed moment-partial PCA must match numpy PCA computed
    directly on the full matrix (same sign convention), across blocks."""
    from ci_log_processing_ray.ops.similarity import pca_project

    rng = np.random.default_rng(5)
    # anisotropic cloud: variance concentrated along two known axes
    base = rng.standard_normal((300, 16))
    base[:, 0] *= 8.0
    base[:, 3] *= 4.0
    rows = [{"vec_id": i, "embedding": base[i].tolist()}
            for i in range(300)]
    ds = ray.data.from_items(rows).repartition(7)
    got = pca_project(ds, "embedding", "vec_id", n_components=2) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)

    mean = base.mean(axis=0)
    cov = np.cov(base, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    comps = evecs[:, np.argsort(evals)[::-1][:2]].T
    flips = np.sign(comps[np.arange(2), np.abs(comps).argmax(axis=1)])
    comps = comps * flips[:, None]
    want = (base - mean) @ comps.T
    np.testing.assert_allclose(got[["pc1", "pc2"]].to_numpy(), want,
                               rtol=1e-8, atol=1e-8)
    # the dominant axes are found: |pc1| correlates with coord 0
    assert abs(np.corrcoef(got["pc1"], base[:, 0])[0, 1]) > 0.99


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


def test_ngram_jaccard_pairs(ray_session):
    from ci_log_processing_ray.ops.dedup import ngram_jaccard_pairs

    rows = [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 2, "text": "the quick brown fox jumps over the lazy cat"},
        {"doc_id": 3, "text": "completely different words entirely here now"},
    ]
    out = ngram_jaccard_pairs(
        ray.data.from_items(rows), "text", "doc_id",
        n=3, threshold_pct=50).to_pandas()
    # docs 1/2: 9 words -> 7 trigrams each, 6 shared -> jacc 6/8 = 75%
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.left_id, r.right_id, r.inter, r.union_sz) == (1, 2, 6, 8)


def test_quality_score(ray_session):
    from ci_log_processing_ray.ops.textstats import quality_score

    rows = [
        {"doc_id": 1, "text": "the cat sat on the mat and it is a fine day"},
        {"doc_id": 2, "text": "x!"},
    ]
    out = quality_score(ray.data.from_items(rows), "text", "doc_id"
                        ).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_words"] == 12
    assert out.loc[1, "quality"] == 1
    assert out.loc[2, "n_words"] == 1
    assert out.loc[2, "quality"] == 0
    # "x!": 1 punct over 2 chars -> 50%
    assert out.loc[2, "punct_pct"] == 50


def test_token_count_bpe(ray_session):
    from ci_log_processing_ray.ops.textstats import token_count_bpe

    rows = [{"src": "a", "text": "it's here"}, {"src": "a", "text": "a b"}]
    out = token_count_bpe(ray.data.from_items(rows), "text", "src").to_pandas()
    # "it's here" -> [it][' s][ here] = 3 ; "a b" -> [a][ b] = 2
    assert out.iloc[0].n_tokens == 5
    assert out.iloc[0].n_docs == 2


def test_asof_join_grouped(ray_session):
    from ci_log_processing_ray.ops.relational import asof_join_grouped

    t0 = datetime.datetime(2024, 1, 1)

    def at(m):
        return t0 + datetime.timedelta(minutes=m)

    left = ray.data.from_items([
        {"k": 1, "eid": 10, "ts": at(5)},
        {"k": 1, "eid": 11, "ts": at(20)},
        {"k": 2, "eid": 20, "ts": at(1)},
    ])
    right = ray.data.from_items([
        {"k": 1, "rts": at(0), "val": 100},
        {"k": 1, "rts": at(10), "val": 200},
        {"k": 2, "rts": at(3), "val": 300},  # after the only left event
    ])
    out = asof_join_grouped(
        left, right, key="k", left_on="ts", right_on="rts",
        left_cols=["eid"], right_cols=["val"]).to_pandas().set_index("eid")
    assert out.loc[10, "val"] == 100
    assert out.loc[11, "val"] == 200
    assert pd.isna(out.loc[20, "val"])
    assert out.loc[11, "rts_matched"] == at(10)


def test_window_topk(ray_session):
    from ci_log_processing_ray.ops.relational import window_topk

    rows = [{"g": g, "v": v, "id": i}
            for i, (g, v) in enumerate([(1, 5.0), (1, 9.0), (1, 9.0), (1, 1.0),
                                        (2, 3.0)])]
    out = window_topk(ray.data.from_items(rows), "g", "v", 2,
                      descending=True, tiebreak_col="id").to_pandas()
    g1 = out[out.g == 1].sort_values("id")
    assert g1["id"].tolist() == [1, 2]  # both 9.0s, tie broken by id
    assert len(out[out.g == 2]) == 1


def test_knn_ivf_matches_bruteforce(ray_session):
    from ci_log_processing_ray.ops.similarity import knn_ivf

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((200, 64))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(200)]
    ds = ray.data.from_items(rows)
    q = vecs[:2]
    exact = knn_bruteforce(ds, "embedding", "vec_id", q, [0, 1], k=5)
    approx = knn_ivf(ds, "embedding", "vec_id", q, [0, 1], k=5,
                     n_centroids=4, n_probe=4, sample_size=200)
    # probing ALL lists makes IVF exact -> identical to brute force
    pd.testing.assert_frame_equal(exact, approx)


def test_knn_pq_exact_when_codebook_spans_sample(ray_session):
    from ci_log_processing_ray.ops.similarity import knn_pq

    rng = np.random.default_rng(6)
    vecs = rng.standard_normal((100, 64))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(100)]
    ds = ray.data.from_items(rows)
    q = vecs[:2]
    exact = knn_bruteforce(ds, "embedding", "vec_id", q, [0, 1], k=5)
    # n_codes >= sample size -> every sample subvector is its own
    # centroid (Lloyd's is a fixpoint at zero distortion), so PQ codes
    # reconstruct exactly and ADC == the exact dot product
    approx = knn_pq(ds, "embedding", "vec_id", q, [0, 1], k=5,
                    m_subspaces=8, n_codes=128, sample_size=100)
    pd.testing.assert_frame_equal(exact, approx)


def test_knn_pq_lossy_codebook_still_finds_planted(ray_session):
    from ci_log_processing_ray.ops.similarity import knn_pq

    rng = np.random.default_rng(7)
    base = rng.standard_normal((4, 64)) * 4.0       # well-separated hubs
    vecs = np.vstack([base[i % 4] + 0.01 * rng.standard_normal(64)
                      for i in range(200)])
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(200)]
    ds = ray.data.from_items(rows)
    out = knn_pq(ds, "embedding", "vec_id", base[:2], [0, 1], k=10,
                 m_subspaces=8, n_codes=16, sample_size=200)
    # every returned neighbor of hub q must belong to hub q's cluster
    for qid in (0, 1):
        got = out[out["query_id"] == qid]["vec_id"].to_numpy()
        assert len(got) == 10 and np.all(got % 4 == qid)


def test_video_frame_sampler():
    from ci_log_processing_ray.ops.multimodal import (
        VideoFrameSampler, encode_fake_video)

    raw = encode_fake_video(7, n_frames=10, frame_bytes=64)
    out = VideoFrameSampler(stride=3)(pa.table({
        "media_id": pa.array([7], type=pa.int64()),
        "payload": pa.array([raw], type=pa.binary())})).to_pylist()
    assert [r["frame_no"] for r in out] == [0, 3, 6, 9]
    assert len({r["frame_digest"] for r in out}) == 4


def test_image_resizer():
    from ci_log_processing_ray.ops.multimodal import ImageResizer

    payload = encode_fake_image(3, 16, 12)
    out = ImageResizer(8, 6)(pa.table({
        "media_id": pa.array([3], type=pa.int64()),
        "payload": pa.array([payload], type=pa.binary())})).to_pylist()[0]
    assert (out["width"], out["height"]) == (8, 6)
    import struct

    w, h = struct.unpack_from("<ii", out["payload"], 0)
    assert (w, h) == (8, 6)
    assert len(out["payload"]) == 8 + 8 * 6


def test_range_join_count(ray_session):
    from ci_log_processing_ray.ops.relational import range_join_count

    t0 = datetime.datetime(2024, 1, 1)

    def at(m):
        return t0 + datetime.timedelta(minutes=m)

    left = ray.data.from_items([
        {"k": 1, "eid": 1, "ts": at(10)},
        {"k": 1, "eid": 2, "ts": at(30)},
        {"k": 2, "eid": 3, "ts": at(10)},
    ])
    right = ray.data.from_items([
        {"k": 1, "rts": at(0)},
        {"k": 1, "rts": at(10)},   # boundary: ts - window <= rts <= ts
        {"k": 1, "rts": at(25)},
        {"k": 2, "rts": at(50)},   # after the only left event
    ])
    out = range_join_count(
        left, right, key="k", left_on="ts", right_on="rts", left_id="eid",
        window=np.timedelta64(15, "m")).to_pandas().set_index("eid")
    assert out.loc[1, "n_in_window"] == 2  # at(0) and at(10)
    assert out.loc[2, "n_in_window"] == 1  # at(25); at(15) window start
    assert out.loc[3, "n_in_window"] == 0


def test_rolling_count_range_frame_ties(ray_session):
    """Peers with EQUAL timestamps must all count (SQL RANGE frame),
    which pandas.rolling would get wrong."""
    from ci_log_processing_ray.ops.window import rolling_count_by_group

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        {"g": 1, "id": 1, "ts": t0},
        {"g": 1, "id": 2, "ts": t0},  # tie with id 1
        {"g": 1, "id": 3, "ts": t0 + datetime.timedelta(minutes=30)},
        {"g": 1, "id": 4, "ts": t0 + datetime.timedelta(minutes=90)},
    ]
    out = rolling_count_by_group(
        ray.data.from_items(rows), "g", "ts", "id",
        np.timedelta64(1, "h")).to_pandas().set_index("id")
    assert out.loc[1, "n_in_window"] == 2  # both ties count for BOTH rows
    assert out.loc[2, "n_in_window"] == 2
    assert out.loc[3, "n_in_window"] == 3
    assert out.loc[4, "n_in_window"] == 2  # ties at t0 fell out


def test_hll_distinct_accuracy(ray_session):
    from ci_log_processing_ray.ops.sketch import hll_distinct

    n_true = 5000
    rows = [{"v": f"user-{i % n_true}"} for i in range(20000)]
    ds = ray.data.from_items(rows)
    est = hll_distinct(ds, "v", p=12)
    # standard error ~1.04/sqrt(4096) = 1.6%; allow 5%
    assert abs(est - n_true) / n_true < 0.05, est


def test_hll_merge_partition_invariant(ray_session):
    """The sketch must give the SAME estimate regardless of how rows
    are partitioned (mergeability)."""
    from ci_log_processing_ray.ops.sketch import hll_distinct

    rows = [{"v": f"k{i}"} for i in range(3000)]
    a = hll_distinct(ray.data.from_items(rows).repartition(1), "v", p=11)
    b = hll_distinct(ray.data.from_items(rows).repartition(17), "v", p=11)
    assert a == b


def test_hll_by_group(ray_session):
    from ci_log_processing_ray.ops.sketch import hll_distinct_by_group

    rows = ([{"g": "a", "v": f"x{i % 100}"} for i in range(1000)]
            + [{"g": "b", "v": f"y{i % 700}"} for i in range(1400)])
    out = hll_distinct_by_group(
        ray.data.from_items(rows), "g", "v", p=12).set_index("g")
    assert abs(out.loc["a", "n_distinct"] - 100) / 100 < 0.1
    assert abs(out.loc["b", "n_distinct"] - 700) / 700 < 0.1


def test_explode_list(ray_session):
    from ci_log_processing_ray.ops.reshape import explode_list

    t = pa.table({
        "id": pa.array([1, 2, 3, 4]),
        "l": pa.array([[10.0, 20.0], [], None, [7.0]],
                      type=pa.list_(pa.float64())),
    })
    out = explode_list(ray.data.from_arrow(t), "l", ["id"]).to_pandas()
    out = out.sort_values(["id", "pos"]).reset_index(drop=True)
    assert out["id"].tolist() == [1, 1, 4]
    assert out["pos"].tolist() == [1, 2, 1]  # 1-based ordinal
    assert out["val"].tolist() == [10.0, 20.0, 7.0]


def test_quantile_disc_by_group(ray_session):
    from ci_log_processing_ray.ops.quantile import quantile_disc_by_group

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 5, size=4000)
    vals = rng.integers(0, 100, size=4000)
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals}))
    out = quantile_disc_by_group(
        ds, "k", "v", {"q50": 0.5, "q90": 0.9}).to_pandas()
    df = pd.DataFrame({"k": keys, "v": vals})
    for k, g in df.groupby("k"):
        s = np.sort(g["v"].to_numpy())
        row = out[out["k"] == k].iloc[0]
        # percentile_disc: value at 0-based sorted index ceil(q*n)-1
        assert row["q50"] == s[int(np.ceil(0.5 * len(s))) - 1]
        assert row["q90"] == s[int(np.ceil(0.9 * len(s))) - 1]


def test_ddsketch_accuracy_and_merge_invariance(ray_session):
    from ci_log_processing_ray.ops.quantile import approx_quantiles

    rng = np.random.default_rng(11)
    vals = rng.lognormal(mean=3.0, sigma=1.5, size=20000)
    qs = [0.5, 0.9, 0.99]
    for blocks in (1, 16):  # merge invariance: same answer at any split
        ds = ray.data.from_arrow(
            pa.table({"value": vals})).repartition(blocks)
        est = approx_quantiles(ds, "value", qs, alpha=0.01)
        exact = np.quantile(vals, qs)
        for e, x in zip(est, exact):
            assert abs(e - x) / x <= 0.02  # 2*alpha guarantee margin


def test_lag_diff_by_group(ray_session):
    from ci_log_processing_ray.ops.window import lag_diff_by_group

    base = pd.Timestamp("2024-01-01")
    rows = []
    for uid in range(20):
        for i in range(10):
            rows.append({"event_id": uid * 10 + i, "user_id": uid,
                         "ts": base + pd.Timedelta(microseconds=uid + 7 * i)})
    df = pd.DataFrame(rows).sample(frac=1.0, random_state=3)
    out = lag_diff_by_group(
        ray.data.from_pandas(df), "user_id", "ts", "event_id",
        tiebreak_col="event_id").to_pandas()
    assert out["gap_us"].dtype == np.int64  # no float upcast
    got = dict(zip(out["event_id"], out["gap_us"]))
    for uid in range(20):
        assert got[uid * 10] == -1  # first event per user
        for i in range(1, 10):
            assert got[uid * 10 + i] == 7


def test_repetition_score(ray_session):
    from ci_log_processing_ray.ops.textstats import repetition_score

    rows = [
        {"doc_id": 1, "text": "a b a b a b"},     # bigrams: ab ba ab ba ab
        {"doc_id": 2, "text": "x y z"},            # all distinct
        {"doc_id": 3, "text": "one"},              # no bigrams
        {"doc_id": 4, "text": ""},
    ]
    out = repetition_score(
        ray.data.from_items(rows), "text", "doc_id").to_pandas()
    got = {r.doc_id: (r.n_2grams, r.n_uniq_2grams, r.dup_2gram_pct)
           for r in out.itertuples()}
    assert got[1] == (5, 2, 60)
    assert got[2] == (2, 2, 0)
    assert got[3] == (0, 0, 0)
    assert got[4] == (0, 0, 0)


def test_running_total_by_group(ray_session):
    from ci_log_processing_ray.ops.window import running_total_by_group

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "id": np.arange(300),
        "k": rng.integers(0, 7, size=300),
        "o": rng.permutation(300),
        "v": rng.integers(-50, 50, size=300),
    })
    out = running_total_by_group(
        ray.data.from_pandas(df.sample(frac=1.0, random_state=1)),
        "k", ["o"], "v", "id", out_col="rt").to_pandas()
    assert out["rt"].dtype == np.int64
    expect = df.sort_values(["k", "o"]).groupby("k")["v"].cumsum()
    got = dict(zip(out["id"], out["rt"]))
    for i, e in zip(df.sort_values(["k", "o"])["id"], expect):
        assert got[i] == e


def test_rank_by_group(ray_session):
    from ci_log_processing_ray.ops.window import rank_by_group

    df = pd.DataFrame({
        "id": np.arange(8),
        "k": [1, 1, 1, 1, 2, 2, 2, 2],
        "v": [30, 30, 20, 10, 5, 5, 5, 1],
    })
    out = rank_by_group(
        ray.data.from_pandas(df), "k", "v", "id",
        descending=True).to_pandas()
    got = {r.id: (r.rank, r.dense_rank) for r in out.itertuples()}
    # k=1: 30,30 share rank 1; 20 -> rank 3 (skips), dense 2; 10 -> 4/3
    assert got[0] == (1, 1) and got[1] == (1, 1)
    assert got[2] == (3, 2) and got[3] == (4, 3)
    # k=2: 5,5,5 rank 1; 1 -> rank 4, dense 2
    assert got[4] == (1, 1) and got[5] == (1, 1) and got[6] == (1, 1)
    assert got[7] == (4, 2)


def test_quantile_cont_by_group(ray_session):
    from ci_log_processing_ray.ops.quantile import quantile_cont_by_group

    rng = np.random.default_rng(13)
    keys = rng.integers(0, 4, size=2000)
    vals = rng.integers(0, 1000, size=2000)
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals}))
    out = quantile_cont_by_group(
        ds, "k", "v", {"q25": 0.25, "q50": 0.5, "q75": 0.75}).to_pandas()
    df = pd.DataFrame({"k": keys, "v": vals})
    for k, g in df.groupby("k"):
        row = out[out["k"] == k].iloc[0]
        for name, q in (("q25", 0.25), ("q50", 0.5), ("q75", 0.75)):
            # numpy 'linear' interpolation == percentile_cont
            assert row[name] == np.quantile(g["v"].to_numpy(), q,
                                            method="linear")


def test_word_topk(ray_session):
    from ci_log_processing_ray.ops.textstats import word_topk

    rows = [{"text": "Apple banana apple"},
            {"text": "banana, cherry! APPLE"},
            {"text": "cherry banana"}]
    out = word_topk(
        ray.data.from_items(rows), "text", 2).to_pandas()
    assert out["word"].tolist() == ["apple", "banana"]  # 3 vs 3: tie -> word asc
    assert out["n"].tolist() == [3, 3]


def test_pack_fixed_windows(ray_session):
    from ci_log_processing_ray.ops.pack import pack_fixed_windows

    rng = np.random.default_rng(21)
    n = 500
    lens = rng.integers(1, 300, size=n)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(n, dtype=np.int64),
        "n_tok": lens,
    })).repartition(7)  # prefix sum must be invariant to block splits
    out = pack_fixed_windows(ds, "doc_id", "n_tok", 512,
                             n_buckets=16).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    start = np.cumsum(lens) - lens
    assert (out["tok_start"].to_numpy() == start).all()
    assert (out["pack_id"].to_numpy() == start // 512).all()
    assert (out["offset_in_pack"].to_numpy() == start % 512).all()
    assert (out["spans_boundary"].to_numpy()
            == ((start % 512 + lens) > 512).astype(np.int64)).all()


def test_string_agg_by_group(ray_session):
    from ci_log_processing_ray.ops.groupagg import string_agg_by_group

    rows = [
        {"k": "a", "i": 2, "v": "two"},
        {"k": "a", "i": 1, "v": "one"},
        {"k": "b", "i": 5, "v": "solo"},
        {"k": "a", "i": 3, "v": "three"},
    ]
    out = string_agg_by_group(
        ray.data.from_items(rows), "k", "v", "i",
        sep="|", out_col="s").to_pandas()
    got = dict(zip(out["k"], out["s"]))
    assert got == {"a": "one|two|three", "b": "solo"}


def test_mode_by_group(ray_session):
    from ci_log_processing_ray.ops.groupagg import mode_by_group

    rows = ([{"k": 1, "v": "x"}] * 3 + [{"k": 1, "v": "y"}] * 3
            + [{"k": 1, "v": "z"}] * 2 + [{"k": 2, "v": "w"}])
    out = mode_by_group(
        ray.data.from_items(rows).repartition(3), "k", "v",
        out_col="m").to_pandas()
    got = {r.k: (r.m, r.n) for r in out.itertuples()}
    assert got[1] == ("x", 3)  # 3-3 tie between x and y -> smallest value
    assert got[2] == ("w", 1)


def test_duplicate_spans(ray_session):
    from ci_log_processing_ray.ops.dedup import duplicate_spans

    shared = "alpha beta gamma delta epsilon"
    rows = [
        {"doc_id": 1, "text": f"one two {shared} three"},
        {"doc_id": 2, "text": f"{shared} four five six"},
        {"doc_id": 3, "text": "totally different words here now ok"},
        {"doc_id": 4, "text": "short"},
    ]
    out = duplicate_spans(
        ray.data.from_items(rows), "text", "doc_id", n=5).to_pandas()
    got = dict(zip(out["gram"], out["df"]))
    assert got.get(shared) == 2  # the planted shared 5-gram
    # no gram from the unrelated doc appears
    assert not any("totally" in g for g in got)


def test_heavy_hitters(ray_session):
    from ci_log_processing_ray.ops.sketch import heavy_hitters

    rng = np.random.default_rng(17)
    # planted heavy hitter: 20% of the stream; tail spread over 500 ids
    n = 20000
    vals = rng.integers(1000, 1500, size=n)
    vals[: n // 5] = 7
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(8)
    out = heavy_hitters(ds, "v", k=16)
    assert out.iloc[0]["item"] == 7  # guaranteed: freq > n/(k+1)
    true = n // 5
    assert true - n // 17 <= out.iloc[0]["est_count"] <= true
    # exactness when distinct values fit in k: no pruning ever happens
    small = ray.data.from_arrow(pa.table(
        {"v": np.array([1] * 5 + [2] * 3 + [3] * 2)})).repartition(3)
    exact = heavy_hitters(small, "v", k=16)
    assert dict(zip(exact["item"], exact["est_count"])) == {1: 5, 2: 3, 3: 2}


def test_heavy_hitters_exact(ray_session):
    from ci_log_processing_ray.ops.sketch import heavy_hitters_exact

    rng = np.random.default_rng(23)
    # two planted hitters straddling the threshold; long uniform tail
    n = 50000
    vals = rng.integers(10_000, 20_000, size=n)
    vals[:2000] = 7        # 4% > 1/125
    vals[2000:2500] = 11   # 1% > 1/125 (500 >= 400 threshold)
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(16)
    out = heavy_hitters_exact(ds, "v", share_den=125, k=256)
    got = dict(zip(out["item"], out["cnt"]))
    assert got[7] == 2000 and got[11] == 500  # EXACT counts
    # nothing under the threshold sneaks in
    assert all(c * 125 >= n for c in got.values())
    # exhaustive vs pandas ground truth
    vc = pd.Series(vals).value_counts()
    want = {int(k): int(v) for k, v in vc.items() if v * 125 >= n}
    assert got == want
    # guard: k too small for the no-miss guarantee must raise
    with pytest.raises(ValueError):
        heavy_hitters_exact(ds, "v", share_den=125, k=64)


def test_prefix_jaccard_matches_bruteforce(ray_session):
    """The prefix-filtered (AllPairs) join must be lossless vs brute
    force -- including on a corpus with a HOT gram shared by every doc
    (the exact case the prefix filter exists to keep off the wire)."""
    from itertools import combinations

    from ci_log_processing_ray.ops.dedup import prefix_jaccard_pairs

    hot = "the quick brown"  # 3-gram present in ALL docs
    docs = {
        1: hot + " fox jumps over a lazy dog near a gate",
        2: hot + " fox jumps over a lazy dog near a fence",
        3: hot + " cat sits under a warm red roof all day",
        4: hot + " cat sits under a warm red roof all night",
        5: hot + " zebra walks through tall dry grass alone today ok",
        6: "completely different words entirely here now",
    }
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": list(docs), "text": list(docs.values())})).repartition(3)
    got = prefix_jaccard_pairs(ds, "text", "doc_id", n=3, threshold_pct=50)

    def grams(s):
        ws = s.lower().split()
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    want = []
    for a, b in combinations(sorted(docs), 2):
        ga, gb = grams(docs[a]), grams(docs[b])
        inter, union = len(ga & gb), len(ga | gb)
        if inter > 0 and 100 * inter >= 50 * union:
            want.append((a, b, inter, union))
    got_t = sorted(map(tuple, got.to_numpy()))
    assert got_t == sorted(want)
    assert len(want) >= 2  # the two planted near-dup pairs
    # empty-result corpus: nothing shares a gram
    ds2 = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["alpha beta gamma delta", "one two three four"]}))
    out2 = prefix_jaccard_pairs(ds2, "text", "doc_id", n=3,
                                threshold_pct=50)
    assert len(out2) == 0
    assert list(out2.columns) == ["left_id", "right_id", "inter",
                                  "union_sz"]
    # shuffle-verify (100 TB) path must equal the broadcast path
    shuf = prefix_jaccard_pairs(ds, "text", "doc_id", n=3,
                                threshold_pct=50, broadcast_cand_cap=0)
    pd.testing.assert_frame_equal(got, shuf)


# ---------------------------------------------------------------------------
# curation operators
# ---------------------------------------------------------------------------
def test_chunk_text_windows(ray_session):
    from ci_log_processing_ray.ops.curation import chunk_text

    rows = [
        {"doc_id": 1, "text": " ".join(f"w{i}" for i in range(7))},
        {"doc_id": 2, "text": "one two"},
        {"doc_id": 3, "text": ""},           # no words -> no chunks
        {"doc_id": 4, "text": "!!! ???"},    # punctuation only
    ]
    out = chunk_text(ray.data.from_items(rows), "text", "doc_id",
                     chunk_size=3, stride=2).to_pandas()
    d1 = out[out.doc_id == 1].sort_values("chunk_idx")
    # 7 words, win 3, stride 2 -> ceil((7-3)/2)+1 = 3 chunks, starts
    # 0,2,4 (start 6 would be a redundant fully-covered tail)
    assert list(d1.chunk_text) == ["w0 w1 w2", "w2 w3 w4", "w4 w5 w6"]
    assert list(d1.n_words) == [3, 3, 3]
    assert list(out[out.doc_id == 2].chunk_text) == ["one two"]
    assert len(out[out.doc_id.isin([3, 4])]) == 0
    assert str(out.chunk_idx.dtype) == "int64"


def test_decontaminate_planted(ray_session):
    from ci_log_processing_ray.ops.curation import decontaminate

    leak = "alpha beta gamma delta epsilon"
    ev = ray.data.from_items([{"doc_id": 97, "text": f"{leak} zeta eta"}])
    train = ray.data.from_items([
        {"doc_id": 1, "text": f"pre {leak} post"},       # 1 shared 5-gram
        {"doc_id": 2, "text": "unrelated words only here now yes"},
        {"doc_id": 3, "text": f"{leak} zeta"},           # 2 shared 5-grams
    ])
    out = decontaminate(train, ev, "text", "doc_id", n=5).to_pandas()
    got = dict(zip(out.doc_id, out.n_hits))
    assert got == {1: 1, 3: 2}


def test_strip_stopwords_and_redact(ray_session):
    from ci_log_processing_ray.ops.curation import redact_text, strip_stopwords

    ds = ray.data.from_items([
        {"doc_id": 1, "text": "The quick  fox and a dog"},
        {"doc_id": 2, "text": "a a the"},
    ])
    out = strip_stopwords(ds, "text", "doc_id", ("a", "the")).to_pandas()
    got = out.set_index("doc_id")
    assert got.loc[1, "norm_text"] == "quick fox and dog"
    assert got.loc[1, "n_dropped"] == 2
    assert got.loc[2, "norm_text"] == ""
    assert got.loc[2, "n_kept"] == 0

    ds2 = ray.data.from_items([
        {"doc_id": 1, "text": "mail bob@example.com from 10.0.0.1 id 123456"},
        {"doc_id": 2, "text": "clean text"},
    ])
    red = redact_text(ds2, "text", "doc_id").to_pandas().set_index("doc_id")
    assert red.loc[1, "red_text"] == "mail <EMAIL> from <IP> id <NUM>"
    assert red.loc[1, "n_redacted"] == 3
    assert red.loc[2, "n_redacted"] == 0


def test_ntile_fill_rule(ray_session):
    from ci_log_processing_ray.ops.window import ntile_by_group

    # 10 rows in one group, 4 tiles -> sizes 3,3,2,2 (SQL fill rule)
    rows = [{"g": "x", "v": i, "id": i} for i in range(10)]
    rows += [{"g": "y", "v": i, "id": 100 + i} for i in range(2)]  # < n_tiles
    out = ntile_by_group(ray.data.from_items(rows), "g", ["v", "id"],
                         "id", 4).to_pandas()
    x = out[out.g == "x"].sort_values("id")
    assert list(x.tile) == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    y = out[out.g == "y"].sort_values("id")
    assert list(y.tile) == [1, 2]


def test_presence_set_op(ray_session):
    from ci_log_processing_ray.ops.groupagg import presence_set_op

    rows = [
        {"k": 1, "t": "purchase"}, {"k": 1, "t": "click"},
        {"k": 2, "t": "purchase"}, {"k": 2, "t": "click"},
        {"k": 2, "t": "error"},                       # excluded
        {"k": 3, "t": "click"},                       # missing purchase
        {"k": 4, "t": "purchase"}, {"k": 4, "t": "click"},
        {"k": 4, "t": "view"},                        # untracked value ok
    ]
    out = presence_set_op(
        ray.data.from_items(rows).repartition(3), ["k"], "t",
        include=("purchase", "click"), exclude=("error",)).to_pandas()
    assert sorted(out.k) == [1, 4]


def test_bloom_filter_exactness(ray_session):
    from ci_log_processing_ray.ops.relational import (
        bloom_contains, build_bloom)

    rng = np.random.default_rng(3)
    keys = rng.choice(10_000_000, size=5000, replace=False)
    words, m, k = build_bloom(keys)
    # no false negatives, ever
    assert bloom_contains(words, m, k, keys).all()
    probe = rng.choice(10_000_000, size=20000, replace=False)
    truth = np.isin(probe, keys)
    got = bloom_contains(words, m, k, probe)
    assert (got | ~truth).all() or got[truth].all()  # members always hit
    fp = (got & ~truth).mean()
    assert fp < 0.01  # ~0.1% expected at 16 bits/key


def test_last_by_group(ray_session):
    from ci_log_processing_ray.ops.groupagg import last_by_group

    ts = pd.to_datetime("2024-01-01")
    rows = [
        {"u": 1, "ts": ts, "id": 1, "v": "a"},
        {"u": 1, "ts": ts + pd.Timedelta("1h"), "id": 2, "v": "b"},
        {"u": 2, "ts": ts, "id": 3, "v": "c"},
        {"u": 2, "ts": ts, "id": 4, "v": "d"},  # ts tie -> max id wins
    ]
    out = last_by_group(
        ray.data.from_items(rows).repartition(2), "u", ["ts", "id"],
        ["v"]).to_pandas().set_index("u")
    assert out.loc[1, "v"] == "b"
    assert out.loc[2, "v"] == "d"


def test_rollup_levels(ray_session):
    from ci_log_processing_ray.ops.groupagg import rollup_counts

    rows = [{"a": "x", "b": "p", "n": 1}, {"a": "x", "b": "q", "n": 2},
            {"a": "y", "b": "p", "n": 4}]
    out = rollup_counts(ray.data.from_items(rows), ["a", "b"], "cnt",
                        sum_col="n", sum_name="total")
    total = out[out.a.isna() & out.b.isna()]
    assert len(total) == 1 and total.iloc[0]["total"] == 7
    xa = out[(out.a == "x") & out.b.isna()]
    assert xa.iloc[0]["cnt"] == 2 and xa.iloc[0]["total"] == 3
    assert len(out) == 3 + 2 + 1


def test_epoch_shuffle_is_permutation(ray_session):
    from ci_log_processing_ray.ops.shuffle import epoch_shuffle

    ds = ray.data.range(1000).map_batches(
        lambda t: t.rename_columns(["doc_id"]), batch_format="pyarrow")
    out = epoch_shuffle(ds, "doc_id").to_pandas()
    assert sorted(out.pos) == list(range(1, 1001))  # exact 1..n permutation
    # reproducible, and a different seed gives a different order
    again = epoch_shuffle(ds, "doc_id").to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True))
    other = epoch_shuffle(ds, "doc_id", seed="epoch2").to_pandas()
    merged = out.merge(other, on="doc_id")
    assert (merged.pos_x != merged.pos_y).any()


def test_tfidf_planted(ray_session):
    from ci_log_processing_ray.ops.textstats import tfidf_top_terms

    rows = [
        {"doc_id": 1, "text": "rare rare rare common"},
        {"doc_id": 2, "text": "common common other"},
        {"doc_id": 3, "text": "common word"},
    ]
    out = tfidf_top_terms(ray.data.from_items(rows), "text", "doc_id",
                          k=1).to_pandas().set_index("doc_id")
    # 'rare' (tf=3, df=1): score 3*3//1 = 9 beats 'common' (1*3//3 = 1)
    assert out.loc[1, "term"] == "rare" and out.loc[1, "score"] == 9


def test_salted_join_equals_plain_join(ray_session):
    from ci_log_processing_ray.ops.relational import salted_join

    rng = np.random.default_rng(5)
    # heavy skew: 60% of fact rows share one key
    keys = np.where(rng.random(3000) < 0.6, 7,
                    rng.integers(0, 50, size=3000))
    fact = ray.data.from_arrow(pa.table({
        "k": keys.astype(np.int64),
        "rid": np.arange(3000, dtype=np.int64)})).repartition(4)
    dim = ray.data.from_arrow(pa.table({
        "dk": np.arange(50, dtype=np.int64),
        "name": [f"n{i}" for i in range(50)]}))
    out = salted_join(fact, dim, "k", "dk", "rid", n_salt=4).to_pandas()
    assert len(out) == int(np.isin(keys, np.arange(50)).sum())
    # spot-check the hot key kept its dim attribute everywhere
    assert (out[out.k == 7]["name"] == "n7").all()


def test_ngram_jaccard_max_df_contract(ray_session):
    """The DF cutoff drops only pairs whose EVERY shared gram exceeds
    max_df; pairs sharing at least one rare gram keep exact scores."""
    from ci_log_processing_ray.ops.dedup import ngram_jaccard_pairs

    common = "spam spam spam spam"          # its 3-grams appear in ALL docs
    rare = "unique trigram here"
    rows = [
        {"doc_id": 1, "text": f"{common} {rare}"},
        {"doc_id": 2, "text": f"{common} {rare}"},       # shares rare+common
        {"doc_id": 3, "text": common},
        {"doc_id": 4, "text": common},                   # shares ONLY common
    ]
    full = ngram_jaccard_pairs(
        ray.data.from_items(rows), "text", "doc_id",
        n=3, threshold_pct=50).to_pandas()
    cut = ngram_jaccard_pairs(
        ray.data.from_items(rows), "text", "doc_id",
        n=3, threshold_pct=50, max_df=2).to_pandas()
    fp = set(zip(full.left_id, full.right_id))
    cp = set(zip(cut.left_id, cut.right_id))
    assert (1, 2) in fp and (3, 4) in fp
    assert (1, 2) in cp          # survives: shares rare grams (df <= 2)
    assert (3, 4) not in cp      # documented recall loss: only hot grams
    assert cp <= fp              # cutoff can only LOSE pairs, never add
    # surviving pair's score is a conservative LOWER BOUND: hot grams
    # leave the intersection but per-doc totals stay full
    r_full = full[(full.left_id == 1) & (full.right_id == 2)].iloc[0]
    r_cut = cut[(cut.left_id == 1) & (cut.right_id == 2)].iloc[0]
    assert r_cut.inter <= r_full.inter
    assert r_cut.union_sz >= r_full.union_sz


def test_asof_forward_direction(ray_session):
    t0 = pd.Timestamp("2024-01-01")
    left = ray.data.from_items([
        {"k": 1, "lts": t0 + pd.Timedelta("10min"), "lid": 1},
        {"k": 1, "lts": t0 + pd.Timedelta("2h"), "lid": 2},   # nothing after
    ])
    right = ray.data.from_items([
        {"k": 1, "rts": t0, "tag": "early"},
        {"k": 1, "rts": t0 + pd.Timedelta("30min"), "tag": "late"},
    ])
    from ci_log_processing_ray.ops.relational import asof_join_grouped

    out = asof_join_grouped(
        left, right, key="k", left_on="lts", right_on="rts",
        left_cols=["lid"], right_cols=["tag"],
        direction="forward").to_pandas().set_index("lid")
    assert out.loc[1, "tag"] == "late"          # earliest at-or-after
    assert pd.isna(out.loc[2, "tag"])           # no later right row


def test_last_by_group_first_composite(ray_session):
    from ci_log_processing_ray.ops.groupagg import last_by_group

    rows = [
        {"u": 1, "t": "a", "o": 3, "id": 30},
        {"u": 1, "t": "a", "o": 1, "id": 10},   # first by o
        {"u": 1, "t": "b", "o": 2, "id": 20},
    ]
    out = last_by_group(ray.data.from_items(rows).repartition(2),
                        ["u", "t"], ["o"], ["id"],
                        keep="first").to_pandas()
    got = {(r.u, r.t): r.id for r in out.itertuples()}
    assert got == {(1, "a"): 10, (1, "b"): 20}


def test_hopping_window_counts(ray_session):
    from ci_log_processing_ray.ops.window import hopping_window_agg

    base = pd.Timestamp("2024-01-01 00:37:00")
    ds = ray.data.from_items([{"ts": base, "value": 1.0}])
    out = hopping_window_agg(ds, "ts", "value",
                             window_s=3600, hop_s=900).to_pandas()
    # one event -> exactly 4 hopping windows, each counting it once
    assert len(out) == 4 and (out.n_events == 1).all()
    assert (out.value_cents == 100).all()
    starts = sorted(out.window_start_s)
    assert starts == [starts[0] + 900 * i for i in range(4)]
    # the event's hop-floor is the LAST window start
    epoch = int(base.timestamp())
    assert starts[-1] == (epoch // 900) * 900


def test_phash_noise_robust_and_distinct(ray_session):
    from ci_log_processing_ray.ops.multimodal import (
        PerceptualHasher, encode_fake_image, phash_clusters)

    import struct

    # structured image (gradient): block means sit far from the global
    # mean, so aHash is robust to mild noise -- unlike white noise,
    # where means hug the threshold (the reason aHash works on photos)
    grad = np.tile(np.linspace(0, 255, 32).astype(np.uint8), (24, 1))
    base = struct.pack("<ii", 32, 24) + grad.tobytes()
    noisy_px = np.clip(grad.astype(np.int16) + np.random.default_rng(4)
                       .integers(-2, 3, size=grad.shape), 0, 255)
    noisy = struct.pack("<ii", 32, 24) + noisy_px.astype(np.uint8).tobytes()
    other = struct.pack("<ii", 32, 24) + grad[:, ::-1].copy().tobytes()
    h = PerceptualHasher()._phash
    assert h(base) == h(bytes(noisy))
    assert h(base) != h(other)

    rows = [
        {"media_id": 1, "payload": base},
        {"media_id": 2, "payload": bytes(noisy)},
        {"media_id": 3, "payload": other},
    ]
    out = phash_clusters(
        ray.data.from_arrow(pa.table({
            "media_id": pa.array([r["media_id"] for r in rows]),
            "payload": pa.array([r["payload"] for r in rows],
                                type=pa.binary())}))).to_pandas()
    by_id = out.set_index("media_id")
    assert by_id.loc[1, "bucket_size"] == 2
    assert by_id.loc[3, "bucket_size"] == 1


def test_quantize_embeddings_accuracy(ray_session):
    from ci_log_processing_ray.ops.similarity import quantize_embeddings

    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((50, 64))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(50)]
    out = quantize_embeddings(ray.data.from_items(rows), "embedding",
                              "vec_id").to_pandas().set_index("vec_id")
    for i in range(50):
        q = np.frombuffer(out.loc[i, "qvec"], dtype=np.int8).astype(
            np.float64) * out.loc[i, "scale"]
        v = vecs[i]
        cos = (q @ v) / (np.linalg.norm(q) * np.linalg.norm(v))
        assert cos > 0.999
        assert np.abs(q - v).max() < out.loc[i, "scale"] * 0.51


def test_kmeans_separated_blobs(ray_session):
    from ci_log_processing_ray.ops.iterative import kmeans

    rng = np.random.default_rng(7)
    centers = np.array([[10.0] * 8, [-10.0] * 8, [10.0] * 4 + [-10.0] * 4])
    vecs = np.vstack([c + 0.1 * rng.standard_normal((40, 8))
                      for c in centers])
    rows = [{"embedding": v.tolist()} for v in vecs]
    cents, counts = kmeans(ray.data.from_items(rows).repartition(4),
                           "embedding", k=3, n_iter=10, seed=1)
    assert sorted(counts["count"]) == [40, 40, 40]
    # recovered centroids match the true centers (order-free)
    d = np.abs(cents[:, None, :] - centers[None, :, :]).max(axis=2)
    assert (d.min(axis=1) < 0.2).all()


def test_connected_components_chain_and_isolates(ray_session):
    from ci_log_processing_ray.ops.iterative import connected_components

    # two chains (0-1-2-3-4, 10-11-12) and one isolated edge (100, 200)
    edges = [(1, 0), (2, 1), (3, 2), (4, 3), (11, 10), (12, 11), (100, 200)]
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64())})).repartition(3)
    out = connected_components(ds, "src", "dst").to_pandas()
    comp = dict(zip(out.node, out.component))
    assert all(comp[n] == 0 for n in range(5))
    assert all(comp[n] == 10 for n in (10, 11, 12))
    assert comp[100] == 100 and comp[200] == 100


def test_resolve_group_buckets_cluster_aware(ray_session, monkeypatch):
    """Bucket counts must scale with the cluster: explicit wins, the
    default is max(64, 2*CPUs), and the input-bytes override raises it
    so one bucket stays heap-sized."""
    from ci_log_processing_ray.ops import window

    assert window.resolve_group_buckets(7) == 7
    monkeypatch.setattr(ray, "cluster_resources", lambda: {"CPU": 256})
    assert window.resolve_group_buckets() == 512
    monkeypatch.setattr(ray, "cluster_resources", lambda: {"CPU": 4})
    assert window.resolve_group_buckets() == 64  # floor stays 64
    assert window.resolve_group_buckets(input_bytes=1 << 40) == \
        (1 << 40) // window.TARGET_BUCKET_BYTES + 1
    # input_rows LOWERS a known-small exchange (floor 8), never an
    # explicit count, and the bytes-based raise still applies after
    assert window.resolve_group_buckets(input_rows=100) == 8
    assert window.resolve_group_buckets(input_rows=10_000_000) == 51
    monkeypatch.setattr(ray, "cluster_resources", lambda: {"CPU": 256})
    assert window.resolve_group_buckets(input_rows=10**12) == 512
    assert window.resolve_group_buckets(7, input_rows=100) == 7
    assert window.resolve_group_buckets(
        input_rows=100, input_bytes=1 << 40) == \
        (1 << 40) // window.TARGET_BUCKET_BYTES + 1
    # CI_LOG_GROUP_BUCKETS (cluster-width simulation): raises the
    # default, never lowers, and an explicit n_buckets still wins
    monkeypatch.setattr(ray, "cluster_resources", lambda: {"CPU": 4})
    monkeypatch.setenv("CI_LOG_GROUP_BUCKETS", "1024")
    assert window.resolve_group_buckets() == 1024
    assert window.resolve_group_buckets(7) == 7
    monkeypatch.setenv("CI_LOG_GROUP_BUCKETS", "16")
    assert window.resolve_group_buckets() == 64  # never lowers


def test_local_cc_labels_vectorized_kernel():
    """The phase-1 kernel (no Ray): vectorized min-label propagation
    must equal a reference union-find on random graphs through BOTH id
    paths (dense fast path and factorize path), on a worst-case path
    graph, and with self-loops / duplicate edges."""
    from ci_log_processing_ray.ops.iterative import _local_cc_labels

    def reference_uf(s, d):
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(s.tolist(), d.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    rng = np.random.default_rng(5)
    s = rng.integers(0, 500, 4000, dtype=np.int64)
    d = rng.integers(0, 500, 4000, dtype=np.int64)  # includes self-loops
    for mul, off in ((1, 0), (1_000_003, 17)):  # dense path, sparse path
        ss, dd = s * mul + off, d * mul + off
        nodes, roots = _local_cc_labels(ss, dd)
        assert list(nodes) == sorted(nodes)
        assert dict(zip(nodes.tolist(), roots.tolist())) == reference_uf(
            ss, dd)

    # path graph: diameter == n-1, the propagation worst case
    n = 5000
    sp = np.arange(n - 1, dtype=np.int64)
    nodes, roots = _local_cc_labels(sp, sp + 1)
    assert (roots == 0).all() and len(nodes) == n

    # empty block
    z = np.array([], dtype=np.int64)
    nodes, roots = _local_cc_labels(z, z)
    assert len(nodes) == 0 and len(roots) == 0


def test_tokenize_to_ids_ranking(ray_session):
    from ci_log_processing_ray.ops.curation import tokenize_to_ids

    rows = [
        {"doc_id": 1, "text": "b b b a a c"},
        {"doc_id": 2, "text": "b a"},
    ]
    out = tokenize_to_ids(ray.data.from_items(rows), "text",
                          "doc_id").to_pandas()
    # vocab ranked by freq desc, word asc: b(4)->0, a(3)->1, c(1)->2
    got = {(r.doc_id, r.tid): r.n for r in out.itertuples()}
    assert got == {(1, 0): 3, (1, 1): 2, (1, 2): 1, (2, 0): 1, (2, 1): 1}


def test_epoch_shuffle_arbitrary_ids(ray_session):
    """Permutation property holds for sparse, unordered, negative ids."""
    from ci_log_processing_ray.ops.shuffle import epoch_shuffle

    ids = np.array([-5, 0, 7, 1000003, 42, -99, 8], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"doc_id": ids})).repartition(3)
    out = epoch_shuffle(ds, "doc_id").to_pandas()
    assert sorted(out.pos) == list(range(1, len(ids) + 1))
    assert set(out.doc_id) == set(ids)


def test_chunk_text_reconstruction_property(ray_session):
    """Taking every chunk's first `stride` words (and the last chunk
    whole) reconstructs the tokenized document exactly."""
    from ci_log_processing_ray.ops.curation import chunk_text

    rng = np.random.default_rng(12)
    texts = [" ".join(rng.choice(["aa", "bb", "cc", "dd"],
                                 size=rng.integers(1, 40)))
             for _ in range(25)]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    out = chunk_text(ray.data.from_items(rows), "text", "doc_id",
                     chunk_size=7, stride=5).to_pandas()
    for i, t in enumerate(texts):
        chunks = out[out.doc_id == i].sort_values("chunk_idx")
        words = []
        rowlist = list(chunks.itertuples())
        for j, r in enumerate(rowlist):
            w = r.chunk_text.split()
            words.extend(w if j == len(rowlist) - 1 else w[:5])
        assert words == t.split(), i


def test_model_score_deterministic_and_batched(ray_session):
    from ci_log_processing_ray.ops.inference import (
        filter_by_score, score_texts)

    rows = [{"doc_id": i, "text": f"doc number {i} with words " * (i + 1)}
            for i in range(30)]
    a = score_texts(ray.data.from_items(rows), "text",
                    "doc_id").to_pandas().sort_values("doc_id")
    # reproducible across runs and partitionings
    b = score_texts(ray.data.from_items(rows).repartition(5), "text",
                    "doc_id").to_pandas().sort_values("doc_id")
    assert np.allclose(a.model_score.to_numpy(), b.model_score.to_numpy())
    assert ((a.model_score >= 0) & (a.model_score <= 1)).all()

    thresh = float(a.model_score.median())
    kept = filter_by_score(ray.data.from_items(rows), "text", "doc_id",
                           threshold=thresh).to_pandas()
    want = set(a[a.model_score >= thresh].doc_id)
    assert set(kept.doc_id) == want
    assert "text" in kept.columns  # payload rides along, fused


def test_incremental_dedup_index(ray_session, tmp_path):
    """Cross-run exact dedup through the sharded index actors: run 2
    only emits never-before-flushed content, and a fresh index handle
    reloads the committed state from disk."""
    import time

    from ci_log_processing_ray.state.dedup_index import (
        DedupIndex, incremental_dedup)

    d = str(tmp_path / "idx")
    idx = DedupIndex(d, n_shards=4)
    try:
        a = ray.data.from_items(
            [{"doc_id": i, "text": f"text {i % 50}"} for i in range(200)])
        out1 = incremental_dedup(a, idx, "text", "doc_id").to_pandas()
        assert len(out1) == 50                      # within-run dedup
        assert idx.flush() == 50
        b = ray.data.from_items(
            [{"doc_id": 1000 + i, "text": f"text {i}"} for i in range(80)])
        out2 = incremental_dedup(b, idx, "text", "doc_id").to_pandas()
        assert sorted(out2.doc_id) == list(range(1050, 1080))  # only new
        idx.flush()
    finally:
        idx.shutdown()
    idx2 = DedupIndex(d, n_shards=4)   # restart: reload from parquet
    try:
        assert idx2.size() == 80
        out3 = incremental_dedup(
            ray.data.from_items(
                [{"doc_id": 5, "text": "text 5"}]), idx2, "text",
            "doc_id").to_pandas()
        assert len(out3) == 0
    finally:
        idx2.shutdown()


def test_tag_late_events_watermark(ray_session):
    from ci_log_processing_ray.ops.window import tag_late_events

    t0 = pd.Timestamp("2024-01-01")
    rows = [
        {"aid": 1, "ts": t0},
        {"aid": 2, "ts": t0 + pd.Timedelta("2h")},    # advances watermark
        {"aid": 3, "ts": t0 + pd.Timedelta("30min")}, # 90min late -> LATE
        {"aid": 4, "ts": t0 + pd.Timedelta("90min")}, # 30min late -> ok
        {"aid": 5, "ts": t0 + pd.Timedelta("3h")},
    ]
    out = tag_late_events(
        ray.data.from_items(rows).repartition(3), "aid", "ts",
        allowed_lateness_us=3_600_000_000).to_pandas().set_index("aid")
    assert out.is_late.to_dict() == {1: 0, 2: 0, 3: 1, 4: 0, 5: 0}


def test_cap_per_group_quota(ray_session):
    from ci_log_processing_ray.ops.curation import cap_per_group

    rows = ([{"doc_id": i, "g": "big"} for i in range(100)]
            + [{"doc_id": 1000 + i, "g": "small"} for i in range(3)])
    out = cap_per_group(ray.data.from_items(rows).repartition(5),
                        "g", "doc_id", 10).to_pandas()
    sizes = out.groupby("g").size().to_dict()
    assert sizes == {"big": 10, "small": 3}
    # deterministic pick regardless of partitioning
    again = cap_per_group(ray.data.from_items(rows).repartition(2),
                          "g", "doc_id", 10).to_pandas()
    assert set(out.doc_id) == set(again.doc_id)


def test_length_batches_padding(ray_session):
    """Batches of consecutive length-DESC ranks; padding = n*max - sum;
    partitioning-invariant; ragged final batch handled."""
    from ci_log_processing_ray.ops.pack import length_batches

    rng = np.random.default_rng(9)
    lens = rng.integers(1, 500, size=101)
    rows = [{"doc_id": i, "n": int(l)} for i, l in enumerate(lens)]
    out = (length_batches(ray.data.from_items(rows).repartition(5),
                          "n", "doc_id", batch_size=8)
           .to_pandas().sort_values("batch_id").reset_index(drop=True))
    order = sorted(range(101), key=lambda i: (-lens[i], i))
    for b in range(13):
        seg = [lens[i] for i in order[b * 8:(b + 1) * 8]]
        row = out.iloc[b]
        assert row["n_docs"] == len(seg)
        assert row["max_len"] == max(seg)
        assert row["sum_len"] == sum(seg)
        assert row["padding"] == len(seg) * max(seg) - sum(seg)
    assert out.iloc[12]["n_docs"] == 5  # ragged last batch
    again = (length_batches(ray.data.from_items(rows).repartition(2),
                            "n", "doc_id", batch_size=8)
             .to_pandas().sort_values("batch_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, again)


def test_temperature_mix_quotas(ray_session):
    """floor(sqrt(n)) quota per source, md5-order pick, partitioning-
    invariant, brute-force parity on the picked ids."""
    import hashlib

    from ci_log_processing_ray.ops.curation import temperature_mix

    rows = ([{"doc_id": i, "g": "big"} for i in range(100)]
            + [{"doc_id": 1000 + i, "g": "mid"} for i in range(10)]
            + [{"doc_id": 2000 + i, "g": "tiny"} for i in range(2)])
    out = temperature_mix(ray.data.from_items(rows).repartition(5),
                          "g", "doc_id").to_pandas()
    sizes = out.groupby("g").size().to_dict()
    assert sizes == {"big": 10, "mid": 3, "tiny": 1}
    # brute-force md5-order pick per group must match exactly
    import pandas as pd_
    df = pd_.DataFrame(rows)
    df["mk"] = df["doc_id"].map(
        lambda i: hashlib.md5(str(i).encode()).hexdigest())
    want = set()
    for g, grp in df.groupby("g"):
        q = int(len(grp) ** 0.5)
        want |= set(grp.sort_values(["mk", "doc_id"])
                    .head(q)["doc_id"])
    assert set(out["doc_id"]) == want
    # partitioning-invariant
    again = temperature_mix(ray.data.from_items(rows).repartition(2),
                            "g", "doc_id").to_pandas()
    assert set(out.doc_id) == set(again.doc_id)
    # quota_fn override: keep everything
    full = temperature_mix(ray.data.from_items(rows), "g", "doc_id",
                           quota_fn=lambda n: n).to_pandas()
    assert len(full) == len(rows)


def test_pack_bins_ffd_invariants(ray_session):
    from ci_log_processing_ray.ops.pack import pack_bins_ffd

    rng = np.random.default_rng(21)
    lens = np.concatenate([rng.integers(100, 900, size=200),
                           np.array([2048, 3000, 0, 0])])  # + zero-length
    rows = [{"doc_id": i, "n_tok": int(l)} for i, l in enumerate(lens)]
    out = pack_bins_ffd(ray.data.from_items(rows).repartition(4),
                        "doc_id", "n_tok", 2048,
                        n_buckets=8).to_pandas()
    assert len(out) == len(rows)
    m = out.merge(pd.DataFrame(rows), on="doc_id")
    fills = m.groupby("bin_id")["n_tok"].sum()
    clipped = m.copy()
    clipped.loc[clipped.truncated == 1, "n_tok"] = 2048
    assert (clipped.groupby("bin_id")["n_tok"].sum() <= 2048).all()
    assert m[m.doc_id == 201].truncated.iloc[0] == 1   # 3000 > capacity
    assert m[m.doc_id == 200].truncated.iloc[0] == 0   # 2048 exact fit
    # zero-length docs never overflow a bin or land in an own-bin
    assert (m.offset_in_bin < 2048).all()
    # offsets within a bin are consistent: disjoint [off, off+len) spans
    for _, grp in m[m.truncated == 0].groupby("bin_id"):
        spans = sorted(zip(grp.offset_in_bin, grp.offset_in_bin + grp.n_tok))
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 <= s2
    # utilization sanity: FFD on uniform(100,900) fills bins well
    assert fills.mean() > 1200


def test_rate_sample_by_group(ray_session):
    from ci_log_processing_ray.ops.curation import rate_sample_by_group

    rows = ([{"doc_id": i, "g": "half"} for i in range(400)]
            + [{"doc_id": 1000 + i, "g": "tiny"} for i in range(400)])
    out = rate_sample_by_group(
        ray.data.from_items(rows).repartition(4), "g", "doc_id",
        {"half": "8"}, "1").to_pandas()
    frac = out.groupby("g").size() / 400
    assert 0.4 < frac["half"] < 0.6      # ~50%
    assert frac.get("tiny", 0) < 0.12    # ~6.25%
    # deterministic: identical subset on a different partitioning
    again = rate_sample_by_group(
        ray.data.from_items(rows).repartition(2), "g", "doc_id",
        {"half": "8"}, "1").to_pandas()
    assert set(out.doc_id) == set(again.doc_id)


def test_pagerank_fixedpoint_vs_dense_reference(ray_session):
    from ci_log_processing_ray.ops.iterative import pagerank_fixedpoint

    rng = np.random.default_rng(7)
    src = rng.integers(0, 40, size=600)
    dst = rng.integers(0, 40, size=600)
    edges = ray.data.from_items(
        [{"s": int(a), "d": int(b)} for a, b in zip(src, dst)]
    ).repartition(5)
    out = pagerank_fixedpoint(edges, "s", "d", n_iter=4).to_pandas()
    out = out.sort_values("node").reset_index(drop=True)

    # independent dense reference: same integer floor semantics
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(nodes)}
    n = len(nodes)
    scale = 10**12
    deg = np.zeros(n, dtype=np.int64)
    for a in src:
        deg[idx[int(a)]] += 1
    r = np.full(n, scale // n, dtype=np.int64)
    tele = (15 * scale) // (100 * n)
    for _ in range(4):
        new = np.full(n, tele, dtype=np.int64)
        for a, b in zip(src, dst):
            ia, ib = idx[int(a)], idx[int(b)]
            new[ib] += (85 * r[ia]) // (100 * deg[ia])
        r = new
    assert (out["node"].to_numpy() == nodes).all()
    assert (out["rank_fp"].to_numpy() == r).all()
    # mass sanity: leaks only via floor truncation + dangling nodes
    assert 0 < out["rank_fp"].sum() <= scale


def test_gini_coefficient_by_group(ray_session):
    from ci_log_processing_ray.ops.quantile import (
        gini_coefficient_by_group)

    rows = (
        # group 1: perfectly equal -> 0
        [{"g": 1, "x": 7}] * 6
        # group 2: one owner -> (n-1)/n = 750 permille at n=4
        + [{"g": 2, "x": 0}] * 3 + [{"g": 2, "x": 100}]
        # group 3: [1,2,3,4] -> num = -3-1+1*3+3*4 = 2*?; brute below
        + [{"g": 3, "x": v} for v in (3, 1, 4, 2)]
        # group 4: all zero -> dropped (S = 0)
        + [{"g": 4, "x": 0}] * 2
    )

    def brute(xs):
        xs = sorted(xs)
        n, S = len(xs), sum(xs)
        num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
        return (1000 * num) // (n * S)

    out = gini_coefficient_by_group(
        ray.data.from_items(rows).repartition(4),
        "g", "x", n_buckets=4).to_pandas()
    out = out.sort_values("g").reset_index(drop=True)
    assert out["g"].tolist() == [1, 2, 3]
    assert out["n_obs"].tolist() == [6, 4, 4]
    assert out["gini_permille"].tolist() == [
        0, brute([0, 0, 0, 100]), brute([1, 2, 3, 4])]
    assert out["gini_permille"].iloc[1] == 750


def test_benford_deviation_counts(ray_session):
    from ci_log_processing_ray.ops.profile import benford_deviation

    vals = [1, 19, 250, 2, 29, 35, 9999, 1, 111, 0, -7]  # 0/-7 dropped
    out = benford_deviation(
        ray.data.from_items([{"x": v} for v in vals]).repartition(3),
        "x").to_pandas()
    got = dict(zip(out["digit"], out["n"]))
    assert got == {1: 4, 2: 3, 3: 1, 9: 1}
    row1 = out[out["digit"] == 1].iloc[0]
    assert row1["obs_permille"] == (1000 * 4) // 9
    assert row1["benford_permille"] == 301
    assert row1["abs_dev_permille"] == abs((1000 * 4) // 9 - 301)


def test_fano_by_group_burstiness(ray_session):
    from ci_log_processing_ray.ops.groupagg import fano_by_group

    rows = (
        # group 1: 2 events on each of 3 days -> variance 0 -> fano 0
        [{"g": 1, "d": d} for d in (10, 11, 12) for _ in range(2)]
        # group 2: counts [1,1,4] -> (1000*(3*18-36))//(3*6) = 1000
        + [{"g": 2, "d": 20}, {"g": 2, "d": 21}]
        + [{"g": 2, "d": 22}] * 4
        # group 3: single day -> fano 0
        + [{"g": 3, "d": 30}] * 5
    )
    out = fano_by_group(
        ray.data.from_items(rows).repartition(4),
        "g", "d", n_buckets=4).to_pandas()
    out = out.sort_values("g").reset_index(drop=True)
    assert out["g"].tolist() == [1, 2, 3]
    assert out["n_units"].tolist() == [3, 3, 1]
    assert out["n_events"].tolist() == [6, 6, 5]
    assert out["fano_permille"].tolist() == [0, 1000, 0]


def test_hhi_by_group_pure_and_uniform(ray_session):
    from ci_log_processing_ray.ops.groupagg import hhi_by_group

    rows = (
        # group 1: pure -> 1000
        [{"g": 1, "lab": "a"}] * 5
        # group 2: uniform over 4 classes -> (1000*4*9)//(36) = 250
        + [{"g": 2, "lab": l} for l in "abcd" for _ in range(3)]
        # group 3: skewed 3/1 -> (1000*(9+1))//16 = 625
        + [{"g": 3, "lab": "a"}] * 3 + [{"g": 3, "lab": "b"}]
    )
    out = hhi_by_group(
        ray.data.from_items(rows).repartition(4),
        "g", "lab", n_buckets=4).to_pandas()
    out = out.sort_values("g").reset_index(drop=True)
    assert out["g"].tolist() == [1, 2, 3]
    assert out["n"].tolist() == [5, 12, 4]
    assert out["hhi_permille"].tolist() == [1000, 250, 625]


def test_autocorr_by_group_exact(ray_session):
    from ci_log_processing_ray.ops.window import autocorr_by_group

    series = {
        1: [10, 20, 30, 40, 50],       # rising -> positive acf
        2: [10, 50, 10, 50, 10, 50],   # alternating -> negative acf
        3: [7, 7, 7],                  # constant -> den=0, dropped
        4: [99],                       # n <= lag, dropped
    }
    rows = [{"g": g, "ord": i, "x": v}
            for g, xs in series.items() for i, v in enumerate(xs)]
    out = autocorr_by_group(
        ray.data.from_items(rows).repartition(4),
        "g", ["ord"], "x", lag=1, n_buckets=4).to_pandas()
    out = out.sort_values("g").reset_index(drop=True)

    def ref(xs, k=1):
        n, S = len(xs), sum(xs)
        num = sum((n * xs[t] - S) * (n * xs[t + k] - S)
                  for t in range(n - k))
        den = sum((n * x - S) ** 2 for x in xs)
        return (-((1000 * -num) // den) if num < 0
                else (1000 * num) // den)

    assert out["g"].tolist() == [1, 2]
    assert out["n_obs"].tolist() == [5, 6]
    assert out["acf_permille"].tolist() == [ref(series[1]),
                                            ref(series[2])]
    assert out["acf_permille"].iloc[0] > 0 > out["acf_permille"].iloc[1]


def test_greedy_max_coverage_marginal_gains(ray_session):
    from ci_log_processing_ray.ops.curation import greedy_max_coverage

    rows = [
        {"doc_id": 1, "text": "a b c d e f"},   # abc bcd cde def
        {"doc_id": 2, "text": "a b c d e"},     # strict subset of doc 1
        {"doc_id": 3, "text": "x y z w"},       # xyz yzw
        {"doc_id": 4, "text": "c d e x y z"},   # cde dex exy xyz
    ]
    out = greedy_max_coverage(
        ray.data.from_items(rows).repartition(3),
        "doc_id", "text", k=4, ngram=3, n_buckets=4).to_pandas()
    out = out.sort_values("pick").reset_index(drop=True)
    # round 1: docs 1 and 4 both cover 4 grams -> tie breaks to doc 1;
    # round 2: doc 4's marginal gain is 3 (cde already covered) --
    # naive top-k would rank doc 2 (3 grams) here, greedy must not;
    # round 3: doc 3 gains only yzw (xyz covered by doc 4);
    # round 4: doc 2 has zero uncovered grams -> early stop, 3 rows.
    assert out["pick"].tolist() == [1, 2, 3]
    assert out["doc_id"].tolist() == [1, 4, 3]
    assert out["gain"].tolist() == [4, 3, 1]


def test_hits_fixedpoint_vs_dense_reference(ray_session):
    from ci_log_processing_ray.ops.iterative import hits_fixedpoint

    rng = np.random.default_rng(11)
    src = rng.integers(0, 30, size=400)
    dst = rng.integers(0, 30, size=400)
    edges = ray.data.from_items(
        [{"s": int(a), "d": int(b)} for a, b in zip(src, dst)]
    ).repartition(5)
    out = hits_fixedpoint(edges, "s", "d", n_iter=2).to_pandas()
    out = out.sort_values("node").reset_index(drop=True)

    # independent dense reference: same unnormalized integer semantics
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(nodes)}
    n = len(nodes)
    h = np.ones(n, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(2):
        a = np.zeros(n, dtype=np.int64)
        for u, v in zip(src, dst):
            a[idx[int(v)]] += h[idx[int(u)]]
        h = np.zeros(n, dtype=np.int64)
        for u, v in zip(src, dst):
            h[idx[int(u)]] += a[idx[int(v)]]
    assert (out["node"].to_numpy() == nodes).all()
    assert (out["hub"].to_numpy() == h).all()
    assert (out["auth"].to_numpy() == a).all()
    # multi-edges must contribute per occurrence: total a1 mass equals
    # the edge count after one half-round by construction
    assert a.sum() > 0 and h.sum() > 0


def test_funnel_first_conversion_boundaries(ray_session):
    import datetime as dt

    from ci_log_processing_ray.ops.window import funnel_first_conversion

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    mk = lambda u, typ, mins: {"user_id": u, "event_type": typ,
                               "ts": t0 + dt.timedelta(minutes=mins)}
    rows = [
        # u1: conversion exactly at the window edge (inclusive)
        mk(1, "view", 0), mk(1, "purchase", 30),
        # u2: purchase BEFORE any view -> not a conversion; later one is
        mk(2, "purchase", 0), mk(2, "view", 5), mk(2, "purchase", 20),
        # u3: purchase outside the window -> unconverted
        mk(3, "view", 0), mk(3, "purchase", 31),
        # u4: views only
        mk(4, "view", 0), mk(4, "view", 10),
        # u5: purchases only -> no output row (funnel needs step A)
        mk(5, "purchase", 0),
    ]
    out = funnel_first_conversion(
        ray.data.from_items(rows).repartition(3),
        "user_id", "ts", "event_type",
        step_a="view", step_b="purchase",
        window=dt.timedelta(minutes=30)).to_pandas()
    out = out.sort_values("user_id").reset_index(drop=True)
    assert out["user_id"].tolist() == [1, 2, 3, 4]
    assert out["n_step_a"].tolist() == [1, 1, 1, 2]
    conv = out["first_conversion_ts"]
    assert conv[0] == t0 + dt.timedelta(minutes=30)   # edge inclusive
    assert conv[1] == t0 + dt.timedelta(minutes=20)   # pre-view b ignored
    assert pd.isna(conv[2]) and pd.isna(conv[3])


def test_profile_columns_nulls_and_distinct(ray_session):
    from ci_log_processing_ray.ops.profile import profile_columns

    rows = ([{"a": i % 7, "b": None if i % 3 == 0 else f"s{i % 4}"}
             for i in range(90)]
            + [{"a": None, "b": "s0"} for _ in range(10)])
    out = profile_columns(
        ray.data.from_items(rows).repartition(4), ["a", "b"]).to_pandas()
    out = out.set_index("col_name")
    assert out.loc["a", "n"] == 100 and out.loc["b", "n"] == 100
    assert out.loc["a", "n_null"] == 10
    assert out.loc["b", "n_null"] == 30          # i % 3 == 0 within 0..89
    assert out.loc["a", "n_distinct"] == 7       # nulls excluded
    assert out.loc["b", "n_distinct"] == 4


def test_snapshot_diff_classification(ray_session):
    from ci_log_processing_ray.ops.diff import snapshot_diff

    old = ray.data.from_items([
        {"k": 1, "v": "a"}, {"k": 2, "v": "b"}, {"k": 3, "v": None},
        {"k": 4, "v": "d"}, {"k": 5, "v": None}]).repartition(2)
    new = ray.data.from_items([
        {"k": 1, "v": "a"},          # unchanged
        {"k": 2, "v": "B"},          # changed
        {"k": 3, "v": None},         # NULL on both sides -> unchanged
        {"k": 5, "v": "now"},        # NULL -> value: SQL <> is NULL,
        {"k": 6, "v": "f"},          # added       not TRUE -> unchanged
    ]).repartition(3)                # k=4 -> removed
    out = (snapshot_diff(old, new, "k", "v", num_partitions=2)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert dict(zip(out.k, out.status)) == {
        2: "changed", 4: "removed", 6: "added"}
    full = (snapshot_diff(old, new, "k", "v", keep_unchanged=True,
                          num_partitions=2).to_pandas())
    assert len(full) == 6
    assert dict(zip(full.k, full.status))[3] == "unchanged"
    assert dict(zip(full.k, full.status))[5] == "unchanged"


def test_parse_and_filter_urls(ray_session):
    from ci_log_processing_ray.ops.urltools import parse_and_filter_urls

    rows = [
        {"id": 1, "u": "https://Sub.HOST.com:8080/a/b?x=1#frag"},
        {"id": 2, "u": "http://plain.org"},
        {"id": 3, "u": "https://blocked.net/page"},
        {"id": 4, "u": "not a url"},
        {"id": 5, "u": "ftp://other.scheme/x"},
    ]
    out = parse_and_filter_urls(
        ray.data.from_items(rows).repartition(2), "u",
        blocked_hosts={"blocked.net"}, keep_cols=["id"]
    ).to_pandas().sort_values("id").reset_index(drop=True)
    # blocked host, unparseable string, and non-http scheme all dropped
    assert out["id"].tolist() == [1, 2]
    assert out["host"].tolist() == ["sub.host.com", "plain.org"]
    assert out["path"].tolist() == ["/a/b", ""]   # port/query/frag gone
    assert out["canonical_url"].tolist() == ["sub.host.com/a/b",
                                             "plain.org"]


def test_safe_map_batches_quarantine(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ci_log_processing_ray.stages.quarantine import safe_map_batches

    rows = [{"k": i, "v": float(i)} for i in range(200)]
    poison = {30, 31, 77, 150}

    def udf(t: pa.Table) -> pa.Table:
        ks = t["k"].combine_chunks().to_numpy()
        if any(int(k) in poison for k in ks):
            raise ValueError("corrupt record")
        return pa.table({"k": t["k"],
                         "v2": pa.array(ks.astype(np.int64) * 2)})

    qdir = str(tmp_path / "quarantine")
    out = safe_map_batches(
        ray.data.from_items(rows).repartition(4), udf,
        quarantine_dir=qdir).to_pandas().sort_values("k")
    assert set(out.k) == set(range(200)) - poison
    assert (out.v2.to_numpy() == out.k.to_numpy() * 2).all()
    qt = pq.read_table(qdir).to_pandas()
    assert set(qt.k) == poison
    assert (qt._error.str.contains("corrupt record")).all()
    # all-poison batch with out_schema -> empty result, rows quarantined
    allbad = ray.data.from_items([{"k": 30, "v": 0.0}] * 5).repartition(1)
    empty = safe_map_batches(
        allbad, udf, quarantine_dir=qdir,
        out_schema=pa.schema([("k", pa.int64()), ("v2", pa.int64())]))
    assert empty.count() == 0


def test_bottomk_by_hash_partition_invariant(ray_session):
    import hashlib

    from ci_log_processing_ray.ops.curation import bottomk_by_hash

    rows = [{"k": i, "p": f"v{i}"} for i in range(300)]
    expect = sorted(range(300),
                    key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(),
                                   i))[:25]
    for nparts in (1, 7):
        out = bottomk_by_hash(
            ray.data.from_items(rows).repartition(nparts), "k", 25
        ).to_pandas()
        assert sorted(out.k) == sorted(expect)
        assert out.p.tolist() == [f"v{i}" for i in out.k]


def test_compression_ratio_separates_repetition(ray_session):
    from ci_log_processing_ray.ops.textstats import compression_ratio

    rows = [{"id": 0, "t": "spam " * 400},
            {"id": 1, "t": " ".join(f"w{i * 7919 % 5003}"
                                    for i in range(400))},
            {"id": 2, "t": ""}]
    out = compression_ratio(
        ray.data.from_items(rows).repartition(2), "t", "id"
    ).to_pandas().set_index("id")
    assert out.loc[0, "ratio_milli"] < 100       # boilerplate crushes
    assert out.loc[1, "ratio_milli"] > 300       # diverse text doesn't
    assert out.loc[2, "raw_bytes"] == 0          # empty doc safe
    assert (out.comp_bytes > 0).all()


def test_runs_by_group_islands(ray_session):
    from ci_log_processing_ray.ops.window import runs_by_group

    rows = [
        {"u": 1, "o": 1, "v": "a"}, {"u": 1, "o": 2, "v": "a"},
        {"u": 1, "o": 3, "v": "b"}, {"u": 1, "o": 4, "v": "a"},
        {"u": 2, "o": 1, "v": "a"},   # same value, different key ->
    ]                                 # never merges across users
    out = runs_by_group(
        ray.data.from_items(rows).repartition(3), "u", ["o"], "v"
    ).to_pandas().sort_values(["u", "valid_from"]).reset_index(drop=True)
    got = list(zip(out.u, out.v, out.valid_from, out.last_seen, out.n_rows))
    assert got == [(1, "a", 1, 2, 2), (1, "b", 3, 3, 1),
                   (1, "a", 4, 4, 1), (2, "a", 1, 1, 1)]


def test_retention_cohorts_counts(ray_session):
    import datetime as dt

    from ci_log_processing_ray.ops.groupagg import retention_cohorts

    d0 = dt.datetime(2024, 3, 1)
    rows = []
    # u1: days 0,1,3 (two events day 0 -> still one distinct)
    for off in (0, 0, 1, 3):
        rows.append({"u": 1, "ts": d0 + dt.timedelta(days=off, hours=2)})
    # u2: joins day 1, active day 1 and 3 (offsets 0 and 2)
    for off in (1, 3):
        rows.append({"u": 2, "ts": d0 + dt.timedelta(days=off)})
    out = retention_cohorts(
        ray.data.from_items(rows).repartition(3), "u", "ts"
    ).to_pandas()
    got = {(r.cohort.day, r.day_offset): r.n_users
           for r in out.itertuples()}
    assert got == {(1, 0): 1, (1, 1): 1, (1, 3): 1,   # u1 cohort Mar 1
                   (2, 0): 1, (2, 2): 1}              # u2 cohort Mar 2


def test_cube_counts_all_subsets(ray_session):
    from ci_log_processing_ray.ops.groupagg import cube_counts

    rows = [{"a": "x", "b": "p", "v": 1}, {"a": "x", "b": "q", "v": 2},
            {"a": "y", "b": "p", "v": 4}]
    out = cube_counts(ray.data.from_items(rows).repartition(2),
                      ["a", "b"], "n", sum_col="v", sum_name="sv")
    got = {(r.a, r.b): (r.n, r.sv) for r in out.itertuples()}
    assert got[("x", "p")] == (1, 1) and got[("x", "q")] == (1, 2)
    assert got[("x", None)] == (2, 3)       # rollup level a
    assert got[(None, "p")] == (2, 5)       # CUBE-only level b
    assert got[(None, None)] == (3, 7)      # grand total
    assert len(got) == 3 + 2 + 2 + 1


def test_weighted_bottomk_bias_and_determinism(ray_session):
    from ci_log_processing_ray.ops.curation import weighted_bottomk

    rows = [{"k": i, "w": 1000 if i < 50 else 1} for i in range(1000)]
    a = weighted_bottomk(
        ray.data.from_items(rows).repartition(4), "k", "w", 40).to_pandas()
    b = weighted_bottomk(
        ray.data.from_items(rows).repartition(9), "k", "w", 40).to_pandas()
    # heavy keys (w=1000, 5% of rows) dominate the sample
    assert (a.k < 50).sum() >= 30
    assert len(a) == 40
    # partition-invariant and sorted by priority
    assert a.k.tolist() == b.k.tolist()
    assert a.priority.is_monotonic_increasing


def test_interval_overlap_join_pairs(ray_session):
    import datetime as dt

    from ci_log_processing_ray.ops.relational import interval_overlap_join

    D = lambda d: dt.datetime(2024, 1, d)
    rows = [
        # key 1: a=(9,1) starts first but has the LARGER id than (3,1):
        # canonicalization must swap.  [1,5] and [3,9] overlap (3 days
        # shared: 3..5); [12,13] touches nothing.
        {"k": 1, "ok": 9, "ln": 1, "s": D(1), "e": D(5)},
        {"k": 1, "ok": 3, "ln": 1, "s": D(3), "e": D(9)},
        {"k": 1, "ok": 5, "ln": 2, "s": D(12), "e": D(13)},
        # closed-interval touch: [5,7] meets [7,8] at exactly day 7
        {"k": 2, "ok": 1, "ln": 1, "s": D(5), "e": D(7)},
        {"k": 2, "ok": 2, "ln": 1, "s": D(7), "e": D(8)},
        # same window on another key: never pairs across keys
        {"k": 3, "ok": 1, "ln": 1, "s": D(1), "e": D(31)},
    ]
    out = interval_overlap_join(
        ray.data.from_items(rows).repartition(3), "k", "s", "e",
        ["ok", "ln"]).to_pandas().sort_values(["k"]).reset_index(drop=True)
    got = [(r.k, r.a_ok, r.a_ln, r.b_ok, r.b_ln, r.overlap_days)
           for r in out.itertuples()]
    assert got == [(1, 3, 1, 9, 1, 2), (2, 1, 1, 2, 1, 0)]


def test_inverted_index_postings(ray_session):
    from ci_log_processing_ray.ops.textstats import inverted_index

    rows = [{"id": 3, "t": "red fox"}, {"id": 1, "t": "red fox red fox"},
            {"id": 2, "t": "blue fox"}, {"id": 4, "t": ""}]
    out = inverted_index(
        ray.data.from_items(rows).repartition(3), "t", "id",
        n=1).to_pandas()
    got = {r.term: (r.df, r.postings) for r in out.itertuples()}
    # repeats within a doc count once; postings numeric-ascending
    assert got == {"red": (2, "1,3"), "fox": (3, "1,2,3"),
                   "blue": (1, "2")}
    capped = inverted_index(ray.data.from_items(rows), "t", "id",
                            n=1, min_df=2, max_df=2).to_pandas()
    assert set(capped.term) == {"red"}


def test_next_word_model(ray_session):
    from ci_log_processing_ray.ops.textstats import next_word_model

    rows = [
        {"t": "the cat sat"},          # the->cat, cat->sat
        {"t": "the cat ran"},          # the->cat, cat->ran
        {"t": "the dog"},              # the->dog
        {"t": "the ant"},              # the->ant (tie with dog: w2 asc)
        {"t": ""},                     # empty doc between others
        {"t": "sat the"},              # sat->the; no pair crosses docs
    ]
    out = next_word_model(
        ray.data.from_items(rows).repartition(3), "t", k=2).to_pandas()
    got = {(r.w1, r.w2): (r.n, r.total, r.p_permille)
           for r in out.itertuples()}
    # 'the' has 5 continuations: cat x2, ant, dog; k=2 keeps cat then
    # the tie broken by w2 ascending (ant before dog)
    assert got[("the", "cat")] == (2, 4, 500)
    assert got[("the", "ant")] == (1, 4, 250)
    assert ("the", "dog") not in got
    assert got[("cat", "ran")] == (1, 2, 500)
    assert got[("cat", "sat")] == (1, 2, 500)
    assert got[("sat", "the")] == (1, 1, 1000)
    # doc boundaries masked: 'ran'->'the', 'sat'(doc1)->'the'(doc2) absent
    assert ("ran", "the") not in got and ("ant", "sat") not in got
    w1s = set(out.w1)
    assert "ran" not in w1s and "ant" not in w1s


def test_melt_unpivot(ray_session):
    from ci_log_processing_ray.ops.reshape import melt

    rows = [{"id": 1, "a": 10, "b": 20}, {"id": 2, "a": 30, "b": 40}]
    out = melt(ray.data.from_items(rows).repartition(2),
               ["id"], ["a", "b"]).to_pandas()
    got = {(r.id, r.variable): r.value for r in out.itertuples()}
    assert got == {(1, "a"): 10, (1, "b"): 20, (2, "a"): 30, (2, "b"): 40}
    assert len(out) == 4
    assert list(out.columns) == ["id", "variable", "value"]


def test_corr_suffstats_exact_and_partition_invariant(ray_session):
    from ci_log_processing_ray.ops.groupagg import corr_suffstats_by_group

    rows = [{"g": "a", "x": 1, "y": 2}, {"g": "a", "x": 3, "y": 5},
            {"g": "b", "x": -2, "y": 7}]
    for nparts in (1, 3):
        out = corr_suffstats_by_group(
            ray.data.from_items(rows).repartition(nparts),
            "g", "x", "y").to_pandas().set_index("g")
        a = out.loc["a"]
        assert (a.n, a.sum_x, a.sum_y) == (2, 4, 7)
        assert (a.sum_xx, a.sum_yy, a.sum_xy) == (10, 29, 17)
        b = out.loc["b"]
        assert (b.n, b.sum_x, b.sum_y, b.sum_xx, b.sum_yy, b.sum_xy) == \
            (1, -2, 7, 4, 49, -14)
        # derived slope for g=a: cov*n = n*sxy - sx*sy = 34-28 = 6
        assert a.n * a.sum_xy - a.sum_x * a.sum_y == 6


def test_minmax_scale_by_group(ray_session):
    from ci_log_processing_ray.ops.groupagg import minmax_scale_by_group

    rows = [{"g": "a", "x": -10}, {"g": "a", "x": 0}, {"g": "a", "x": 30},
            {"g": "b", "x": 7}, {"g": "b", "x": 7}]  # constant group
    out = minmax_scale_by_group(
        ray.data.from_items(rows).repartition(3), "g", "x",
        out_col="s").to_pandas()
    got = {(r.g, r.x): r.s for r in out.itertuples()}
    assert got[("a", -10)] == 0
    assert got[("a", 0)] == 250      # (0+10)*1000 // 40
    assert got[("a", 30)] == 1000
    assert got[("b", 7)] == 0        # max == min -> 0, no div-by-zero


def test_row_number_global_dense_and_partition_invariant(ray_session):
    from ci_log_processing_ray.ops.window import row_number_global

    # skewed key domain with cross-block ties on the order col
    rows = [{"k": v, "id": i} for i, v in
            enumerate([5, 5, 5, 100, 3, 7, 7, 1000, 3, 5])]
    out = row_number_global(
        ray.data.from_items(rows).repartition(4), "k",
        tie_cols=["id"], n_buckets=8).to_pandas()
    out = out.sort_values("row_num").reset_index(drop=True)
    # numbering is a permutation 1..n following (k, id) order
    assert list(out.row_num) == list(range(1, 11))
    expect = sorted(rows, key=lambda r: (r["k"], r["id"]))
    assert list(out.k) == [r["k"] for r in expect]
    assert list(out.id) == [r["id"] for r in expect]


def test_edit1_pairs_symspell(ray_session):
    from ci_log_processing_ray.ops.curation import edit1_pairs

    words = ["cat", "bat", "cart", "ab", "dog", "dogs", "cat", "tac"]
    out = edit1_pairs(
        ray.data.from_items([{"w": w} for w in words]).repartition(3),
        "w").to_pandas()
    got = set(zip(out.a, out.b))
    # substitution, insertion, and each pair exactly once despite
    # sharing several deletion variants
    assert ("bat", "cat") in got
    assert ("cart", "cat") in got
    assert ("dog", "dogs") in got
    # d=2 candidates sharing a variant are rejected ("cat"/"tac"
    # share variant "at"? no -- "tac" deletes to "ac","tc","ta";
    # "bat"/"cart" d=3 never candidates); "ab" below min_len dropped
    assert ("cat", "tac") not in got
    assert not any("ab" in p for p in got)
    assert len(got) == 3


def _lev_ref(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev = d[:]
        d[0] = i
        for j in range(1, lb + 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1,
                       prev[j - 1] + (a[i - 1] != b[j - 1]))
    return d[lb]


def test_banded_levenshtein_kernel_exact():
    import random

    import pyarrow as pa

    from ci_log_processing_ray.ops.curation import _banded_levenshtein

    random.seed(11)
    a = ["".join(random.choice("abc") for _ in range(random.randint(0, 9)))
         for _ in range(1500)]
    b = ["".join(random.choice("abc") for _ in range(random.randint(0, 9)))
         for _ in range(1500)]
    for k in (1, 2, 3):
        got = _banded_levenshtein(pa.array(a), pa.array(b), k)
        want = [min(_lev_ref(x, y), k + 1) for x, y in zip(a, b)]
        assert list(got) == want, k


def test_edit_distance_pairs_passjoin(ray_session):
    import itertools
    import random

    from ci_log_processing_ray.ops.curation import edit_distance_pairs

    random.seed(3)
    vocab = sorted({"".join(random.choice("ab")
                            for _ in range(random.randint(3, 9)))
                    for _ in range(120)})
    # corpus with repeats, covering every vocab word
    rows = ([{"w": w} for w in vocab]
            + [{"w": random.choice(vocab)} for _ in range(400)])
    for k in (1, 2):
        want = {(a, b, _lev_ref(a, b))
                for a, b in itertools.combinations(vocab, 2)
                if _lev_ref(a, b) <= k}
        out = edit_distance_pairs(
            ray.data.from_items(rows).repartition(5), "w",
            k=k).to_pandas()
        assert set(zip(out.a, out.b, out.dist)) == want, k


def test_score_docs_bigram_exact_and_topk_cap(ray_session):
    from ci_log_processing_ray.ops.textstats import score_docs_bigram

    rows = [{"i": 0, "t": "the cat sat"},      # the->cat, cat->sat
            {"i": 1, "t": "the cat ran"},      # the->cat, cat->ran
            {"i": 2, "t": "solo"},             # no bigram
            {"i": 3, "t": ""}]                 # empty doc
    out = score_docs_bigram(
        ray.data.from_items(rows).repartition(3), "t", "i").to_pandas()
    got = {r.i: (r.n_bigrams, r.score_sum, r.avg_permille)
           for r in out.itertuples()}
    # model: the->cat pm=1000; cat->sat pm=500; cat->ran pm=500
    assert got[0] == (2, 1500, 750)
    assert got[1] == (2, 1500, 750)
    assert got[2] == (0, 0, 0)
    assert got[3] == (0, 0, 0)
    # pruned model: keep only the single hottest bigram (the->cat, n=2)
    capped = score_docs_bigram(
        ray.data.from_items(rows).repartition(2), "t", "i",
        top_k=1).to_pandas()
    gc = {r.i: (r.n_bigrams, r.score_sum) for r in capped.itertuples()}
    assert gc[0] == (2, 1000) and gc[1] == (2, 1000)


def test_check_contract_rules_and_uniqueness(ray_session):
    import pyarrow.compute as _pc
    from ci_log_processing_ray.ops.profile import check_contract

    rows = [{"k": 1, "v": 5}, {"k": 1, "v": 50},   # dup key 1
            {"k": 2, "v": -1}, {"k": 3, "v": 7},
            {"k": 1, "v": 8}]                      # triple key 1
    out = check_contract(
        ray.data.from_items(rows).repartition(3),
        {"neg_v": lambda t: _pc.less(t["v"], 0),
         "big_v": lambda t: _pc.greater(t["v"], 10)},
        unique_keys={"k_unique": ["k"]}).to_pandas()
    got = dict(zip(out.rule, out.n_violations))
    assert got == {"neg_v": 1, "big_v": 1, "k_unique": 2}
    assert list(out.rule) == sorted(out.rule)


def test_merge_upsert_insert_update_delete(ray_session):
    from ci_log_processing_ray.ops.diff import merge_upsert

    base = ray.data.from_items(
        [{"k": 1, "v": 10}, {"k": 2, "v": 20},
         {"k": 3, "v": 30}]).repartition(2)
    upd = ray.data.from_items(
        [{"k": 2, "v": 99, "del": False},    # update
         {"k": 3, "v": 0, "del": True},      # delete
         {"k": 4, "v": 40, "del": False}])   # insert
    out = merge_upsert(base, upd, ["k"], ["v"],
                       delete_col="del").to_pandas()
    got = dict(zip(out.k, out.v))
    assert got == {1: 10, 2: 99, 4: 40}


def test_mad_by_group_exact(ray_session):
    from ci_log_processing_ray.ops.quantile import mad_by_group

    rows = ([{"g": "a", "x": v} for v in [1, 2, 3, 100]]
            + [{"g": "b", "x": 5}])
    out = mad_by_group(
        ray.data.from_items(rows).repartition(3), "g", "x").to_pandas()
    got = {r.g: (r.med, r.mad) for r in out.itertuples()}
    # percentile_disc(0.5) of [1,2,3,100] = 2; devs [1,0,1,98] -> 1
    assert got["a"] == (2, 1)
    assert got["b"] == (5, 0)


def test_twap_by_group_weights_and_boundaries(ray_session):
    import datetime as _dt
    from ci_log_processing_ray.ops.window import twap_by_group

    t0 = _dt.datetime(2024, 1, 1)
    rows = [
        {"u": 1, "ts": t0, "id": 0, "v": 100},
        {"u": 1, "ts": t0 + _dt.timedelta(seconds=1), "id": 1, "v": 300},
        {"u": 1, "ts": t0 + _dt.timedelta(seconds=4), "id": 2, "v": 999},
        {"u": 2, "ts": t0, "id": 3, "v": 7},     # single event: no weight
    ]
    out = twap_by_group(
        ray.data.from_items(rows).repartition(2), "u", "ts", "v",
        tie_col="id").to_pandas()
    got = {r.u: (r.n_intervals, r.sum_dt_us, r.sum_value_dt, r.twap)
           for r in out.itertuples()}
    # u1: 100 held 1s, 300 held 3s -> (100e6 + 900e6) / 4e6 = 250
    assert got[1] == (2, 4_000_000, 1_000_000_000, 250)
    assert got[2] == (0, 0, 0, 0)


def test_collocations_lift(ray_session):
    from ci_log_processing_ray.ops.textstats import collocations

    # "new york" always adjacent (high lift); "the cat" diluted
    rows = [{"t": "new york is big"}, {"t": "new york runs"},
            {"t": "the cat"}, {"t": "the dog"}, {"t": "cat the"}]
    out = collocations(
        ray.data.from_items(rows).repartition(3), "t",
        min_count=2).to_pandas()
    got = {(r.w1, r.w2): (r.n_xy, r.lift_permille)
           for r in out.itertuples()}
    # 13 tokens total; new=2, york=2, pair=2 -> 1000*2*13//4 = 6500
    assert got[("new", "york")] == (2, 6500)
    assert all(n >= 2 for n, _ in got.values())


def test_dataset_checksum_order_and_partition_invariant(ray_session):
    from ci_log_processing_ray.ops.profile import dataset_checksum

    rows = [{"k": i, "s": f"v{i}"} for i in range(100)]
    a = dataset_checksum(
        ray.data.from_items(rows).repartition(7), ["k", "s"])
    b = dataset_checksum(
        ray.data.from_items(list(reversed(rows))).repartition(2),
        ["k", "s"])
    assert a.to_pydict() == b.to_pydict()
    assert a["n_rows"][0].as_py() == 100
    c = dataset_checksum(
        ray.data.from_items(rows[:99]).repartition(3), ["k", "s"])
    assert c["checksum"][0].as_py() != a["checksum"][0].as_py()


def _bpe_reference(word_counts, n_merges):
    """Pure-Python Sennrich BPE for parity checking."""
    vocab = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for rank in range(n_merges):
        pairs = {}
        for syms, n in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, best[0], best[1], pairs[best]))
        new = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + n
        vocab = new
    return merges


def test_bpe_train_matches_reference(ray_session):
    import re as _re
    from collections import Counter
    from ci_log_processing_ray.ops.curation import bpe_train

    texts = ["lower lower lowest", "newer newest new",
             "wider wide wide", "low low low lower"]
    out = bpe_train(
        ray.data.from_items([{"t": s} for s in texts]).repartition(3),
        "t", n_merges=6).to_pandas()
    wc = Counter(w for s in texts
                 for w in _re.findall(r"[a-z0-9_]+", s.lower()))
    want = _bpe_reference(dict(wc), 6)
    got = [(r.rank, r.left, r.right, r.pair_count)
           for r in out.itertuples()]
    assert got == want


def test_cooccurrence_pairs_support_and_confidence(ray_session):
    from ci_log_processing_ray.ops.relational import cooccurrence_pairs

    rows = [{"u": 1, "i": "x"}, {"u": 1, "i": "y"}, {"u": 1, "i": "x"},
            {"u": 2, "i": "x"}, {"u": 2, "i": "y"},
            {"u": 3, "i": "x"},
            {"u": 4, "i": "z"}, {"u": 4, "i": "y"}]
    out = cooccurrence_pairs(
        ray.data.from_items(rows).repartition(3), "u", "i").to_pandas()
    got = {(r.a, r.b): (r.n_ab, r.n_a, r.n_b,
                        r.conf_ab_permille, r.conf_ba_permille)
           for r in out.itertuples()}
    # x: users {1,2,3}; y: {1,2,4}; z: {4}
    assert got[("x", "y")] == (2, 3, 3, 666, 666)
    assert got[("y", "z")] == (1, 3, 1, 333, 1000)
    assert ("x", "z") not in got
    # duplicate (u=1, x) rows counted once


def test_bfs_hops_shortest_distance(ray_session):
    from ci_log_processing_ray.ops.iterative import bfs_hops

    # path 1-2-3-4-5 plus shortcut 1-4, isolated 9-10
    edges = ray.data.from_items(
        [{"a": 1, "b": 2}, {"a": 2, "b": 3}, {"a": 3, "b": 4},
         {"a": 4, "b": 5}, {"a": 1, "b": 4},
         {"a": 9, "b": 10}]).repartition(2)
    seeds = ray.data.from_items([{"node": 1}])
    out = bfs_hops(edges, "a", "b", seeds, n_rounds=3).to_pandas()
    got = dict(zip(out.node, out.hops))
    # shortcut wins: 4 at hop 1, 5 at hop 2; 9/10 unreachable (absent)
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}


def test_transition_counts_boundaries(ray_session):
    import datetime as _dt
    from ci_log_processing_ray.ops.window import transition_counts

    t0 = _dt.datetime(2024, 1, 1)
    rows = [
        {"u": 1, "ts": t0, "id": 0, "s": "a"},
        {"u": 1, "ts": t0 + _dt.timedelta(seconds=1), "id": 1, "s": "b"},
        {"u": 1, "ts": t0 + _dt.timedelta(seconds=2), "id": 2, "s": "a"},
        {"u": 2, "ts": t0, "id": 3, "s": "b"},   # boundary: no 'a'->'b'
        {"u": 2, "ts": t0 + _dt.timedelta(seconds=5), "id": 4, "s": "b"},
        {"u": 3, "ts": t0, "id": 5, "s": "c"},   # singleton: nothing
    ]
    out = transition_counts(
        ray.data.from_items(rows).repartition(3), "u", "ts", "s",
        tie_col="id").to_pandas()
    got = {(r.from_state, r.to_state): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("b", "b"): 1}


def test_rank_global_ties_and_percentile(ray_session):
    from ci_log_processing_ray.ops.window import rank_global

    vals = [10, 20, 20, 30, 30, 30, 40, 5, 5, 100, 1000]
    rows = [{"id": i, "v": v} for i, v in enumerate(vals)]
    out = rank_global(
        ray.data.from_items(rows).repartition(4), "v",
        n_buckets=8).to_pandas().sort_values(["v", "id"])
    import pandas as _pd
    want = _pd.Series(vals).rank(method="min").astype(int)
    got = dict(zip(out.id, out["rank"]))
    assert got == {i: int(want[i]) for i in range(len(vals))}
    # percentile permille: rank 1 -> 0; max rank 11 -> 1000
    pp = dict(zip(out.id, out.pct_permille))
    assert pp[7] == 0 and pp[8] == 0      # the two 5s share rank 1
    assert pp[10] == 1000


def test_target_encode_loo_exact(ray_session):
    from ci_log_processing_ray.ops.groupagg import target_encode_loo

    rows = [{"id": 0, "g": "a", "x": 10}, {"id": 1, "g": "a", "x": 20},
            {"id": 2, "g": "a", "x": 30}, {"id": 3, "g": "b", "x": 7}]
    out = target_encode_loo(
        ray.data.from_items(rows).repartition(2),
        "g", "x").to_pandas().set_index("id")
    assert (out.loc[0, "loo_num"], out.loc[0, "loo_den"]) == (50, 2)
    assert (out.loc[1, "loo_num"], out.loc[1, "loo_den"]) == (40, 2)
    assert (out.loc[3, "loo_num"], out.loc[3, "loo_den"]) == (0, 0)


def test_kfold_assign_balance_and_determinism(ray_session):
    from ci_log_processing_ray.ops.curation import kfold_assign

    rows = [{"id": i, "s": "x" if i < 17 else "y"} for i in range(29)]
    a = kfold_assign(ray.data.from_items(rows).repartition(4),
                     "id", "s", 3).to_pandas()
    b = kfold_assign(ray.data.from_items(rows[::-1]).repartition(2),
                     "id", "s", 3).to_pandas()
    # deterministic under any partitioning/order
    assert dict(zip(a.id, a.fold)) == dict(zip(b.id, b.fold))
    # balanced within each stratum: sizes differ by <= 1
    for s, grp in a.groupby("s"):
        sizes = grp.groupby("fold").size()
        assert sizes.max() - sizes.min() <= 1
        assert set(grp.fold) <= {0, 1, 2}


def test_approx_quantiles_by_group_accuracy_and_merge(ray_session):
    import numpy as np
    from ci_log_processing_ray.ops.quantile import approx_quantiles_by_group

    rng = np.random.default_rng(7)
    rows = ([{"g": "a", "v": float(v)} for v in rng.uniform(1, 1000, 2000)]
            + [{"g": "b", "v": float(v)} for v in rng.uniform(5, 50, 500)])
    out = approx_quantiles_by_group(
        ray.data.from_items(rows).repartition(5), "g", "v",
        {"p50": 0.5, "p95": 0.95}, alpha=0.01).set_index("g")
    va = np.array([r["v"] for r in rows if r["g"] == "a"])
    vb = np.array([r["v"] for r in rows if r["g"] == "b"])
    for g, vals in (("a", va), ("b", vb)):
        for name, q in (("p50", 0.5), ("p95", 0.95)):
            true = np.quantile(vals, q)
            assert abs(out.loc[g, name] - true) / true < 0.03
    # partition invariance (mergeable partials)
    out2 = approx_quantiles_by_group(
        ray.data.from_items(rows[::-1]).repartition(2), "g", "v",
        {"p50": 0.5, "p95": 0.95}, alpha=0.01).set_index("g")
    assert out.round(9).equals(out2.round(9))


def test_take_until_budget_prefix_rule(ray_session):
    import hashlib
    from ci_log_processing_ray.ops.curation import take_until_budget

    rows = [{"id": i, "g": "s", "sz": 10} for i in range(10)]
    out = take_until_budget(
        ray.data.from_items(rows).repartition(3), "g", "id", "sz",
        35).to_pandas()
    # 35 // 10 -> exactly first 3 docs in md5(id) order survive
    order = sorted(range(10),
                   key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    assert sorted(out.id) == sorted(order[:3])
    # partition invariance
    out2 = take_until_budget(
        ray.data.from_items(rows[::-1]).repartition(5), "g", "id", "sz",
        35).to_pandas()
    assert sorted(out2.id) == sorted(out.id)


def test_union_by_name_schema_drift(ray_session):
    import pyarrow as _pa
    from ci_log_processing_ray.ops.reshape import union_by_name

    a = ray.data.from_items([{"k": 1, "old": "x"}])
    b = ray.data.from_items([{"k": 2, "new": 7}])
    out = union_by_name([a, b]).to_pandas().sort_values("k")
    assert list(out.columns) == ["k", "old", "new"]
    assert out.iloc[0].old == "x" and pd.isna(out.iloc[0].new)
    assert pd.isna(out.iloc[1].old) and out.iloc[1].new == 7
    # type disagreement fails loudly
    c = ray.data.from_items([{"k": "s"}])
    import pytest as _pytest
    with _pytest.raises(TypeError):
        union_by_name([a, c])


def test_compact_dir_preserves_rows(ray_session, tmp_path):
    import pyarrow as _pa
    import pyarrow.parquet as _pq
    from ci_log_processing_ray.state.compact import compact_dir

    src = tmp_path / "many"
    src.mkdir()
    for i in range(12):
        _pq.write_table(_pa.table({"x": list(range(i * 10, i * 10 + 10))}),
                        src / f"part-{i}.parquet")
    out = tmp_path / "compacted"
    rep = compact_dir(str(src), str(out), target_bytes=1 << 30)
    assert rep == {"n_rows": 120, "files_in": 12, "files_out": 1}
    back = _pq.read_table(sorted(map(str, out.glob("*.parquet")))[0])
    assert sorted(back["x"].to_pylist()) == list(range(120))
    assert (out / "_compacted").read_text().strip() == "120"


def test_dense_grid_counts_zero_fill(ray_session):
    import datetime as _dt
    from ci_log_processing_ray.ops.window import dense_grid_counts

    t0 = _dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        {"k": "a", "ts": t0},                                # hour 0
        {"k": "a", "ts": t0 + _dt.timedelta(hours=3)},       # hour 3
        {"k": "a", "ts": t0 + _dt.timedelta(hours=3, minutes=10)},
        {"k": "b", "ts": t0 + _dt.timedelta(hours=1)},       # hour 1
    ]
    out = dense_grid_counts(
        ray.data.from_items(rows).repartition(2), "k", "ts",
        n_buckets=4).to_pandas()
    got = {(r.k, r.window_start.hour): r.n for r in out.itertuples()}
    # 4 hours x 2 keys = 8 dense cells
    assert len(out) == 8
    assert got[("a", 0)] == 1 and got[("a", 1)] == 0
    assert got[("a", 2)] == 0 and got[("a", 3)] == 2
    assert got[("b", 1)] == 1 and got[("b", 0)] == 0


def test_funnel_steps_first_touch_chain(ray_session):
    import datetime as _dt
    from ci_log_processing_ray.ops.window import funnel_steps

    t0 = _dt.datetime(2024, 1, 1)
    m = _dt.timedelta(minutes=1)
    rows = [
        # u1 full chain A(0) -> B(1) -> C(2)
        {"u": 1, "ts": t0, "et": "A"},
        {"u": 1, "ts": t0 + m, "et": "B"},
        {"u": 1, "ts": t0 + 2 * m, "et": "C"},
        # u2: B before A -> chain stops at A
        {"u": 2, "ts": t0 + m, "et": "A"},
        {"u": 2, "ts": t0, "et": "B"},
        # u3: A then B outside window
        {"u": 3, "ts": t0, "et": "A"},
        {"u": 3, "ts": t0 + _dt.timedelta(hours=2), "et": "B"},
        # u4: first-touch trap -- first B is too EARLY a chain-breaker?
        # no: first B after A within window counts even if a later B
        # would also fit
        {"u": 4, "ts": t0, "et": "A"},
        {"u": 4, "ts": t0 + 2 * m, "et": "B"},
        {"u": 4, "ts": t0 + 3 * m, "et": "C"},
    ]
    out = funnel_steps(
        ray.data.from_items(rows).repartition(3), "u", "ts", "et",
        ["A", "B", "C"], window_us=30 * 60 * 1_000_000).to_pandas()
    got = dict(zip(out.step_name, out.n_keys))
    assert got == {"A": 4, "B": 2, "C": 2}


def test_auto_salted_join_planted_skew(ray_session):
    from ci_log_processing_ray.ops.relational import auto_salted_join

    # key 7 holds 60% of fact rows -> hot; others cold
    fact = ray.data.from_items(
        [{"k": 7, "src": i, "v": 1} for i in range(60)]
        + [{"k": i % 5, "src": 100 + i, "v": 1} for i in range(40)]
    ).repartition(4)
    dim = ray.data.from_items(
        [{"dk": k, "name": f"n{k}"} for k in [7, 0, 1, 2, 3, 4]])
    out = auto_salted_join(fact, dim, "k", "dk", "src",
                           hot_permille=100, n_salt=4,
                           num_partitions=2,
                           partition_budget_factor=1).to_pandas()
    # result equals the plain inner join: every fact row matched once
    assert len(out) == 100
    assert (out[out.k == 7].name == "n7").all()
    counts = out.groupby("k").size()
    assert counts[7] == 60
    # moderate skew under the partition budget: the fast path (plain
    # join, no salt machinery) must return the identical result
    out2 = auto_salted_join(fact, dim, "k", "dk", "src",
                            hot_permille=100, n_salt=4,
                            num_partitions=2).to_pandas()
    assert len(out2) == 100
    assert out2.groupby("k").size().to_dict() == counts.to_dict()


def test_kmeans_checkpoint_resume(ray_session, tmp_path):
    import numpy as np
    from ci_log_processing_ray.ops.iterative import kmeans

    rng = np.random.default_rng(3)
    blobs = np.concatenate([
        rng.normal(0, 0.1, (60, 4)),
        rng.normal(5, 0.1, (60, 4)),
        rng.normal(-5, 0.1, (60, 4))])
    rows = [{"v": list(map(float, b))} for b in blobs]
    ds = ray.data.from_items(rows).repartition(3)

    # uninterrupted reference
    ref_c, _ = kmeans(ds, "v", k=3, n_iter=4, tol=0.0)
    # interrupted: 2 rounds with checkpoints, then resume to 4
    ck = str(tmp_path / "ck")
    kmeans(ds, "v", k=3, n_iter=2, tol=0.0, checkpoint_dir=ck)
    import glob as _g
    assert len(_g.glob(ck + "/round-*.parquet")) == 2
    res_c, _ = kmeans(ds, "v", k=3, n_iter=4, tol=0.0,
                      checkpoint_dir=ck)
    assert np.allclose(sorted(map(tuple, ref_c)),
                       sorted(map(tuple, res_c)))


def test_morton2_matches_bit_reference():
    from ci_log_processing_ray.ops.layout import morton2

    def ref(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 16, 200)
    y = rng.integers(0, 1 << 16, 200)
    got = morton2(x, y)
    assert got.tolist() == [ref(int(a), int(b)) for a, b in zip(x, y)]


def test_zorder_sort_clusters_blocks(ray_session):
    from ci_log_processing_ray.ops.layout import morton2, zorder_sort

    rng = np.random.default_rng(4)
    df = pd.DataFrame({"x": rng.integers(0, 256, 4096),
                       "y": rng.integers(0, 256, 4096)})
    out = zorder_sort(ray.data.from_pandas(df).repartition(8),
                      "x", "y").to_pandas()
    z = out["zkey"].to_numpy()
    assert (np.diff(z) >= 0).all()
    assert sorted(z.tolist()) == sorted(
        morton2(df["x"].to_numpy(), df["y"].to_numpy()).tolist())
    # layout property: a z-contiguous eighth of the data spans a far
    # smaller (x, y) bounding box than the unclustered input
    eighth = out.iloc[: len(out) // 8]
    area = ((eighth["x"].max() - eighth["x"].min() + 1)
            * (eighth["y"].max() - eighth["y"].min() + 1))
    assert area <= 256 * 256 // 4


def test_containment_join_finds_substring_pairs(ray_session):
    """A short doc embedded verbatim in a much longer one: containment
    is 100% while Jaccard is diluted below threshold by the long side
    -- the two scorers must genuinely differ."""
    from ci_log_processing_ray.ops.dedup import ngram_jaccard_pairs

    short = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    rows = [
        {"doc_id": 1, "text": short},
        {"doc_id": 2, "text": filler + " " + short + " " + filler},
        {"doc_id": 3, "text": "zeta eta theta iota kappa"},
    ]
    ds = ray.data.from_items(rows).repartition(2)
    cont = ngram_jaccard_pairs(ds, "text", "doc_id", n=3,
                               threshold_pct=80,
                               score="containment").to_pandas()
    assert set(zip(cont.left_id, cont.right_id)) == {(1, 2)}
    assert (cont["inter"] == cont["min_sz"]).all()  # full containment
    jac = ngram_jaccard_pairs(ds, "text", "doc_id", n=3,
                              threshold_pct=80).to_pandas()
    assert len(jac) == 0  # jaccard at the same threshold sees nothing


def test_connected_components_hierarchical_matches_driver_path(ray_session):
    """Force the over-cap hierarchical closure (recursive CC on the
    contracted boundary graph + co-partitioned relabel) and check it
    returns exactly the driver-path answer on multi-block chains."""
    import numpy as np
    from ci_log_processing_ray.ops.iterative import connected_components

    rng = np.random.default_rng(5)
    rows = []
    for fam in range(12):  # 12 chains of 20 nodes, scrambled order
        base = fam * 100
        for i in range(19):
            rows.append({"s": base + i, "d": base + i + 1})
    rng.shuffle(rows)
    ds = ray.data.from_items(rows).repartition(8)
    want = connected_components(ds, "s", "d").to_pandas()
    got = connected_components(ds, "s", "d", boundary_cap=30,
                               n_buckets=8).to_pandas()
    w = want.sort_values("node").reset_index(drop=True)
    g = got.sort_values("node").reset_index(drop=True)
    assert (w["node"].to_numpy() == g["node"].to_numpy()).all()
    assert (w["component"].to_numpy() == g["component"].to_numpy()).all()
    assert (g["component"].to_numpy()
            == (g["node"].to_numpy() // 100) * 100).all()


def test_bfs_hops_fallback_matches_broadcast_path(ray_session):
    """Force the tagged-union co-partition fallback (frontier above the
    broadcast cap) and check it returns exactly the broadcast path's
    hop distances."""
    import numpy as np
    from ci_log_processing_ray.ops.iterative import bfs_hops

    rng = np.random.default_rng(9)
    rows = [{"a": int(rng.integers(0, 40)), "b": int(rng.integers(0, 40))}
            for _ in range(150)]
    edges = ray.data.from_items(rows).repartition(5)
    seeds = ray.data.from_items([{"node": 0}, {"node": 17}])
    want = bfs_hops(edges, "a", "b", seeds, n_rounds=3,
                    n_buckets=8).to_pandas()
    got = bfs_hops(edges, "a", "b", seeds, n_rounds=3, n_buckets=8,
                   broadcast_cap=0).to_pandas()
    w = dict(zip(want["node"], want["hops"]))
    g = dict(zip(got["node"], got["hops"]))
    assert w == g and len(w) > 2


def test_kmeans_distributed_combine_matches_driver_combine(ray_session):
    """Force the >combine_threshold distributed per-round groupby and
    check centroids match the driver-combine path exactly (both fold
    the same per-block partials; only the reduction route differs)."""
    import numpy as np
    from ci_log_processing_ray.ops.iterative import kmeans

    rng = np.random.default_rng(12)
    blobs = np.concatenate([rng.normal(c, 0.05, (40, 3))
                            for c in (0.0, 4.0, -4.0)])
    rows = [{"v": list(map(float, b))} for b in blobs]
    ds = ray.data.from_items(rows).repartition(6)
    c1, n1 = kmeans(ds, "v", k=3, n_iter=3, tol=0.0)
    c2, n2 = kmeans(ds, "v", k=3, n_iter=3, tol=0.0, combine_threshold=1)
    assert np.allclose(np.sort(c1, axis=0), np.sort(c2, axis=0))
    assert sorted(n1["count"]) == sorted(n2["count"])


def test_knn_graph_matches_numpy_across_blocks(ray_session):
    """Exact k-NN graph over 4 driver blocks == a single-machine
    quantized-int brute force with the (dot DESC, nn_id ASC)
    tie-break; block layout must not change the answer."""
    from ci_log_processing_ray.ops.similarity import knn_graph

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((120, 16)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()}
            for i in range(120)]
    got = (knn_graph(ray.data.from_items(rows), "embedding", "vec_id",
                     k=3, scale=128.0, block_rows=32)
           .to_pandas().sort_values(["vec_id", "rank"])
           .reset_index(drop=True))
    q = np.floor(vecs.astype(np.float64) * 128.0 + 0.5)
    d = (q @ q.T).astype(np.int64)
    np.fill_diagonal(d, np.iinfo(np.int64).min // 4)  # negation-safe
    want = []
    for i in range(120):
        order = np.lexsort((np.arange(120), -d[i]))[:3]
        want += [(i, r + 1, int(j), int(d[i, j]))
                 for r, j in enumerate(order)]
    wdf = pd.DataFrame(want, columns=["vec_id", "rank", "nn_id", "dot"])
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  wdf.astype("int64"))


def test_knn_graph_ivf_finds_planted_twins(ray_session):
    """Near-identical vectors share a home k-means cell by
    construction, so the IVF graph must rank each planted twin as its
    partner's top-1 -- the recall property semantic dedup relies on."""
    from ci_log_processing_ray.ops.similarity import knn_graph_ivf

    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    twins = {}
    for a, b in ((0, 100), (1, 101), (2, 102), (3, 103)):
        vecs[b] = vecs[a] + rng.standard_normal(16).astype(np.float32) * 1e-3
        twins[a], twins[b] = b, a
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()}
            for i in range(200)]
    got = (knn_graph_ivf(ray.data.from_items(rows), "embedding",
                         "vec_id", k=1, scale=128.0, n_centroids=8,
                         nprobe=2, seed=3)
           .to_pandas())
    top1 = dict(zip(got["vec_id"], got["nn_id"]))
    for a, b in twins.items():
        assert top1[a] == b, (a, top1.get(a), b)
    # every vector got at least one neighbor (full cell coverage)
    assert len(top1) == 200


def test_grouped_auc_matches_bruteforce_with_ties(ray_session):
    """Planted heavy score ties across blocks: the rank-sum rational
    must equal the O(n^2) pair count (win=2, tie=1) exactly."""
    from ci_log_processing_ray.ops.groupagg import grouped_auc

    rng = np.random.default_rng(7)
    n = 600
    df = pd.DataFrame({
        "grp": rng.choice(["a", "b", "c"], n),
        "label": rng.integers(0, 2, n).astype(np.int64),
        # only 8 distinct scores -> massive tie groups
        "score": rng.integers(0, 8, n).astype(np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(5)
    got = grouped_auc(ds, "grp", "label", "score").to_pandas()
    got = got.sort_values("grp").reset_index(drop=True)

    for _, row in got.iterrows():
        sub = df[df["grp"] == row["grp"]]
        pos = sub[sub["label"] == 1]["score"].to_numpy()
        neg = sub[sub["label"] == 0]["score"].to_numpy()
        two_u = int(2 * (pos[:, None] > neg[None, :]).sum()
                    + (pos[:, None] == neg[None, :]).sum())
        assert int(row["auc_num"]) == two_u
        assert int(row["auc_den"]) == 2 * len(pos) * len(neg)
        assert int(row["n_pos"]) == len(pos)
        assert int(row["n_neg"]) == len(neg)


def test_grouped_cusum_first_day_tiebreak(ray_session):
    """A symmetric step series peaks |dev| on two days; the op must
    report the EARLIER one."""
    from ci_log_processing_ray.ops.groupagg import grouped_cusum_peak

    # counts per day: 2,2,4,4 -> S=12, n=4; dev_k = 4*cum - k*12:
    # k=1: 8-12=-4; k=2: 16-24=-8; k=3: 32-36=-4; k=4: 48-48=0
    # unique peak 8 at day 2.  Add a second group with a genuine tie:
    # 1,3,3,1 -> S=8, n=4; dev: 4-8=-4; 16-16=0; 28-24=4; 32-32=0
    # |dev| peaks 4 at k=1 AND k=3 -> must pick day0+0.
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for d, cnt in enumerate([2, 2, 4, 4]):
        rows += [("step", base + datetime.timedelta(days=d))] * cnt
    for d, cnt in enumerate([1, 3, 3, 1]):
        rows += [("tie", base + datetime.timedelta(days=d))] * cnt
    df = pd.DataFrame(rows, columns=["grp", "ts"])
    ds = ray.data.from_pandas(df.sample(frac=1.0, random_state=3)
                              ).repartition(4)
    got = (grouped_cusum_peak(ds, "grp", "ts").to_pandas()
           .set_index("grp"))
    day0 = (base.date() - datetime.date(1970, 1, 1)).days
    assert int(got.loc["step", "max_dev"]) == 8
    assert int(got.loc["step", "peak_day"]) == day0 + 1
    assert int(got.loc["tie", "max_dev"]) == 4
    assert int(got.loc["tie", "peak_day"]) == day0
    assert int(got.loc["step", "total"]) == 12


def test_grouped_trend_slope_exact_line(ray_session):
    """Counts lying exactly on y = 3x + 2 (with a gap day) must give
    slope_num/slope_den == 3 exactly; a flat group gives 0."""
    from ci_log_processing_ray.ops.groupagg import grouped_trend_slope

    base = datetime.datetime(2024, 5, 1)
    rows = []
    for x in [0, 1, 2, 4, 7]:  # irregular observed days
        rows += [("lin", base + datetime.timedelta(days=x))] * (3 * x + 2)
    for x in range(4):
        rows += [("flat", base + datetime.timedelta(days=x))] * 5
    df = pd.DataFrame(rows, columns=["grp", "ts"])
    ds = ray.data.from_pandas(df.sample(frac=1.0, random_state=9)
                              ).repartition(3)
    got = (grouped_trend_slope(ds, "grp", "ts").to_pandas()
           .set_index("grp"))
    assert int(got.loc["lin", "slope_num"]) == \
        3 * int(got.loc["lin", "slope_den"])
    assert int(got.loc["lin", "slope_den"]) > 0
    assert int(got.loc["lin", "n_days"]) == 5
    assert int(got.loc["flat", "slope_num"]) == 0


def test_max_duplicate_span_paths_agree(ray_session):
    """Planted shared substrings: the broadcast and shuffle membership
    plans must emit identical per-doc spans, including zeros."""
    from ci_log_processing_ray.ops.dedup import max_duplicate_span

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 words
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            f"one two {shared} three four",          # span 7
            f"nine ten {shared} eleven twelve",      # span 7
            "totally unique words only here friend",  # 0
            "short doc",                              # < n words -> 0
            f"{shared} {shared}",                     # overlapping: 14
            f"{shared} {shared}",                     # same text: 14
        ],
    })
    ds = ray.data.from_pandas(docs).repartition(3)
    b = (max_duplicate_span(ds, "text", "doc_id", n=5, mode="broadcast")
         .to_pandas().sort_values("id").reset_index(drop=True))
    s = (max_duplicate_span(ds, "text", "doc_id", n=5, mode="shuffle")
         .to_pandas().sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(b, s)
    spans = dict(zip(b["id"], b["max_dup_span"]))
    assert spans[2] == 0 and spans[3] == 0
    assert spans[0] == 7 and spans[1] == 7
    assert spans[4] == 14 and spans[5] == 14


def test_rolling_active_users_gap_and_merge(ray_session):
    """A user gap longer than the window must drop WAU to zero on the
    uncovered grid days, and back-to-back activity must merge into one
    coverage interval (no double count)."""
    from ci_log_processing_ray.ops.window import rolling_active_users

    base = datetime.datetime(2024, 3, 1)
    rows = [
        (1, base),                                  # day 0
        (1, base + datetime.timedelta(days=1)),     # merges with day 0
        (2, base),                                  # day 0
        (1, base + datetime.timedelta(days=20)),    # isolated late run
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    out = rolling_active_users(
        ray.data.from_pandas(df).repartition(2), "user_id", "ts",
        window_days=3).set_index("day")
    day0 = (base.date() - datetime.date(1970, 1, 1)).days
    assert len(out) == 21                      # grid day0..day20
    assert out.loc[day0, "wau"] == 2           # both users
    assert out.loc[day0 + 2, "wau"] == 2       # day0 still in reach
    assert out.loc[day0 + 3, "wau"] == 1       # only user 1's day1
    assert out.loc[day0 + 4, "wau"] == 0       # gap
    assert out.loc[day0 + 19, "wau"] == 0
    assert out.loc[day0 + 20, "wau"] == 1      # late run
    assert int(out["wau"].min()) == 0


def test_max_duplicate_span_all_clean_both_paths(ray_session):
    """A corpus with NO duplicated grams must report all zeros in both
    membership plans (the shuffle path's empty-result edge)."""
    from ci_log_processing_ray.ops.dedup import max_duplicate_span

    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["aa bb cc dd ee ff gg",
                 "hh ii jj kk ll mm nn",
                 "oo pp qq rr ss tt uu"],
    })
    ds = ray.data.from_pandas(docs).repartition(2)
    for mode in ["broadcast", "shuffle"]:
        out = max_duplicate_span(ds, "text", "doc_id", n=5,
                                 mode=mode).to_pandas()
        assert len(out) == 3 and (out["max_dup_span"] == 0).all(), mode


def test_label_propagation_planted_communities(ray_session):
    """Two 8-cliques joined by ONE bridge edge: LPA must converge to
    one label per clique (different across cliques) despite the
    bridge, identically on the broadcast and co-partition paths, and
    deterministically across runs."""
    from ci_log_processing_ray.ops.iterative import label_propagation

    def clique(base):
        return [(base + i, base + j)
                for i in range(8) for j in range(i + 1, 8)]

    edges = pd.DataFrame(clique(0) + clique(100) + [(7, 100)],
                         columns=["src", "dst"])
    ds = ray.data.from_pandas(edges).repartition(3)

    outs = []
    for cap in [5_000_000, 1]:  # broadcast path, then forced co-partition
        out = (label_propagation(ds, "src", "dst", n_rounds=6,
                                 broadcast_cap=cap)
               .to_pandas().sort_values("node").reset_index(drop=True))
        assert len(out) == 16
        a = out[out["node"] < 100]["label"].unique()
        b = out[out["node"] >= 100]["label"].unique()
        assert len(a) == 1 and len(b) == 1 and a[0] != b[0], cap
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    rerun = (label_propagation(ds, "src", "dst", n_rounds=6)
             .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], rerun)


def test_label_propagation_resident_parity(ray_session):
    """The partition-resident (Pregel-shape) LPA must produce labels
    identical to the dataset-native implementation on the planted
    cliques AND on a random graph, across shard counts."""
    from ci_log_processing_ray.ops.iterative import (
        label_propagation, label_propagation_resident)

    def clique(base):
        return [(base + i, base + j)
                for i in range(8) for j in range(i + 1, 8)]

    rng = np.random.default_rng(11)
    rand = list(zip(rng.integers(0, 40, 120).tolist(),
                    rng.integers(0, 40, 120).tolist()))
    rand = [(a, b) for a, b in rand if a != b]

    for edges_list in [clique(0) + clique(100) + [(7, 100)], rand]:
        edges = pd.DataFrame(edges_list, columns=["src", "dst"])
        ds = ray.data.from_pandas(edges).repartition(3)
        want = (label_propagation(ds, "src", "dst", n_rounds=5)
                .to_pandas().sort_values("node").reset_index(drop=True)
                .astype({"node": np.int64, "label": np.int64}))
        for n_shards in [2, 5]:
            got = label_propagation_resident(
                ds, "src", "dst", n_rounds=5, n_shards=n_shards
            ).astype({"node": np.int64, "label": np.int64})
            pd.testing.assert_frame_equal(got, want), n_shards


def test_bfs_hops_resident_parity(ray_session):
    """The partition-resident BFS must match bfs_hops exactly on a
    random graph, a chain, and with an isolated seed, across shard
    counts."""
    from ci_log_processing_ray.ops.iterative import (bfs_hops,
                                                     bfs_hops_resident)

    rng = np.random.default_rng(23)
    rand = [(a, b) for a, b in zip(rng.integers(0, 30, 90).tolist(),
                                   rng.integers(0, 30, 90).tolist())
            if a != b]
    chain = [(i, i + 1) for i in range(12)]

    for edges_list, seed_nodes in [
            (rand, [0, 999]),          # 999 is isolated (no edges)
            (chain, [0]),
            (chain, [5, 11])]:
        edges = pd.DataFrame(edges_list, columns=["src", "dst"])
        ds = ray.data.from_pandas(edges).repartition(3)
        seeds = ray.data.from_items(
            [{"node": n} for n in seed_nodes])
        want = (bfs_hops(ds, "src", "dst", seeds, n_rounds=4)
                .to_pandas().sort_values("node").reset_index(drop=True)
                .astype({"node": np.int64, "hops": np.int64}))
        for n_shards in [2, 4]:
            got = bfs_hops_resident(
                ds, "src", "dst", seeds, n_rounds=4,
                n_shards=n_shards
            ).astype({"node": np.int64, "hops": np.int64})
            pd.testing.assert_frame_equal(got, want)


def test_pagerank_resident_parity(ray_session):
    """Sharded-rank PageRank must be bit-identical to the fixed-point
    broadcast implementation, including dangling nodes and
    multi-edges, across shard counts."""
    from ci_log_processing_ray.ops.iterative import (pagerank_fixedpoint,
                                                     pagerank_resident)

    rng = np.random.default_rng(31)
    e = [(a, b) for a, b in zip(rng.integers(0, 25, 80).tolist(),
                                rng.integers(0, 30, 80).tolist())
         if a != b]
    e += e[:7]  # planted multi-edges; dsts 25..29 are dangling
    edges = pd.DataFrame(e, columns=["src", "dst"])
    ds = ray.data.from_pandas(edges).repartition(3)
    want = (pagerank_fixedpoint(ds, "src", "dst", n_iter=3)
            .to_pandas().sort_values("node").reset_index(drop=True)
            .astype({"node": np.int64, "rank_fp": np.int64}))
    for n_shards in [2, 5]:
        got = pagerank_resident(
            ds, "src", "dst", n_iter=3, n_shards=n_shards
        ).astype({"node": np.int64, "rank_fp": np.int64})
        pd.testing.assert_frame_equal(got, want)


def _peel_core_numbers(pairs):
    """Reference k-core decomposition by textbook min-degree peeling
    (heap-based; treats input as an undirected simple graph, dropping
    self-loops and parallel edges)."""
    import collections
    import heapq

    adj = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    cur = {n: len(s) for n, s in adj.items()}
    heap = [(d, n) for n, d in cur.items()]
    heapq.heapify(heap)
    core, removed, k = {}, set(), 0
    while heap:
        d, n = heapq.heappop(heap)
        if n in removed or d != cur[n]:
            continue
        k = max(k, d)
        core[n] = k
        removed.add(n)
        for m in adj[n]:
            if m not in removed:
                cur[m] -= 1
                heapq.heappush(heap, (cur[m], m))
    return core


def test_kcore_resident_matches_peeling(ray_session):
    """The h-index fixpoint must equal textbook peeling coreness on
    random multigraphs (duplicate edges, both orientations, self-loops)
    across shard counts."""
    from ci_log_processing_ray.ops.iterative import kcore_resident

    rng = np.random.default_rng(41)
    for n_nodes, n_edges in [(40, 100), (150, 600), (200, 150)]:
        u = rng.integers(0, n_nodes, n_edges)
        v = rng.integers(0, n_nodes, n_edges)
        # duplicates, reversed duplicates, and self-loops on purpose
        u2 = np.r_[u, v[:15], np.arange(4)]
        v2 = np.r_[v, u[:15], np.arange(4)]
        ds = ray.data.from_pandas(
            pd.DataFrame({"src": u2, "dst": v2})).repartition(3)
        want = _peel_core_numbers(zip(u2.tolist(), v2.tolist()))
        for n_shards in [2, 5]:
            got = kcore_resident(ds, "src", "dst", n_shards=n_shards)
            gd = dict(zip(got["node"].tolist(), got["core"].tolist()))
            assert gd == want, (n_nodes, n_shards)


def test_kcore_resident_closed_forms(ray_session):
    """Known corenesses: a clique K_n is (n-1)-core everywhere, a chain
    is 1-core, a star is 1-core, and a path power P^p is p-core."""
    from ci_log_processing_ray.ops.iterative import kcore_resident

    clique = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    chain = [(i, i + 1) for i in range(10, 25)]
    star = [(100, 100 + i) for i in range(1, 9)]
    power3 = [(200 + i, 200 + i + j)
              for i in range(12) for j in (1, 2, 3) if i + j < 13]
    edges = pd.DataFrame(clique + chain + star + power3,
                         columns=["src", "dst"])
    ds = ray.data.from_pandas(edges).repartition(2)
    got = kcore_resident(ds, "src", "dst", n_shards=3)
    gd = dict(zip(got["node"].tolist(), got["core"].tolist()))
    assert all(gd[n] == 5 for n in range(6))
    assert all(gd[n] == 1 for n in range(10, 26))
    assert all(gd[100 + i] == 1 for i in range(9))
    assert all(gd[200 + i] == 3 for i in range(13))


def test_clustering_coefficients_closed_forms(ray_session):
    """Known coefficients: a triangle is 1000 permille everywhere, a
    clique K_5 is 1000, a star center is 0 (leaves deg 1 -> 0), and a
    square-with-one-diagonal splits 333 / 1000 by corner; parallel
    edges, both orientations, and self-loops must not change counts."""
    from ci_log_processing_ray.ops.relational import (
        clustering_coefficients)

    tri = [(0, 1), (1, 2), (2, 0)]
    k5 = [(10 + i, 10 + j) for i in range(5) for j in range(i + 1, 5)]
    star = [(100, 100 + i) for i in range(1, 6)]
    # square 200-201-202-203 with diagonal 200-202
    sq = [(200, 201), (201, 202), (202, 203), (203, 200), (200, 202)]
    noise = [(1, 0), (0, 1), (5, 5), (201, 200)]  # dup/reverse/self
    edges = pd.DataFrame(tri + k5 + star + sq + noise,
                         columns=["src", "dst"])
    ds = ray.data.from_pandas(edges).repartition(3)
    got = (clustering_coefficients(ds, "src", "dst", n_buckets=7)
           .to_pandas().set_index("node"))
    for n in (0, 1, 2):
        assert got.loc[n, "deg"] == 2 and got.loc[n, "tri"] == 1
        assert got.loc[n, "coeff_permille"] == 1000
    for i in range(5):
        assert got.loc[10 + i, "deg"] == 4
        assert got.loc[10 + i, "tri"] == 6
        assert got.loc[10 + i, "coeff_permille"] == 1000
    assert got.loc[100, "deg"] == 5 and got.loc[100, "tri"] == 0
    assert got.loc[100, "coeff_permille"] == 0
    for i in range(1, 6):
        assert got.loc[100 + i, "deg"] == 1
        assert got.loc[100 + i, "coeff_permille"] == 0
    # diagonal endpoints: deg 3, 1 triangle each of the two -> 2 tri?
    # node 200 neighbors {201, 202, 203}: edges (201,202),(202,203)
    # -> tri=2, coeff = 2000*2 // 6 = 666
    assert got.loc[200, "deg"] == 3 and got.loc[200, "tri"] == 2
    assert got.loc[200, "coeff_permille"] == 666
    # node 201 neighbors {200, 202}: edge (200,202) -> tri=1, 1000
    assert got.loc[201, "deg"] == 2 and got.loc[201, "tri"] == 1
    assert got.loc[201, "coeff_permille"] == 1000
    # node 5 had only a self-loop: absent entirely
    assert 5 not in got.index


def test_kcore_resident_warns_at_round_cap(ray_session):
    """A max_rounds cap below the peeling depth must warn (returned
    estimates are only upper bounds), and a sufficient cap must not."""
    import warnings

    from ci_log_processing_ray.ops.iterative import kcore_resident

    chain = pd.DataFrame([(i, i + 1) for i in range(30)],
                         columns=["src", "dst"])
    ds = ray.data.from_pandas(chain).repartition(2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        kcore_resident(ds, "src", "dst", max_rounds=3, n_shards=2)
        assert any("upper bounds" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = kcore_resident(ds, "src", "dst", max_rounds=40, n_shards=2)
        assert not any("upper bounds" in str(x.message) for x in w)
    assert (got["core"] == 1).all()


def test_sssp_weighted_resident_matches_bellman_ford(ray_session):
    """Frontier-only relaxation must equal the relax-from-everyone
    k-round Bellman-Ford recurrence on random weighted digraphs, for
    several hop bounds and shard counts, with an isolated seed."""
    from ci_log_processing_ray.ops.iterative import sssp_weighted_resident

    def local_bf(triples, seed_nodes, k):
        dist = {s: 0 for s in seed_nodes}
        for _ in range(k):
            new = dict(dist)
            for a, b, w in triples:
                if a in dist and dist[a] + w < new.get(b, 1 << 62):
                    new[b] = dist[a] + w
            if new == dist:
                break
            dist = new
        return dist

    rng = np.random.default_rng(3)
    for n, m in [(30, 90), (80, 300)]:
        a = rng.integers(0, n, m)
        b = rng.integers(0, n, m)
        w = rng.integers(0, 20, m).astype(np.int64)
        seed_nodes = sorted(set(rng.integers(0, n, 3).tolist()) | {999})
        ds = ray.data.from_pandas(
            pd.DataFrame({"s": a, "d": b, "w": w})).repartition(3)
        sd = ray.data.from_items([{"node": int(s)} for s in seed_nodes])
        triples = list(zip(a.tolist(), b.tolist(), w.tolist()))
        for k in (1, 3, 6):
            want = local_bf(triples, seed_nodes, k)
            for n_shards in (2, 4):
                got = sssp_weighted_resident(
                    ds, "s", "d", "w", sd, n_rounds=k,
                    n_shards=n_shards)
                gd = dict(zip(got["node"].tolist(),
                              got["dist"].tolist()))
                assert gd == want, (n, k, n_shards)


def test_sorted_neighborhood_pairs_exact(ray_session):
    """Every within-window pair exactly once, across span boundaries:
    brute-force reference over a shuffled key table, several windows."""
    from ci_log_processing_ray.ops.dedup import sorted_neighborhood_pairs

    rng = np.random.default_rng(17)
    n = 600  # > 2 spans at window=4 (span=256)
    keys = rng.integers(0, 200, n).astype(np.int64)
    ids = rng.permutation(n).astype(np.int64)
    df = pd.DataFrame({"k": keys, "i": ids})
    order = df.sort_values(["k", "i"]).reset_index(drop=True)
    ds = ray.data.from_pandas(df).repartition(4)
    for w in (2, 4, 7):
        want = set()
        for d in range(1, w):
            for p in range(n - d):
                want.add((int(order["i"][p]), int(order["i"][p + d])))
        got = (sorted_neighborhood_pairs(ds, "k", "i", window=w)
               .to_pandas())
        pairs = set(zip(got["id_a"].tolist(), got["id_b"].tolist()))
        assert len(got) == len(pairs), "duplicated pair"
        assert pairs == want, (w, len(pairs), len(want))
        # key_gap is non-negative and matches the key difference
        kd = dict(zip(df["i"], df["k"]))
        for a, b, g in zip(got["id_a"], got["id_b"], got["key_gap"]):
            assert g == kd[b] - kd[a] >= 0


def test_common_neighbors_link_prediction(ray_session):
    """Closed forms: in a 5-path a-b-c-d-e, (a,c)/(b,d)/(c,e) share 1
    neighbor; in K_4 minus one edge, the missing pair shares 2; a full
    clique yields NOTHING (all pairs adjacent); dup/self-loop noise
    must not change counts."""
    from ci_log_processing_ray.ops.relational import (
        common_neighbors_link_prediction)

    path = [(0, 1), (1, 2), (2, 3), (3, 4)]
    # K4 on 10..13 minus the (12, 13) edge
    k4m = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13)]
    k5 = [(20 + i, 20 + j) for i in range(5) for j in range(i + 1, 5)]
    noise = [(1, 0), (2, 2), (12, 10)]
    edges = pd.DataFrame(path + k4m + k5 + noise,
                         columns=["src", "dst"])
    ds = ray.data.from_pandas(edges).repartition(3)

    got = (common_neighbors_link_prediction(ds, "src", "dst",
                                            min_common=1, n_buckets=5)
           .to_pandas())
    d = {(a, b): n for a, b, n in zip(got["node_a"], got["node_b"],
                                      got["n_common"])}
    assert d[(0, 2)] == 1 and d[(1, 3)] == 1 and d[(2, 4)] == 1
    assert (0, 3) not in d  # 0-3 share nobody
    assert d[(12, 13)] == 2
    # no K5 pair appears (all adjacent), no adjacent pair anywhere
    eset = {(min(a, b), max(a, b)) for a, b in path + k4m + k5}
    assert not (set(d) & eset)
    assert not any(20 <= a < 25 for a, _ in d)

    got2 = (common_neighbors_link_prediction(ds, "src", "dst",
                                             min_common=2, n_buckets=3)
            .to_pandas())
    d2 = {(a, b): n for a, b, n in zip(got2["node_a"], got2["node_b"],
                                       got2["n_common"])}
    assert d2 == {(12, 13): 2}


def test_deterministic_random_walks(ray_session):
    """Walk invariants on a known graph: every consecutive (node,
    next) pair is an edge, step-0 node == start, one walk per node,
    dead ends impossible on a bidirectional graph, and the whole table
    is reproducible run-to-run and across bucket counts."""
    from ci_log_processing_ray.ops.iterative import (
        deterministic_random_walks)

    rng = np.random.default_rng(9)
    a = rng.integers(0, 25, 60)
    b = rng.integers(0, 25, 60)
    keep = a != b
    edges = pd.DataFrame({"src": a[keep], "dst": b[keep]})
    ds = ray.data.from_pandas(edges).repartition(3)
    adj = set()
    for x, y in zip(edges["src"], edges["dst"]):
        adj.add((int(x), int(y)))
        adj.add((int(y), int(x)))
    nodes = {n for p in adj for n in p}

    w1 = (deterministic_random_walks(ds, "src", "dst", walk_len=4,
                                     n_buckets=5)
          .to_pandas().sort_values(["start", "step"])
          .reset_index(drop=True))
    w2 = (deterministic_random_walks(ds, "src", "dst", walk_len=4,
                                     n_buckets=3)
          .to_pandas().sort_values(["start", "step"])
          .reset_index(drop=True))
    pd.testing.assert_frame_equal(w1, w2)

    assert set(w1[w1["step"] == 0]["start"]) == nodes
    for s, g in w1.groupby("start"):
        g = g.sort_values("step")
        assert g["step"].tolist() == [0, 1, 2, 3, 4]
        path = g["node"].tolist()
        assert path[0] == s
        for i in range(4):
            assert (path[i], path[i + 1]) in adj


def test_decayed_sum_by_group(ray_session):
    """Hand-computed decay: with half_life_days=1, rows 0/1/2 days old
    weigh cents, cents>>1, cents>>2; negatives raise."""
    from ci_log_processing_ray.ops.groupagg import decayed_sum_by_group

    day = 86_400_000_000
    df = pd.DataFrame({
        "g": ["a", "a", "a", "b"],
        "ts": np.array([2 * day, 1 * day, 0, 2 * day], np.int64),
        "cents": np.array([100, 101, 103, 7], np.int64)})
    ds = ray.data.from_pandas(df).repartition(2)
    got = (decayed_sum_by_group(ds, "g", "ts", "cents",
                                half_life_days=1)
           .to_pandas().sort_values("g").reset_index(drop=True))
    assert got["decayed_cents"].tolist() == [100 + 50 + 25, 7]
    assert got["n"].tolist() == [3, 1]

    bad = ray.data.from_pandas(pd.DataFrame({
        "g": ["a"], "ts": np.array([0], np.int64),
        "cents": np.array([-1], np.int64)}))
    import pytest as _pytest

    with _pytest.raises(Exception):
        decayed_sum_by_group(bad, "g", "ts", "cents",
                             half_life_days=1).to_pandas()


def test_running_distinct_by_group(ray_session):
    """Hand-checked novelty curve with interleaved groups and ties
    broken by id."""
    from ci_log_processing_ray.ops.window import running_distinct_by_group

    df = pd.DataFrame({
        "u": [1, 1, 1, 1, 2, 2, 2],
        "ts": np.array([10, 20, 20, 30, 10, 10, 40], np.int64),
        "i": np.array([1, 2, 3, 4, 5, 6, 7], np.int64),
        "v": ["a", "a", "b", "a", "x", "x", "y"]})
    ds = ray.data.from_pandas(df).repartition(3)
    got = (running_distinct_by_group(ds, "u", ["ts", "i"], "v", "i",
                                     n_buckets=4)
           .to_pandas().sort_values("i").reset_index(drop=True))
    assert got["running_distinct"].tolist() == [1, 1, 2, 2, 1, 1, 2]


def test_personalized_pagerank(ray_session):
    """PPR sanity: mass concentrates near seeds -- on two disjoint
    stars, seeding only star A gives every star-B node rank 0; seeds
    absent from the edges raise."""
    from ci_log_processing_ray.ops.iterative import (
        personalized_pagerank_fixedpoint)

    star_a = [(0, i) for i in range(1, 6)]
    star_b = [(100, 100 + i) for i in range(1, 6)]
    edges = pd.DataFrame(star_a + star_b, columns=["src", "dst"])
    ds = ray.data.from_pandas(edges).repartition(2)
    seeds = ray.data.from_items([{"node": 0}])
    got = (personalized_pagerank_fixedpoint(ds, "src", "dst", seeds,
                                            n_iter=3)
           .to_pandas().set_index("node")["rank_fp"])
    scale = 10 ** 12
    assert got[0] == (15 * scale) // 100  # teleport only (no in-edges)
    assert all(got[i] > 0 for i in range(1, 6))
    assert all(got[100 + i] == 0 for i in range(0, 6))

    import pytest as _pytest

    with _pytest.raises(Exception):
        personalized_pagerank_fixedpoint(
            ds, "src", "dst", ray.data.from_items([{"node": 777}]),
            n_iter=1)


def test_sequential_pair_support(ray_session):
    """Hand-checked supports incl. the t1==t2 (>=2 occurrences) rule
    and the strict-order tie-break by id."""
    from ci_log_processing_ray.ops.groupagg import sequential_pair_support

    df = pd.DataFrame({
        "u": [1, 1, 1, 2, 2, 3, 3],
        "ts": np.array([1, 2, 3, 5, 5, 7, 8], np.int64),
        "i": np.array([1, 2, 3, 4, 5, 6, 7], np.int64),
        "t": ["a", "b", "a", "b", "a", "a", "a"]})
    ds = ray.data.from_pandas(df).repartition(3)
    got = (sequential_pair_support(ds, "u", ["ts", "i"], "t")
           .to_pandas().set_index(["t1", "t2"])["support"].to_dict())
    # u1: a,b,a -> (a,b),(b,a),(a,a); u2 ties broken by id: b then a
    # -> (b,a); u3: a,a -> (a,a)
    assert got == {("a", "b"): 1, ("b", "a"): 2, ("a", "a"): 2}


def test_neighbor_feature_agg(ray_session):
    """Hand-checked hop-1/hop-2 on a tiny DAG with a diamond: path
    multiset semantics mean the diamond's sink counts BOTH length-2
    paths."""
    from ci_log_processing_ray.ops.iterative import neighbor_feature_agg

    # 0 -> 1 -> 3, 0 -> 2 -> 3 (diamond), plus 3 -> 4
    edges = pd.DataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)],
        columns=["src", "dst"])
    feats = pd.DataFrame({"node": [0, 1, 2, 3, 4],
                          "f": np.array([10, 20, 30, 40, 50],
                                        np.int64)})
    got = (neighbor_feature_agg(
        ray.data.from_pandas(edges).repartition(2), "src", "dst",
        ray.data.from_pandas(feats).repartition(2), "node", "f",
        n_buckets=3).to_pandas().set_index("node"))
    # h1: 1<-{0}=10, 2<-{0}=10, 3<-{1,2}=50, 4<-{3}=40
    assert got.loc[1, "h1_sum"] == 10 and got.loc[1, "h1_n"] == 1
    assert got.loc[3, "h1_sum"] == 50 and got.loc[3, "h1_n"] == 2
    assert got.loc[4, "h1_sum"] == 40 and got.loc[4, "h1_n"] == 1
    # h2: 3 <- paths 0-1-3 and 0-2-3 = f(0)*2 = 20, n=2
    assert got.loc[3, "h2_sum"] == 20 and got.loc[3, "h2_n"] == 2
    # 4 <- paths 1-3-4 and 2-3-4 = f(1)+f(2) = 50, n=2
    assert got.loc[4, "h2_sum"] == 50 and got.loc[4, "h2_n"] == 2
    # 1 and 2 have no length-2 in-paths
    assert got.loc[1, "h2_n"] == 0 and got.loc[2, "h2_n"] == 0


def test_knn_label_agreement(ray_session):
    """Planted noisy label: two tight clusters; the mislabeled vector
    gets agree=0 while clean vectors only lose agreement to it."""
    from ci_log_processing_ray.ops.similarity import knn_label_agreement

    rng = np.random.default_rng(7)
    a = rng.normal(0, 0.01, (4, 8)) + np.array([1.0] + [0.0] * 7)
    b = rng.normal(0, 0.01, (4, 8)) + np.array([0.0, 1.0] + [0.0] * 6)
    vecs = np.vstack([a, b]).astype(np.float32)
    # vec 7 sits in cluster B but carries label 0 (noisy)
    labels = np.array([0, 0, 0, 0, 1, 1, 1, 0], np.int64)
    df = pd.DataFrame({"vec_id": np.arange(8, dtype=np.int64),
                       "embedding": list(vecs),
                       "label": labels})
    got = (knn_label_agreement(
        ray.data.from_pandas(df).repartition(3), "embedding", "vec_id",
        "label", k=3, block_rows=3, n_buckets=3)
        .to_pandas().set_index("vec_id").sort_index())
    assert (got["k_n"] == 3).all()
    # noisy vec 7: its 3 NNs are all cluster B (label 1) -> 0 agreement
    assert got.loc[7, "k_agree"] == 0
    assert got.loc[7, "agree_permille"] == 0
    # clean cluster-A vectors agree with all 3 of their A neighbors
    for i in range(4):
        assert got.loc[i, "k_agree"] == 3
        assert got.loc[i, "agree_permille"] == 1000
    # cluster-B vectors: 2 clean B neighbors agree, vec 7 disagrees
    for i in range(4, 7):
        assert got.loc[i, "k_agree"] == 2
        assert got.loc[i, "agree_permille"] == 666


def test_bm25_top_terms(ray_session):
    """BM25 semantics the tfidf score lacks: equal tf scores HIGHER in
    the shorter doc (length normalization), and tf saturates."""
    from ci_log_processing_ray.ops.textstats import bm25_top_terms

    docs = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["apple banana",                       # short, tf=1
                 "apple banana cherry cherry cherry "
                 "cherry cherry cherry cherry cherry",  # long, tf=1
                 "plum plum plum plum"]})
    got = bm25_top_terms(
        ray.data.from_pandas(docs).repartition(2), "text", "doc_id",
        k=5).to_pandas()
    g = got.set_index(["doc_id", "term"])
    # length normalization: same tf=1 for 'apple', shorter doc wins
    assert (g.loc[(0, "apple"), "score"]
            > g.loc[(1, "apple"), "score"])
    # dl carried through
    assert g.loc[(0, "apple"), "dl"] == 2
    assert g.loc[(1, "apple"), "dl"] == 10
    # rare term beats common term at same tf within a doc:
    # df(cherry)=1 < df(apple)=2 -> higher idf
    assert (g.loc[(1, "cherry"), "score"]
            > g.loc[(1, "apple"), "score"])
    # saturation: tf=8 'cherry' scores less than 8x the tf=1 'apple'
    # in the same doc despite higher idf
    assert (g.loc[(1, "cherry"), "score"]
            < 8 * g.loc[(0, "apple"), "score"])


def test_rrf_fuse(ray_session):
    """Hand-checked RRF: item best on list A, worst on list B, vs a
    consistent middle item; ranks are unique row numbers."""
    from ci_log_processing_ray.ops.window import rrf_fuse

    df = pd.DataFrame({
        "item": np.arange(4, dtype=np.int64),
        "a": np.array([100, 50, 50, 10], np.int64),
        "b": np.array([10, 90, 90, 100], np.int64)})
    got = (rrf_fuse(ray.data.from_pandas(df).repartition(2),
                    "item", "a", "b", n_buckets=3)
           .to_pandas().set_index("item").sort_index())
    # ranks by a desc, id asc: 0->1, 1->2, 2->3, 3->4
    assert got["rank_a"].tolist() == [1, 2, 3, 4]
    # ranks by b desc, id asc: 3->1, 1->2, 2->3, 0->4
    assert got["rank_b"].tolist() == [4, 2, 3, 1]
    m = 1_000_000
    for i in range(4):
        assert got.loc[i, "rrf_micro"] == (
            m // (60 + got.loc[i, "rank_a"])
            + m // (60 + got.loc[i, "rank_b"]))
    # the consistent item (id 1: ranks 2,2) beats the split item
    # (id 0: ranks 1,4) under RRF
    assert got.loc[1, "rrf_micro"] > got.loc[0, "rrf_micro"]


def _ref_pav(scores, labels):
    """Sequential reference PAV over raw rows (ties pre-aggregated),
    canonical maximal merge (>=)."""
    agg = {}
    for s, l in zip(scores, labels):
        p, n = agg.get(s, (0, 0))
        agg[s] = (p + l, n + 1)
    st = []
    for s, (p, n) in sorted(agg.items()):
        st.append([s, s, p, n])
        while (len(st) > 1
               and st[-2][2] * st[-1][3] >= st[-1][2] * st[-2][3]):
            _lo, hi, p2, n2 = st.pop()
            st[-1][1] = hi
            st[-1][2] += p2
            st[-1][3] += n2
    return [tuple(b) for b in st]


def test_isotonic_calibrate_closed_form(ray_session):
    """Violation pools; equal rates merge; output strictly increasing."""
    from ci_log_processing_ray.ops.inference import isotonic_calibrate

    df = pd.DataFrame({
        "score": np.array([1, 2, 3, 3, 4, 5], np.int64),
        "label": np.array([1, 0, 1, 1, 1, 1], np.int64)})
    got = isotonic_calibrate(
        ray.data.from_pandas(df).repartition(2), "score", "label",
        n_buckets=3).to_pandas()
    # scores 1,2 violate (1 then 0) -> pooled to rate 500; 3..5 all
    # rate 1000 -> one merged block
    assert got[["score_lo", "score_hi", "pos", "n"]].values.tolist() \
        == [[1, 2, 1, 2], [3, 5, 4, 4]]
    assert got["rate_permille"].tolist() == [500, 1000]
    assert got["rate_permille"].is_monotonic_increasing


def test_isotonic_calibrate_parity(ray_session):
    """Distributed PAV == sequential reference on random data across
    partitionings and bucket counts."""
    from ci_log_processing_ray.ops.inference import isotonic_calibrate

    rng = np.random.default_rng(11)
    for trial, (nb, parts) in enumerate([(3, 2), (7, 5), (16, 3)]):
        n = 400
        scores = rng.integers(0, 60, n).astype(np.int64)
        labels = (rng.random(n) < np.clip(scores / 80 + rng.normal(
            0, 0.3, n), 0, 1)).astype(np.int64)
        df = pd.DataFrame({"score": scores, "label": labels})
        got = isotonic_calibrate(
            ray.data.from_pandas(df).repartition(parts), "score",
            "label", n_buckets=nb).to_pandas()
        want = _ref_pav(scores, labels)
        assert got[["score_lo", "score_hi", "pos", "n"]].values \
            .tolist() == [list(b) for b in want], trial
        r = got["rate_permille"].to_numpy()
        assert (r[1:] > r[:-1]).all(), trial


def test_prediction_kappa(ray_session):
    """Hand-checked kappa: 2x2 confusion [[3,1],[1,3]]: po=6/8,
    pe=1/2 -> kappa=0.5 -> 500 permille; perfect agreement -> 1000;
    one-class degenerate raises."""
    from ci_log_processing_ray.ops.textstats import prediction_kappa

    df = pd.DataFrame({
        "t": ["a"] * 4 + ["b"] * 4,
        "p": ["a", "a", "a", "b", "b", "b", "b", "a"]})
    got = prediction_kappa(
        ray.data.from_pandas(df).repartition(3), "t", "p").to_pandas()
    assert got.values.tolist() == [[8, 6, 500]]

    perf = pd.DataFrame({"t": ["a", "b", "c"], "p": ["a", "b", "c"]})
    got2 = prediction_kappa(
        ray.data.from_pandas(perf), "t", "p").to_pandas()
    assert got2["kappa_permille"].tolist() == [1000]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        one = pd.DataFrame({"t": ["a", "a"], "p": ["a", "a"]})
        prediction_kappa(ray.data.from_pandas(one), "t", "p")


def test_interval_union_by_group(ray_session):
    """Hand-checked islands: overlap merges, touching merges, nesting
    counts once, disjoint splits."""
    from ci_log_processing_ray.ops.window import interval_union_by_group

    df = pd.DataFrame({
        "k": np.array([1, 1, 1, 1, 2, 2], np.int64),
        # k=1: [0,10] + [5,20] overlap; [20,30] touches -> one island
        #      [0,30]; [100,101] separate.  k=2: [5,50] nests [10,20].
        "s": np.array([0, 5, 20, 100, 5, 10], np.int64),
        "e": np.array([10, 20, 30, 101, 50, 20], np.int64)})
    got = (interval_union_by_group(
        ray.data.from_pandas(df).repartition(3), "k", "s", "e",
        n_buckets=3).to_pandas().set_index("k").sort_index())
    assert got.loc[1, "n_islands"] == 2
    assert got.loc[1, "covered"] == 31  # (30-0) + (101-100)
    assert got.loc[2, "n_islands"] == 1
    assert got.loc[2, "covered"] == 45  # nested span adds nothing


def test_gini_impurity_by_group(ray_session):
    """Pure group -> 0; uniform 2-class -> 500; 3:1 mix -> 375."""
    from ci_log_processing_ray.ops.groupagg import gini_impurity_by_group

    df = pd.DataFrame({
        "g": ["p"] * 4 + ["u"] * 4 + ["m"] * 4,
        "lab": ["a"] * 4 + ["a", "a", "b", "b"]
        + ["a", "a", "a", "b"]})
    got = (gini_impurity_by_group(
        ray.data.from_pandas(df).repartition(3), "g", "lab")
        .to_pandas().set_index("g"))
    assert got.loc["p", "gini_permille"] == 0
    assert got.loc["u", "gini_permille"] == 500
    assert got.loc["m", "gini_permille"] == 375
    assert (got["n"] == 4).all()


def test_ks_wasserstein_two_sample(ray_session):
    """Parity vs a brute-force numpy reference on random two-sample
    data across partitionings/bucket counts, plus a shifted closed
    form: side1 = side0 + 7 -> KS = n^2 (max dev), W1 = 7*n^2."""
    from ci_log_processing_ray.ops.groupagg import (
        ks_wasserstein_two_sample)

    def ref(v, s):
        vals = np.unique(v)
        c1 = np.array([(v[s == 0] == x).sum() for x in vals])
        c2 = np.array([(v[s == 1] == x).sum() for x in vals])
        n1, n2 = int(c1.sum()), int(c2.sum())
        dev = np.abs(n2 * np.cumsum(c1) - n1 * np.cumsum(c2))
        ks = int(dev.max())
        w1 = int((dev[:-1] * np.diff(vals)).sum())
        return n1, n2, ks, w1

    rng = np.random.default_rng(3)
    for nb, parts in [(4, 2), (9, 5)]:
        v = rng.integers(-50, 200, 500).astype(np.int64)
        s = rng.integers(0, 2, 500).astype(np.int64)
        got = ks_wasserstein_two_sample(
            ray.data.from_pandas(pd.DataFrame({"v": v, "side": s}))
            .repartition(parts), "v", "side", n_buckets=nb).to_pandas()
        n1, n2, ks, w1 = ref(v, s)
        assert got[["n1", "n2", "ks_num", "w1_num"]].values.tolist() \
            == [[n1, n2, ks, w1]]
        assert got["den"].tolist() == [n1 * n2]

    # disjoint shift: n=5 each, side1 = side0 + 7
    base = np.array([1, 2, 3, 4, 5], np.int64)
    v = np.concatenate([base, base + 7])
    s = np.concatenate([np.zeros(5, np.int64), np.ones(5, np.int64)])
    got = ks_wasserstein_two_sample(
        ray.data.from_pandas(pd.DataFrame({"v": v, "side": s})),
        "v", "side", n_buckets=3).to_pandas()
    assert got["ks_num"].tolist() == [25]       # full separation
    assert got["w1_num"].tolist() == [7 * 25]   # shift * n1 * n2
    assert got["ks_permille"].tolist() == [1000]


def test_degree_assortativity(ray_session):
    """Star graph hub->leaves: x constant (outdeg k), y constant 1 ->
    zero variance both sides; two-star mix gives hand-checkable sums;
    parity vs brute-force numpy on a random multigraph."""
    from ci_log_processing_ray.ops.iterative import degree_assortativity

    def ref(s, d):
        od = pd.Series(s).value_counts()
        idg = pd.Series(d).value_counts()
        x = od[s].to_numpy(np.int64)
        y = idg[d].to_numpy(np.int64)
        m = len(s)
        return [m, x.sum(), y.sum(), (x * x).sum(), (y * y).sum(),
                (x * y).sum(), m * (x * y).sum() - x.sum() * y.sum(),
                m * (x * x).sum() - x.sum() ** 2,
                m * (y * y).sum() - y.sum() ** 2]

    # star: hub 0 -> 1..4
    s = np.zeros(4, np.int64)
    d = np.arange(1, 5, dtype=np.int64)
    got = degree_assortativity(
        ray.data.from_pandas(pd.DataFrame({"src": s, "dst": d}))
        .repartition(2), "src", "dst", n_buckets=3).to_pandas()
    assert got.values.tolist() == [[4, 16, 4, 64, 4, 16, 0, 0, 0]]

    # random multigraph incl. self-loops
    rng = np.random.default_rng(5)
    s = rng.integers(0, 30, 300).astype(np.int64)
    d = rng.integers(0, 30, 300).astype(np.int64)
    got = degree_assortativity(
        ray.data.from_pandas(pd.DataFrame({"src": s, "dst": d}))
        .repartition(4), "src", "dst", n_buckets=5).to_pandas()
    assert got.values.tolist() == [[int(v) for v in ref(s, d)]]


def test_edge_reciprocity(ray_session):
    """Hand-checked: 2-cycle + one-way edge + self-loop + duplicate
    rows -> m=3 distinct non-loop edges, 2 reciprocated."""
    from ci_log_processing_ray.ops.iterative import edge_reciprocity

    df = pd.DataFrame({
        "src": np.array([1, 2, 1, 3, 3, 1], np.int64),
        "dst": np.array([2, 1, 2, 4, 3, 2], np.int64)})
    got = edge_reciprocity(
        ray.data.from_pandas(df).repartition(3), "src", "dst",
        n_buckets=3).to_pandas()
    assert got.values.tolist() == [[3, 2, 666]]


def test_lexical_richness_by_group(ray_session):
    """Hand-checked: group A 'x x y' -> 3 tokens, 2 types, 1 hapax;
    group B all-distinct -> TTR 1000, hapax 1000."""
    from ci_log_processing_ray.ops.textstats import (
        lexical_richness_by_group)

    df = pd.DataFrame({
        "text": ["x x y", "x", "a b c", "d"],
        "g": ["A", "A", "B", "B"]})
    got = (lexical_richness_by_group(
        ray.data.from_pandas(df).repartition(3), "text", "g")
        .to_pandas().set_index("g").sort_index())
    assert got.loc["A"].tolist() == [4, 2, 1, 500, 500]
    assert got.loc["B"].tolist() == [4, 4, 4, 1000, 1000]


def _kruskal(u, v, w):
    """Reference MSF with the same (w, min, max) total order."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    lo = np.minimum(u, v)
    hi = np.maximum(u, v)
    order = np.lexsort((hi, lo, w))
    for i in order:
        if lo[i] == hi[i]:
            continue
        ra, rb = find(int(lo[i])), find(int(hi[i]))
        if ra != rb:
            parent[ra] = rb
            out.append((int(lo[i]), int(hi[i]), int(w[i])))
    return sorted(out)


def test_minimum_spanning_forest(ray_session):
    """Cycle closed form (heaviest edge dropped), multi-component
    forest, and Kruskal parity on a random graph across
    partitionings."""
    from ci_log_processing_ray.ops.iterative import (
        minimum_spanning_forest)

    # 4-cycle with unique weights: drops the heaviest (3-0, w=40)
    df = pd.DataFrame({
        "src": np.array([0, 1, 2, 3], np.int64),
        "dst": np.array([1, 2, 3, 0], np.int64),
        "w": np.array([10, 20, 30, 40], np.int64)})
    got = (minimum_spanning_forest(
        ray.data.from_pandas(df).repartition(2), "src", "dst", "w",
        n_buckets=3).to_pandas().sort_values(["u", "v"]))
    assert got[["u", "v", "w"]].values.tolist() == [
        [0, 1, 10], [1, 2, 20], [2, 3, 30]]

    # two components stay two trees
    df2 = pd.DataFrame({
        "src": np.array([0, 1, 0, 10, 11, 10], np.int64),
        "dst": np.array([1, 2, 2, 11, 12, 12], np.int64),
        "w": np.array([1, 2, 3, 4, 5, 6], np.int64)})
    got2 = (minimum_spanning_forest(
        ray.data.from_pandas(df2).repartition(3), "src", "dst", "w",
        n_buckets=3).to_pandas().sort_values(["u", "v"]))
    assert got2[["u", "v", "w"]].values.tolist() == [
        [0, 1, 1], [1, 2, 2], [10, 11, 4], [11, 12, 5]]

    # random graph parity vs Kruskal (unique weights via permutation)
    rng = np.random.default_rng(17)
    m = 400
    u = rng.integers(0, 80, m).astype(np.int64)
    v = rng.integers(0, 80, m).astype(np.int64)
    w = rng.permutation(m).astype(np.int64) + 1
    got3 = (minimum_spanning_forest(
        ray.data.from_pandas(pd.DataFrame(
            {"src": u, "dst": v, "w": w})).repartition(5),
        "src", "dst", "w", n_buckets=4).to_pandas())
    want = _kruskal(u, v, w)
    assert sorted(map(tuple, got3[["u", "v", "w"]].values.tolist())) \
        == want


def test_spearman_by_group_matches_pandas_ranks(ray_session):
    """Heavy ties across blocks: the cell-collapsed doubled-rank sums
    must equal pandas tie-averaged ranks (doubled, centered) exactly,
    including a perfectly monotone group (rho == 1)."""
    from ci_log_processing_ray.ops.groupagg import spearman_by_group

    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame({
        "grp": rng.choice(["a", "b"], n),
        "x": rng.integers(0, 7, n).astype(np.int64),
        "y": rng.integers(0, 5, n).astype(np.int64),
    })
    mono = pd.DataFrame({
        "grp": "m", "x": np.arange(40, dtype=np.int64),
        "y": np.arange(40, dtype=np.int64) * 3 + 1})
    df = pd.concat([df, mono], ignore_index=True)
    ds = ray.data.from_pandas(df.sample(frac=1.0, random_state=2)
                              ).repartition(5)
    got = (spearman_by_group(ds, "grp", "x", "y").to_pandas()
           .set_index("grp"))

    for grp, sub in df.groupby("grp"):
        dn = len(sub) + 1
        dx = (2 * sub["x"].rank(method="average")).astype(np.int64) - dn
        dy = (2 * sub["y"].rank(method="average")).astype(np.int64) - dn
        row = got.loc[grp]
        assert int(row["n_obs"]) == len(sub)
        assert int(row["sxy"]) == int((dx * dy).sum())
        assert int(row["sxx"]) == int((dx * dx).sum())
        assert int(row["syy"]) == int((dy * dy).sum())
    # monotone group: rho exactly 1 -> sxy^2 == sxx*syy and sxy > 0
    m = got.loc["m"]
    assert int(m["sxy"]) ** 2 == int(m["sxx"]) * int(m["syy"])
    assert int(m["sxy"]) > 0


def test_kendall_by_group_matches_bruteforce(ray_session):
    """Heavy-tie random data across blocks: conc/disc/tied pair counts
    must equal the O(n^2) brute force exactly."""
    from ci_log_processing_ray.ops.groupagg import kendall_by_group

    rng = np.random.default_rng(17)
    n = 400
    df = pd.DataFrame({
        "grp": rng.choice(["a", "b"], n),
        "x": rng.integers(0, 6, n).astype(np.int64),
        "y": rng.integers(0, 4, n).astype(np.int64),
    })
    # degenerate group: single x value -> zero conc/disc
    df = pd.concat([df, pd.DataFrame({
        "grp": "one", "x": np.zeros(9, np.int64),
        "y": np.arange(9, dtype=np.int64) % 3})], ignore_index=True)
    ds = ray.data.from_pandas(df.sample(frac=1.0, random_state=4)
                              ).repartition(5)
    got = (kendall_by_group(ds, "grp", "x", "y").to_pandas()
           .set_index("grp"))

    for grp, sub in df.groupby("grp"):
        x = sub["x"].to_numpy()[:, None]
        y = sub["y"].to_numpy()[:, None]
        dx = np.sign(x - x.T)
        dy = np.sign(y - y.T)
        conc = int(((dx * dy) > 0).sum()) // 2
        disc = int(((dx * dy) < 0).sum()) // 2
        tied_x = int((dx == 0).sum() - len(sub)) // 2
        tied_y = int((dy == 0).sum() - len(sub)) // 2
        row = got.loc[grp]
        assert int(row["n_obs"]) == len(sub)
        assert int(row["conc"]) == conc
        assert int(row["disc"]) == disc
        assert int(row["tied_x"]) == tied_x
        assert int(row["tied_y"]) == tied_y


def test_theilsen_mk_outlier_robust_and_trunc_division(ray_session):
    """A perfect 5/day line with one 1000x outlier day must still give
    slope 5000 milli/day (median pair slope ignores the storm);
    a decreasing group with a gap day pins the toward-zero division
    (DuckDB //): 1000*(-7)//3 = -2333, not floor's -2334."""
    from ci_log_processing_ray.ops.groupagg import theilsen_mk_by_group

    base = datetime.datetime(2024, 3, 1)
    rows = []
    counts = [10, 15, 20, 25, 5000, 35]  # day 4 is the log storm
    for d, cnt in enumerate(counts):
        rows += [("lin", base + datetime.timedelta(days=d))] * cnt
    # decr: counts 9 on day 0, 2 on day 3 -> single pair,
    # slope = 1000*(-7)//3 -> trunc toward zero = -2333
    rows += [("decr", base)] * 9
    rows += [("decr", base + datetime.timedelta(days=3))] * 2
    rows += [("single", base)] * 4  # one day -> omitted
    df = pd.DataFrame(rows, columns=["grp", "ts"])
    ds = ray.data.from_pandas(df.sample(frac=1.0, random_state=6)
                              ).repartition(4)
    got = (theilsen_mk_by_group(ds, "grp", "ts").to_pandas()
           .set_index("grp"))

    assert int(got.loc["lin", "ts_slope_milli"]) == 5000
    # every pair increases except (storm day, day 5): 14 - 1 = 13
    assert int(got.loc["lin", "mk_s"]) == 13
    assert int(got.loc["lin", "n_pairs"]) == 15
    assert int(got.loc["decr", "ts_slope_milli"]) == -2333
    assert int(got.loc["decr", "mk_s"]) == -1
    assert "single" not in got.index


def test_decision_stump_separable_and_tiebreak(ray_session):
    """A perfectly separable group must find the exact boundary with 0
    errors; an error-tie group must pick the SMALLEST threshold; a
    constant-feature group must fall back to the majority baseline."""
    from ci_log_processing_ray.ops.groupagg import decision_stump_by_group

    rows = []
    # sep: x<=4 -> label 1 (30 rows), x>=5 -> label 0 (30 rows)
    for x in range(10):
        rows += [("sep", x, 1 if x <= 4 else 0)] * 6
    # tie: labels alternate regardless of x -> every threshold has the
    # same error count; smallest x must win
    for x in range(4):
        rows += [("tie", x, 0), ("tie", x, 1)]
    # const: x always 7, labels 3 ones / 1 zero -> errors = 1
    rows += [("const", 7, 1)] * 3 + [("const", 7, 0)]
    df = pd.DataFrame(rows, columns=["grp", "x", "pos"])
    ds = ray.data.from_pandas(df.sample(frac=1.0, random_state=8)
                              ).repartition(4)
    got = (decision_stump_by_group(ds, "grp", "x", "pos").to_pandas()
           .set_index("grp"))

    assert int(got.loc["sep", "threshold"]) == 4
    assert int(got.loc["sep", "n_errors"]) == 0
    assert int(got.loc["sep", "left_label"]) == 1
    assert int(got.loc["sep", "right_label"]) == 0
    assert int(got.loc["tie", "threshold"]) == 0
    assert int(got.loc["tie", "n_errors"]) == 4
    assert int(got.loc["const", "threshold"]) == 7
    assert int(got.loc["const", "n_errors"]) == 1
    assert int(got.loc["const", "left_label"]) == 1
    assert int(got.loc["const", "right_label"]) == 0


def test_delta_aggregate_maintains_counts_and_guards(ray_session):
    """Inserts and deletes maintain count+sum exactly; a group deleted
    down to zero disappears; over-deleting raises instead of
    corrupting the view."""
    from ci_log_processing_ray.ops.diff import delta_aggregate

    view = ray.data.from_pandas(pd.DataFrame({
        "k": ["a", "b", "c"],
        "n": np.array([3, 2, 1], np.int64),
        "s": np.array([30, 20, 10], np.int64)}))
    delta = ray.data.from_pandas(pd.DataFrame({
        "k": ["a", "a", "b", "b", "c", "d"],
        "op": np.array([1, -1, -1, -1, -1, 1], np.int64),
        "s": np.array([7, 10, 5, 15, 10, 4], np.int64)})).repartition(3)
    got = (delta_aggregate(view, delta, ["k"], count_col="n",
                           sum_cols=("s",)).to_pandas()
           .sort_values("k").reset_index(drop=True))
    # a: 3+1-1=3 rows, 30+7-10=27; b: 2-2=0 -> dropped; c: 1-1=0 ->
    # dropped; d: net-new 1 row sum 4
    assert got["k"].tolist() == ["a", "d"]
    assert got["n"].tolist() == [3, 1]
    assert got["s"].tolist() == [27, 4]

    bad = ray.data.from_pandas(pd.DataFrame({
        "k": ["a"] * 5, "op": np.array([-1] * 5, np.int64),
        "s": np.array([1] * 5, np.int64)}))
    import pytest as _pytest
    with _pytest.raises(Exception, match="negative"):
        delta_aggregate(view, bad, ["k"], count_col="n",
                        sum_cols=("s",)).to_pandas()


def test_ktruss_peels_to_planted_clique(ray_session):
    """K5 + a path + a lone triangle + a triangle ladder: the 4-truss
    must peel everything but the K5 (cascading the ladder away over
    multiple rounds); the 3-truss keeps every triangle-supported
    edge."""
    from itertools import combinations

    from ci_log_processing_ray.ops.iterative import ktruss

    edges = []
    edges += list(combinations(range(5), 2))            # K5
    edges += [(10, 11), (11, 12), (12, 13)]             # path
    edges += [(20, 21), (21, 22), (20, 22)]             # triangle
    ladder = [(i, i + 1) for i in range(30, 35)] + \
             [(i, i + 2) for i in range(30, 34)]        # ladder
    edges += ladder
    df = pd.DataFrame(edges, columns=["s", "d"])
    # feed duplicates + reversed + self loops: must canonicalize
    rev = df.rename(columns={"s": "d", "d": "s"})
    loops = pd.DataFrame({"s": [1, 20], "d": [1, 20]})
    ds = ray.data.from_pandas(pd.concat([df, rev, loops])
                              ).repartition(4)

    t4 = ktruss(ds, "s", "d", 4).to_pandas().sort_values(
        ["a", "b"]).reset_index(drop=True)
    assert [tuple(r) for r in t4[["a", "b"]].to_numpy()] == \
        list(combinations(range(5), 2))
    assert (t4["support"] == 3).all()

    t3 = ktruss(ds, "s", "d", 3).to_pandas()
    got = {tuple(r) for r in t3[["a", "b"]].to_numpy()}
    want = set(combinations(range(5), 2)) | \
        {(20, 21), (20, 22), (21, 22)} | set(ladder)
    assert got == want


def test_tree_closure_matches_bruteforce(ray_session):
    """Irregular multi-root forest (two binary trees + a deep chain +
    isolated pair), fed with duplicate edges and a self loop: the
    doubling closure must equal the walked ancestor set exactly, and
    max_depth must truncate it."""
    from ci_log_processing_ray.ops.iterative import tree_closure

    parent = {}
    for k in range(2, 40):          # binary tree rooted at 1
        parent[k] = k // 2
    for k in range(101, 140):       # chain 100 <- 101 <- ... <- 139
        parent[k] = k - 1
    parent[200] = 201               # pair
    df = pd.DataFrame({"n": list(parent), "p": list(parent.values())})
    dups = df.iloc[::3]
    loop = pd.DataFrame({"n": [7], "p": [7]})
    ds = ray.data.from_pandas(pd.concat([df, dups, loop])
                              ).repartition(4)

    want = set()
    for k in parent:
        a, d = k, 0
        while a in parent:
            a, d = parent[a], d + 1
            want.add((k, a, d))
    clo = tree_closure(ds, "n", "p", n_buckets=4).to_pandas()
    got = set(map(tuple, clo[["node", "anc", "depth"]]
                  .itertuples(index=False)))
    assert got == want

    capped = tree_closure(ds, "n", "p", max_depth=3,
                          n_buckets=4).to_pandas()
    got3 = set(map(tuple, capped[["node", "anc", "depth"]]
                   .itertuples(index=False)))
    assert got3 == {t for t in want if t[2] <= 3}


def test_tree_stats_depth_root_subtree(ray_session):
    """Same forest: depth/root/subtree_size per node vs brute force,
    roots included with depth 0 and self root."""
    from ci_log_processing_ray.ops.iterative import tree_stats

    parent = {}
    for k in range(2, 40):
        parent[k] = k // 2
    for k in range(101, 110):
        parent[k] = k - 1
    parent[200] = 201
    df = pd.DataFrame({"n": list(parent), "p": list(parent.values())})
    ds = ray.data.from_pandas(df).repartition(4)

    nodes = set(parent) | set(parent.values())
    anc_of = {}
    for k in nodes:
        chain, a = [], k
        while a in parent:
            a = parent[a]
            chain.append(a)
        anc_of[k] = chain
    desc = {n: 0 for n in nodes}
    for k in nodes:
        for a in anc_of[k]:
            desc[a] += 1

    st = tree_stats(ds, "n", "p", n_buckets=4).to_pandas()
    assert set(st["node"]) == nodes
    for _, r in st.iterrows():
        k = int(r["node"])
        chain = anc_of[k]
        assert r["depth"] == len(chain)
        assert r["root"] == (chain[-1] if chain else k)
        assert r["subtree_size"] == 1 + desc[k]


def test_mann_whitney_exact_pairs(ray_session):
    """u2 vs brute-force pair enumeration over several groups with
    heavy ties, including a group with an empty side (u2 = 0)."""
    import numpy as _np

    from ci_log_processing_ray.ops.groupagg import mann_whitney_u

    rng = _np.random.RandomState(7)
    rows = []
    for g, n in (("a", 40), ("b", 25), ("c", 10)):
        for i in range(n):
            side = i % 2
            rows.append((g, side, int(rng.randint(0, 6)) + side))
    rows += [("lone", 0, 5), ("lone", 0, 7)]   # no side-1 rows
    df = pd.DataFrame(rows, columns=["g", "s", "v"])
    ds = ray.data.from_pandas(df).repartition(4)

    out = mann_whitney_u(ds, "g", "s", "v", n_buckets=4).to_pandas()
    out = out.set_index("grp")
    for g, sub in df.groupby("g"):
        a = sub[sub["s"] == 0]["v"].to_numpy()
        b = sub[sub["s"] == 1]["v"].to_numpy()
        u2 = int(2 * (a[:, None] > b[None, :]).sum()
                 + (a[:, None] == b[None, :]).sum()) if len(b) else 0
        r = out.loc[g]
        assert (r["n_a"], r["n_b"], r["u2"]) == (len(a), len(b), u2), g


def test_component_stats_shapes(ray_session):
    """Triangle + path + K4 + lone edge, fed with duplicates, reversed
    edges and a self loop: per-component (n_nodes, n_edges,
    cyclomatic) must be exact."""
    from itertools import combinations

    from ci_log_processing_ray.ops.iterative import component_stats

    edges = [(0, 1), (1, 2), (0, 2)]                   # triangle
    edges += [(10, 11), (11, 12), (12, 13)]            # path
    edges += list(combinations(range(20, 24), 2))      # K4
    edges += [(30, 31)]                                # lone edge
    df = pd.DataFrame(edges, columns=["s", "d"])
    rev = df.rename(columns={"s": "d", "d": "s"})
    loops = pd.DataFrame({"s": [2, 30], "d": [2, 30]})
    ds = ray.data.from_pandas(pd.concat([df, rev, loops])
                              ).repartition(4)

    out = component_stats(ds, "s", "d", n_buckets=4).to_pandas()
    got = {int(r["component"]): (int(r["n_nodes"]), int(r["n_edges"]),
                                 int(r["cyclomatic"]))
           for _, r in out.iterrows()}
    assert got == {0: (3, 3, 1), 10: (4, 3, 0),
                   20: (4, 6, 3), 30: (2, 1, 0)}


def test_butterfly_count_closed_form(ray_session):
    from ci_log_processing_ray.ops.relational import butterfly_count

    # 4 disjoint K_{3,2} blocks (3 keys x 2 items, all edges): each
    # block has 6 edges, 2 * C(3,2) = 6 item-centered wedges, and
    # C(3,2) * C(2,2) = 3 butterflies.  Plus one degree-5 hub item
    # (fresh keys -> no extra butterflies) to exercise max_degree.
    rows = []
    for blk in range(4):
        for k in range(3):
            for i in range(2):
                rows.append({"k": 100 * blk + k, "i": 100 * blk + 50 + i})
    rows += [{"k": 900 + j, "i": 999} for j in range(5)]
    rows = rows + rows  # duplicates must collapse

    ds = ray.data.from_items(rows).repartition(5)
    out = butterfly_count(ds, "k", "i", n_buckets=4).to_pandas()
    assert (int(out.n_edges[0]), int(out.n_wedges[0]),
            int(out.n_butterflies[0])) == (29, 34, 12)

    capped = butterfly_count(ds, "k", "i", max_degree=4,
                             n_buckets=4).to_pandas()
    assert (int(capped.n_edges[0]), int(capped.n_wedges[0]),
            int(capped.n_butterflies[0])) == (24, 24, 12)


def test_nb_classifier_score_exact(ray_session):
    from collections import Counter

    from ci_log_processing_ray.ops.textstats import nb_classifier_score

    rows = [
        {"id": 1, "txt": "good good nice", "lab": "en"},
        {"id": 2, "txt": "bad bad ugly", "lab": "de"},
        {"id": 3, "txt": "good bad", "lab": "en"},
        {"id": 4, "txt": "nice ugly ugly", "lab": "de"},
    ]
    cp, cn = Counter(), Counter()
    for r in rows:
        (cp if r["lab"] == "en" else cn).update(r["txt"].split())
    vocab = set(cp) | set(cn)
    v, tp, tn = len(vocab), sum(cp.values()), sum(cn.values())

    def wgt(w):
        return (1000 * (cp[w] + 1) * (tn + v)
                // ((cn[w] + 1) * (tp + v)) - 1000)

    want = {r["id"]: sum(wgt(w) for w in r["txt"].split())
            for r in rows}
    out = nb_classifier_score(
        ray.data.from_items(rows).repartition(3),
        "txt", "id", "lab", "en").to_pandas()
    got = dict(zip(out["id"], out["score"]))
    assert got == want
    assert dict(zip(out["id"], out["pred"])) == {
        i: int(s > 0) for i, s in want.items()}


def test_linear_attribution_exact(ray_session):
    import datetime

    from ci_log_processing_ray.ops.window import linear_attribution

    t0 = datetime.datetime(2024, 1, 1)

    def ev(i, u, ch):
        return {"event_id": i, "user_id": u,
                "ts": t0 + datetime.timedelta(minutes=i),
                "event_type": ch}

    rows = [
        # user 1: a b c -> buy (334/333/333), buy with no touches
        # -> direct, trailing a earns nothing
        ev(1, 1, "a"), ev(2, 1, "b"), ev(3, 1, "c"), ev(4, 1, "buy"),
        ev(5, 1, "buy"), ev(6, 1, "a"),
        # user 2: bare conversion -> direct
        ev(7, 2, "buy"),
        # user 3: a a -> buy (500 + 500, remainder none)
        ev(8, 3, "a"), ev(9, 3, "a"), ev(10, 3, "buy"),
    ]
    out = linear_attribution(
        ray.data.from_items(rows).repartition(4),
        "user_id", "ts", "event_type", "event_id",
        conversion="buy", n_buckets=3).to_pandas()
    got = {r["channel"]: (int(r["credit"]), int(r["n_touches"]))
           for _, r in out.iterrows()}
    assert got == {"a": (1334, 3), "b": (333, 1), "c": (333, 1),
                   "direct": (2000, 2)}


def test_dbscan_grid_scene(ray_session):
    from ci_log_processing_ray.ops.iterative import dbscan_grid

    pts = [
        # cluster A: mutual core triangle + one border + one noise
        (1, 0, 0), (2, 3, 0), (3, 0, 3), (4, 7, 0), (5, 50, 50),
        # cluster B far away
        (11, 100, 100), (12, 103, 100), (13, 100, 103),
        # coincident core triple
        (21, 200, 200), (22, 200, 200), (23, 200, 200),
        # isolated core (self-loop path): two borders, never core-core
        (31, 300, 300), (32, 300, 304), (33, 300, 296),
    ]
    ds = ray.data.from_items(
        [{"id": i, "x": x, "y": y} for i, x, y in pts]).repartition(4)
    out = dbscan_grid(ds, "id", "x", "y", eps=5, min_pts=3,
                      n_buckets=4).to_pandas()
    got = {int(r["id"]): (int(r["cluster"]), int(r["is_core"]))
           for _, r in out.iterrows()}
    assert got == {
        1: (1, 1), 2: (1, 1), 3: (1, 1), 4: (1, 0), 5: (-1, 0),
        11: (11, 1), 12: (11, 1), 13: (11, 1),
        21: (21, 1), 22: (21, 1), 23: (21, 1),
        31: (31, 1), 32: (31, 0), 33: (31, 0),
    }
    assert len(out) == len(pts)


def test_caliper_match_nearest(ray_session):
    from ci_log_processing_ray.ops.relational import caliper_match

    rows = [
        # controls (treat 0)
        {"id": 101, "s": 10, "tr": 0}, {"id": 102, "s": 10, "tr": 0},
        {"id": 103, "s": 30, "tr": 0}, {"id": 104, "s": 50, "tr": 0},
        # treated (treat 1)
        {"id": 1, "s": 20, "tr": 1},   # tie d=10 both sides -> 101
        {"id": 2, "s": 29, "tr": 1},   # right d=1 -> 103
        {"id": 3, "s": 100, "tr": 1},  # nothing in caliper -> drop
        {"id": 4, "s": 55, "tr": 1},   # left d=5 -> 104
        {"id": 5, "s": 10, "tr": 1},   # d=0, dup scores -> min id 101
    ]
    out = caliper_match(
        ray.data.from_items(rows).repartition(3), "id", "s", "tr",
        caliper=15, n_buckets=3).to_pandas()
    got = {int(r["treated_id"]): (int(r["control_id"]), int(r["dist"]))
           for _, r in out.iterrows()}
    assert got == {1: (101, 10), 2: (103, 1), 4: (104, 5),
                   5: (101, 0)}


def test_quantile_normalize_rank_map(ray_session):
    from ci_log_processing_ray.ops.window import quantile_normalize

    rows = ([{"id": i, "g": "r", "v": 10 * i} for i in (1, 2, 3, 4)]
            + [{"id": 11, "g": "a", "v": 5}, {"id": 12, "g": "a", "v": 7}]
            + [{"id": 21, "g": "b", "v": 1}, {"id": 22, "g": "b", "v": 2},
               {"id": 23, "g": "b", "v": 3}]
            + [{"id": 31, "g": "c", "v": 9}, {"id": 32, "g": "c", "v": 9}])
    out = quantile_normalize(
        ray.data.from_items(rows).repartition(4), "g", "v", "id",
        ref_group="r", n_buckets=3).to_pandas()
    got = {int(r["id"]): int(r["mapped"]) for _, r in out.iterrows()}
    assert got == {
        1: 10, 2: 20, 3: 30, 4: 40,       # ref maps to itself
        11: 10, 12: 30,                    # ng=2 -> ranks 1, 3
        21: 10, 22: 20, 23: 30,            # ng=3 -> ranks 1, 2, 3
        31: 10, 32: 30,                    # tie broken by id
    }
    assert len(out) == len(rows)


def test_source_vocab_overlap_exact(ray_session):
    from ci_log_processing_ray.ops.textstats import source_vocab_overlap

    rows = [
        {"src": "a", "txt": "x y z"}, {"src": "a", "txt": "x w"},
        {"src": "b", "txt": "y z q"},
        {"src": "c", "txt": "q q q"},
    ]
    # vocab: a={x,y,z,w}, b={y,z,q}, c={q}
    out = source_vocab_overlap(
        ray.data.from_items(rows).repartition(3), "src", "txt",
        n_buckets=3).to_pandas()
    got = {(r["src_a"], r["src_b"]): (int(r["inter"]), int(r["uni"]))
           for _, r in out.iterrows()}
    assert got == {("a", "b"): (2, 5), ("b", "c"): (1, 3)}


def test_trimmed_mean_stats_exact(ray_session):
    from ci_log_processing_ray.ops.window import trimmed_mean_stats

    rows = ([{"g": "a", "id": i, "v": v} for i, v in
             enumerate([100, 1, 2, 3, 4, 5, 6, 7, 8, -50])]
            + [{"g": "b", "id": i, "v": 5} for i in range(3)])
    # a: n=10, k = 10*200//1000 = 2 -> drop {-50, 1} and {8, 100};
    # keep 2..7 -> n_kept 6, sum 27.  b: n=3, k=0 -> all kept.
    out = trimmed_mean_stats(
        ray.data.from_items(rows).repartition(3), "g", "v", "id",
        trim_permille=200, n_buckets=2).to_pandas()
    got = {r["g"]: (int(r["n_kept"]), int(r["sum_kept"]))
           for _, r in out.iterrows()}
    assert got == {"a": (6, 27), "b": (3, 15)}


def test_ngram_count_of_counts_exact(ray_session):
    from collections import Counter

    from ci_log_processing_ray.ops.textstats import ngram_count_of_counts

    texts = ["a b a b c", "b c", "a", ""]
    uni, bi = Counter(), Counter()
    for t in texts:
        ws = t.split()
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    want = (Counter(uni.values()), Counter(bi.values()))
    out = ngram_count_of_counts(
        ray.data.from_items([{"txt": t} for t in texts]).repartition(3),
        "txt", n_buckets=3).to_pandas()
    got1 = {int(r["freq"]): int(r["n_ngrams"])
            for _, r in out[out["ord"] == 1].iterrows()}
    got2 = {int(r["freq"]): int(r["n_ngrams"])
            for _, r in out[out["ord"] == 2].iterrows()}
    assert got1 == dict(want[0]) and got2 == dict(want[1])


def test_spatial_nn_exact(ray_session):
    from ci_log_processing_ray.ops.iterative import spatial_nn

    pts = [
        (1, 0, 0), (2, 3, 0), (3, 0, 4),      # 1-2 d2=9; 1-3 d2=16
        (4, 100, 100), (5, 103, 104),         # pair across cells d2=25
        (6, 500, 500),                        # isolated -> dropped
        (7, 200, 200), (8, 200, 205), (9, 205, 200),  # tie -> min id
    ]
    ds = ray.data.from_items(
        [{"id": i, "x": x, "y": y} for i, x, y in pts]).repartition(3)
    out = spatial_nn(ds, "id", "x", "y", radius=30,
                     n_buckets=4).to_pandas()
    got = {int(r["id"]): (int(r["nn_id"]), int(r["d2"]))
           for _, r in out.iterrows()}
    assert got == {1: (2, 9), 2: (1, 9), 3: (1, 16),
                   4: (5, 25), 5: (4, 25),
                   7: (8, 25), 8: (7, 25), 9: (7, 25)}


def test_partition_modularity_exact(ray_session):
    from ci_log_processing_ray.ops.iterative import partition_modularity

    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (2, 3), (4, 5)]
    comm = [{"node": n, "c": 0 if n <= 2 else 1} for n in range(6)]
    out = partition_modularity(
        ray.data.from_items(
            [{"s": a, "d": b} for a, b in edges]).repartition(3),
        "s", "d",
        ray.data.from_items(comm).repartition(2), "node", "c",
        n_buckets=3).to_pandas()
    got = {int(r["community"]): (int(r["internal_edges"]),
                                 int(r["degree_sum"]))
           for _, r in out.iterrows()}
    assert got == {0: (3, 7), 1: (2, 5)}


def test_cdc_chunk_stats_parity_and_shift(ray_session):
    import random

    import numpy as np

    from ci_log_processing_ray.ops.dedup import (
        _cdc_gear_table, cdc_chunk_stats)

    random.seed(7)
    base = "".join(random.choice("abcdefgh ") for _ in range(3000))
    docs = [base, "X" + base, base[500:1500],
            "".join(random.choice("xyz") for _ in range(400))]

    W, MB = 16, 5
    gear = _cdc_gear_table()

    from ci_log_processing_ray.ops.dedup import _CDC_R

    R = int(_CDC_R)

    def ref_chunks(s: str) -> list[str]:
        b = s.encode()
        cuts = [0]
        for i in range(W - 1, len(b)):
            h = 0
            for j in range(W):
                h = (h + int(gear[b[i - j]]) * pow(R, j, 2**64)) % 2**64
            if h & ((1 << MB) - 1) == 0:
                cuts.append(i + 1)
        if cuts[-1] != len(b):
            cuts.append(len(b))
        return [s[a:c] for a, c in zip(cuts, cuts[1:]) if c > a]

    from collections import Counter
    allc = Counter()
    for d in docs:
        allc.update(ref_chunks(d))
    want = (sum(allc.values()), len(allc),
            sum(len(c) * n for c, n in allc.items()),
            sum(len(c) for c in allc))

    out = cdc_chunk_stats(
        ray.data.from_items([{"t": d} for d in docs]).repartition(3),
        "t", window=W, mask_bits=MB, n_buckets=3).to_pandas()
    got = (int(out.n_chunks[0]), int(out.n_distinct[0]),
           int(out.bytes_total[0]), int(out.bytes_distinct[0]))
    assert got == want

    # the CDC property: a one-byte prefix insertion keeps most chunk
    # bytes shared (fixed-size blocking would share none)
    c1, c2 = Counter(ref_chunks(base)), Counter(ref_chunks("X" + base))
    shared = sum(len(c) * min(c1[c], c2[c]) for c in c1 if c in c2)
    assert shared > 0.5 * len(base)


def test_widest_paths_semiring(ray_session):
    from ci_log_processing_ray.ops.iterative import (
        WIDEST_SEED_W, widest_paths)

    edges = [{"s": 0, "d": 1, "w": 5}, {"s": 1, "d": 2, "w": 3},
             {"s": 0, "d": 2, "w": 2}, {"s": 2, "d": 3, "w": 10}]
    for cap in (5_000_000, 0):  # broadcast path AND co-partition path
        out = widest_paths(
            ray.data.from_items(edges).repartition(2), "s", "d", "w",
            ray.data.from_items([{"node": 0}]), n_rounds=3,
            n_buckets=2, broadcast_cap=cap).to_pandas()
        got = {int(r["node"]): int(r["width"])
               for _, r in out.iterrows()}
        assert got == {0: int(WIDEST_SEED_W), 1: 5, 2: 3, 3: 3}, cap


def test_shortest_path_counts_diamond(ray_session):
    from ci_log_processing_ray.ops.iterative import shortest_path_counts

    # diamond 0-{1,2}-3 plus a tail 3-4 and a shortcut making node 5
    # reachable two ways at hop 1
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (0, 5), (9, 5)]
    seeds = [{"node": 0}, {"node": 9}]
    for cap in (5_000_000, 0):  # broadcast path AND co-partition path
        out = shortest_path_counts(
            ray.data.from_items(
                [{"s": a, "d": b} for a, b in edges]).repartition(3),
            "s", "d", ray.data.from_items(seeds), n_rounds=3,
            n_buckets=2, broadcast_cap=cap).to_pandas()
        got = {int(r["node"]): (int(r["hops"]), int(r["paths"]))
               for _, r in out.iterrows()}
        assert got == {0: (0, 1), 9: (0, 1), 1: (1, 1), 2: (1, 1),
                       5: (1, 2), 3: (2, 2), 4: (3, 2)}, cap


def test_skipgram_topk_exact(ray_session):
    from collections import Counter

    from ci_log_processing_ray.ops.textstats import skipgram_topk

    texts = ["a b c a", "b a", "c", "a a a"]
    want = Counter()
    for t in texts:
        ws = t.split()
        for i in range(len(ws)):
            for off in (1, 2):
                if i + off < len(ws):
                    want[(ws[i], ws[i + off])] += 1
    out = skipgram_topk(
        ray.data.from_items([{"t": t} for t in texts]).repartition(3),
        "t", window=2, k=100).to_pandas()
    got = {(r["w1"], r["w2"]): int(r["n"]) for _, r in out.iterrows()}
    assert got == dict(want)


def test_join_size_audit_exact(ray_session):
    from ci_log_processing_ray.ops.relational import join_size_audit

    L = ray.data.from_items([{"k": x} for x in [1, 1, 1, 2, 3]])
    R = ray.data.from_items([{"j": x} for x in [1, 1, 2, 2, 2, 4]])
    out = join_size_audit(L.repartition(2), R.repartition(3),
                          "k", "j", n_buckets=2).to_pandas()
    assert (int(out.join_rows[0]), int(out.max_amplification[0]),
            int(out.hot_key[0]), int(out.n_shared_keys[0])) \
        == (9, 6, 1, 2)

    # amplification tie -> smaller key wins
    L2 = ray.data.from_items([{"k": x} for x in [5, 5, 6, 6]])
    R2 = ray.data.from_items([{"j": x} for x in [5, 6]])
    out2 = join_size_audit(L2, R2, "k", "j", n_buckets=2).to_pandas()
    assert (int(out2.join_rows[0]), int(out2.max_amplification[0]),
            int(out2.hot_key[0])) == (4, 2, 5)


def test_survival_table_km(ray_session):
    import datetime

    from ci_log_processing_ray.ops.window import survival_table

    t0 = datetime.datetime(2024, 1, 1)

    def ev(u, day, ty):
        return {"u": u, "ts": t0 + datetime.timedelta(days=day),
                "event_type": ty}

    rows = [
        ev(1, 0, "signup"), ev(1, 2, "buy"),           # event at d=2
        ev(2, 0, "signup"), ev(2, 2, "buy"),           # event at d=2
        ev(3, 1, "signup"), ev(3, 4, "buy"),           # event at d=3
        ev(4, 0, "signup"),                            # censored d=10
        ev(5, 3, "buy"), ev(5, 5, "signup"),           # pre-start buy
                                                       # -> censored 5
        ev(6, 10, "other"),                            # horizon marker
    ]
    out = survival_table(
        ray.data.from_items(rows).repartition(3), "u", "ts",
        "event_type", start="signup", event="buy",
        n_buckets=2).to_pandas()
    got = {int(r["duration_days"]): (int(r["n_events"]),
                                     int(r["n_at_risk"]))
           for _, r in out.iterrows()}
    # durations: u1=2ev, u2=2ev, u3=3ev, u4=10cens, u5=5cens
    # at_risk(2)=5, at_risk(3)=3
    assert got == {2: (2, 5), 3: (1, 3)}


def test_clamped_running_balance(ray_session):
    from ci_log_processing_ray.ops.window import clamped_running_balance

    rows = [
        # user a: 5, -10 (clamp to 0), 3 -> balances 5, 0, 3
        {"g": "a", "i": 1, "d": 5}, {"g": "a", "i": 2, "d": -10},
        {"g": "a", "i": 3, "d": 3},
        # user b: -4 (clamp), 2, -1 -> 0, 2, 1
        {"g": "b", "i": 1, "d": -4}, {"g": "b", "i": 2, "d": 2},
        {"g": "b", "i": 3, "d": -1},
        # user c: never clamps
        {"g": "c", "i": 1, "d": 7}, {"g": "c", "i": 2, "d": -3},
    ]
    out = clamped_running_balance(
        ray.data.from_items(rows).repartition(3), "g", ["i"], "d",
        n_buckets=2).to_pandas()
    got = {(r["g"], int(r["i"])): int(r["balance"])
           for _, r in out.iterrows()}
    assert got == {("a", 1): 5, ("a", 2): 0, ("a", 3): 3,
                   ("b", 1): 0, ("b", 2): 2, ("b", 3): 1,
                   ("c", 1): 7, ("c", 2): 4}


def test_monotone_streaks_exact(ray_session):
    from ci_log_processing_ray.ops.window import monotone_streaks

    rows = (
        # a: 1 2 3 | 2 | 5 7 (longest 3, two runs >= 2)
        [{"g": "a", "i": i, "v": v}
         for i, v in enumerate([1, 2, 3, 2, 5, 7])]
        # b: 4 4 4 -> ties break runs (longest 1, zero runs)
        + [{"g": "b", "i": i, "v": 4} for i in range(3)]
        # c: strictly decreasing (longest 1)
        + [{"g": "c", "i": i, "v": 9 - i} for i in range(4)]
    )
    out = monotone_streaks(
        ray.data.from_items(rows).repartition(3), "g", ["i"], "v",
        n_buckets=2).to_pandas()
    got = {r["g"]: (int(r["longest_streak"]), int(r["n_streaks"]),
                    int(r["n_rows"])) for _, r in out.iterrows()}
    assert got == {"a": (3, 2, 6), "b": (1, 0, 3), "c": (1, 0, 4)}


def test_below_group_avg_both_paths(ray_session):
    """Q17 shape: broadcast path == co-partition path == hand truth."""
    from ci_log_processing_ray.ops.relational import below_group_avg_sum

    # part 1: qtys [1, 10, 10] avg 7 -> 0.2*avg = 1.4 -> only qty 1
    # part 2: qtys [5, 5]      avg 5 -> 0.2*avg = 1   -> none
    rows = [
        {"k": 1, "qty": 1, "val": 100, "g": "A"},
        {"k": 1, "qty": 10, "val": 200, "g": "A"},
        {"k": 1, "qty": 10, "val": 300, "g": "B"},
        {"k": 2, "qty": 5, "val": 400, "g": "A"},
        {"k": 2, "qty": 5, "val": 500, "g": "B"},
    ]
    want = {("A", 1, 100)}
    for cap in (10_000, 0):  # broadcast path, then co-partition path
        out = below_group_avg_sum(
            ray.data.from_items(rows), "k", "qty", "val", "g",
            num=1, den=5, broadcast_cap=cap, n_buckets=4)
        got = {(r.g, r.n_below, r.sum_val) for r in out.itertuples()}
        assert got == want, cap


def test_group_share_filter_exact_cutoff(ray_session):
    """Q11 shape: groups above 1.5x the average group sum survive;
    the cutoff must be exclusive and exact at the boundary."""
    from ci_log_processing_ray.ops.groupagg import group_share_filter

    # sums: a=30, b=15, c=15 ; total=60, n=3, avg=20, 1.5x avg=30
    # -> strict > keeps NOTHING at exactly 30; raise a to 31 -> keeps a
    rows = [{"k": "a", "v": 30}, {"k": "b", "v": 15},
            {"k": "c", "v": 15}]
    out = group_share_filter(ray.data.from_items(rows), "k", "v",
                             mult_num=3, mult_den=2, n_buckets=4)
    assert len(out) == 0
    rows[0]["v"] = 31  # total 61, cutoff floor(3*61/6)=30 -> 31 > 30
    out = group_share_filter(ray.data.from_items(rows), "k", "v",
                             mult_num=3, mult_den=2, n_buckets=4)
    got = {(r.k, r.sum_val, r.share_permille) for r in out.itertuples()}
    assert got == {("a", 31, (1000 * 31) // 61)}


def test_max_drawdown_known_sequence(ray_session):
    from ci_log_processing_ray.ops.window import max_drawdown_by_group

    # deltas 5,-3,-4,10,-2 -> S=5,2,-2,8,6; peak=5,5,5,8,8
    # dd = 0,3,7,0,2 -> max 7, final 6
    rows = [{"u": 1, "o": i, "d": d}
            for i, d in enumerate([5, -3, -4, 10, -2])]
    rows += [{"u": 2, "o": 0, "d": 4}]  # single row: dd 0, final 4
    out = max_drawdown_by_group(
        ray.data.from_items(rows), "u", ["o"], "d",
        n_buckets=4).to_pandas()
    got = {(r.u, r.max_drawdown, r.final_balance, r.n_rows)
           for r in out.itertuples()}
    assert got == {(1, 7, 6, 5), (2, 0, 4, 1)}


def test_kcenter_select_parity(ray_session):
    """The distributed greedy k-center must equal the pure-numpy greedy
    (same quantization, same smallest-id tie-break) pick for pick."""
    import numpy as np

    from ci_log_processing_ray.ops.similarity import kcenter_select

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, 8)).astype(np.float64)
    rows = [{"vid": int(i), "v": vecs[i].tolist()} for i in range(60)]
    got = kcenter_select(ray.data.from_items(rows), "v", "vid", k=6)

    q = np.rint(vecs * 1e6).astype(np.int64)
    chosen = [0]  # smallest id seeds
    dists = [0]
    for _ in range(5):
        best = None
        for c in chosen:
            d = q - q[c]
            dist = np.einsum("ij,ij->i", d, d)
            best = dist if best is None else np.minimum(best, dist)
        best[np.asarray(chosen)] = -1
        order = np.lexsort((np.arange(60), -best))
        chosen.append(int(order[0]))
        dists.append(int(best[order[0]]))

    assert got["vid"].tolist() == chosen
    assert got["dist"].tolist() == dists
    assert got["sel_order"].tolist() == list(range(6))


def test_kcenter_select_k_exceeds_n(ray_session):
    from ci_log_processing_ray.ops.similarity import kcenter_select

    rows = [{"vid": i, "v": [float(i), 0.0]} for i in range(3)]
    got = kcenter_select(ray.data.from_items(rows), "v", "vid", k=10)
    assert len(got) == 3
    assert set(got["vid"]) == {0, 1, 2}


def test_sliding_extrema_doubling_kernel(ray_session):
    """The RMQ doubling kernel must equal a brute-force ROWS window for
    awkward k (1, power-of-two, k > segment length) and partial heads."""
    import numpy as np

    from ci_log_processing_ray.ops.window import sliding_extrema_by_group

    rng = np.random.default_rng(3)
    rows = []
    for u in range(5):
        for i in range(int(rng.integers(1, 12))):
            rows.append({"u": u, "o": i, "v": int(rng.integers(-50, 50))})
    for k in (1, 2, 4, 5, 8, 20):
        out = sliding_extrema_by_group(
            ray.data.from_items(rows), "u", ["o"], "v", k=k,
            n_buckets=3).to_pandas().sort_values(["u", "o"])
        byu = {}
        for r in rows:
            byu.setdefault(r["u"], []).append(r["v"])
        for _, row in out.iterrows():
            seg = byu[row["u"]]
            lo = max(0, row["o"] - k + 1)
            win = seg[lo:row["o"] + 1]
            assert row["roll_max"] == max(win), (k, dict(row))
            assert row["roll_min"] == min(win), (k, dict(row))


def test_local_minima_fingerprints_parity(ray_session):
    """The vectorized local-minima selection must equal a brute-force
    per-doc implementation of the same spec (k-byte polynomial rolling
    hash, inclusive (2w-1)-neighborhood minimum, ties keep all)."""
    import numpy as np

    from ci_log_processing_ray.ops.dedup import (_MERSENNE,
                                                 local_minima_fingerprints)

    rng = np.random.default_rng(11)
    alpha = "abcdef"
    texts = ["".join(rng.choice(list(alpha))
                     for _ in range(int(rng.integers(1, 60))))
             for _ in range(40)]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    k, w = 4, 3
    got = (local_minima_fingerprints(
        ray.data.from_items(rows), "text", "doc_id", k=k, w=w)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))

    def brute(text: str):
        b = text.encode()
        if len(b) < k:
            b = b + bytes(k - len(b))
        hs = []
        for i in range(len(b) - k + 1):
            h = 0
            for j in range(k):
                h = (h * 257 + b[i + j]) % _MERSENNE
            hs.append(h)
        sel, chk = 0, 0
        for i, h in enumerate(hs):
            lo = max(0, i - w + 1)
            hi = min(len(hs), i + w)
            if h == min(hs[lo:hi]):
                sel += 1
                chk += h % 1_000_000_007
        return len(hs), sel, chk

    for i, t in enumerate(texts):
        nw, ns, ck = brute(t)
        row = got.iloc[i]
        assert (row["n_windows"], row["n_selected"],
                row["fp_checksum"]) == (nw, ns, ck), (i, t)


def test_ktruss_max_degree_superset(ray_session):
    """Planted star hub above the cap: with max_degree set, the capped
    run must (a) skip the hub's wedge generation, (b) still return a
    SUPERSET of the exact truss containing the whole planted clique,
    and (c) never peel an edge inside the hub's at-risk closure."""
    import warnings as _w
    from itertools import combinations

    from ci_log_processing_ray.ops.iterative import ktruss

    edges = list(combinations(range(5), 2))             # K5 (true truss)
    hub = 100
    edges += [(hub, 200 + i) for i in range(64)]        # star hub deg 64
    edges += [(200, 201), (200 + 1, 200 + 2)]           # chords at hub
    edges += [(10, 11), (11, 12)]                       # path (peeled)
    df = pd.DataFrame(edges, columns=["s", "d"])
    ds = ray.data.from_pandas(df).repartition(4)

    exact = ktruss(ds, "s", "d", 4).to_pandas()
    exact_set = {tuple(r) for r in exact[["a", "b"]].to_numpy()}
    assert exact_set == set(combinations(range(5), 2))

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        capped = ktruss(ds, "s", "d", 4, max_degree=16).to_pandas()
    assert any("SUPERSET" in str(w.message) for w in rec)
    capped_set = {tuple(r) for r in capped[["a", "b"]].to_numpy()}
    # superset of the truth...
    assert capped_set >= exact_set
    # ...and the protected hub edges were exempt from peeling
    assert (hub, 200) in {(min(a, b), max(a, b))
                          for a, b in capped_set} or \
        (100, 200) in capped_set
    # unprotected path edges still peel
    assert (10, 11) not in capped_set and (11, 12) not in capped_set

    # below-cap graphs are IDENTICAL with the cap set high
    uncapped_hi = ktruss(ds, "s", "d", 4, max_degree=1000).to_pandas()
    assert {tuple(r) for r in uncapped_hi[["a", "b"]].to_numpy()} == \
        exact_set


def test_ktruss_driver_distributed_parity(ray_session):
    """The driver peel path (under driver_edge_cap) and the distributed
    loop must return IDENTICAL (a, b, support) sets -- with and without
    the max_degree protection."""
    from itertools import combinations

    import warnings as _w

    from ci_log_processing_ray.ops.iterative import ktruss

    edges = list(combinations(range(5), 2))
    edges += [(100, 200 + i) for i in range(32)]
    edges += [(200, 201), (201, 202), (10, 11), (11, 12), (12, 13)]
    ladder = [(i, i + 1) for i in range(30, 35)] + \
             [(i, i + 2) for i in range(30, 34)]
    edges += ladder
    df = pd.DataFrame(edges, columns=["s", "d"])
    ds = ray.data.from_pandas(df).repartition(4)

    def run(**kw):
        with _w.catch_warnings():
            _w.simplefilter("ignore")
            out = ktruss(ds, "s", "d", 3, **kw).to_pandas()
        return sorted(map(tuple, out[["a", "b", "support"]].to_numpy()))

    assert run() == run(driver_edge_cap=0)
    assert run(max_degree=8) == run(max_degree=8, driver_edge_cap=0)


def test_tree_driver_distributed_parity(ray_session):
    """tree_closure and tree_stats driver paths (under driver_edge_cap)
    must equal the distributed loops exactly on a random multi-root
    forest with duplicate edges and self loops, incl. max_depth."""
    rng = np.random.default_rng(3)
    # forest: parent of node i is a random smaller id (roots: i%17==0)
    nodes = np.arange(1, 400)
    parents = np.array([int(rng.integers(0, i)) for i in nodes])
    df = pd.DataFrame({"n": nodes, "p": parents})
    df = pd.concat([df, df.iloc[:40],
                    pd.DataFrame({"n": [7, 9], "p": [7, 9]})])
    ds = ray.data.from_pandas(df).repartition(4)

    from ci_log_processing_ray.ops.iterative import (tree_closure,
                                                     tree_stats)

    def norm(d):
        out = d.to_pandas()
        return sorted(map(tuple, out.to_numpy()))

    for kw in ({}, {"max_depth": 3}):
        a = norm(tree_closure(ds, "n", "p", **kw))
        b = norm(tree_closure(ds, "n", "p", driver_edge_cap=0, **kw))
        assert a == b, kw
    a = norm(tree_stats(ds, "n", "p"))
    b = norm(tree_stats(ds, "n", "p", driver_edge_cap=0))
    assert a == b


def test_frontier_driver_distributed_parity(ray_session):
    """bfs_hops / widest_paths / shortest_path_counts driver fast paths
    (under driver_edge_cap) must equal the distributed loops exactly on
    a random graph with multi-component structure, isolated seeds and a
    round budget that truncates."""
    from ci_log_processing_ray.ops.iterative import (bfs_hops,
                                                     shortest_path_counts,
                                                     widest_paths)

    rng = np.random.default_rng(9)
    e = pd.DataFrame({
        "s": rng.integers(0, 120, 500).astype(np.int64),
        "d": rng.integers(0, 120, 500).astype(np.int64),
        "w": rng.integers(1, 50, 500).astype(np.int64)})
    e = e[e["s"] != e["d"]].drop_duplicates(["s", "d"])
    ds = ray.data.from_pandas(e).repartition(4)
    seeds = ray.data.from_pandas(
        pd.DataFrame({"node": np.array([0, 7, 300], np.int64)}))

    def norm(d):
        return sorted(map(tuple, d.to_pandas().to_numpy()))

    for nr in (1, 3):
        a = norm(bfs_hops(ds, "s", "d", seeds, n_rounds=nr))
        b = norm(bfs_hops(ds, "s", "d", seeds, n_rounds=nr,
                          driver_edge_cap=0))
        assert a == b, ("bfs", nr)
        a = norm(widest_paths(ds, "s", "d", "w", seeds, n_rounds=nr))
        b = norm(widest_paths(ds, "s", "d", "w", seeds, n_rounds=nr,
                              driver_edge_cap=0))
        assert a == b, ("widest", nr)
        a = norm(shortest_path_counts(ds, "s", "d", seeds,
                                      n_rounds=nr))
        b = norm(shortest_path_counts(ds, "s", "d", seeds,
                                      n_rounds=nr, driver_edge_cap=0))
        assert a == b, ("counts", nr)


def test_knn_graph_driver_distributed_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from ci_log_processing_ray.ops.similarity import knn_graph

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((300, 12)).astype(np.float32)
    rows = [{"vid": int(i), "emb": vecs[i].tolist()}
            for i in range(len(vecs))]
    ds = ray.data.from_items(rows).repartition(4)

    def norm(df):
        return df.sort_values(["vid", "rank"]).reset_index(drop=True)

    drv = knn_graph(ds, "emb", "vid", k=3, block_rows=128).to_pandas()
    dist = knn_graph(ds, "emb", "vid", k=3, block_rows=128,
                     driver_cap=0).to_pandas()
    assert len(drv) == 3 * len(vecs)
    pd.testing.assert_frame_equal(norm(drv), norm(dist))


def test_knn_graph_ivf_driver_distributed_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from ci_log_processing_ray.ops.similarity import knn_graph_ivf

    rng = np.random.default_rng(6)
    vecs = rng.standard_normal((300, 12)).astype(np.float32)
    rows = [{"vid": int(i), "emb": vecs[i].tolist()}
            for i in range(len(vecs))]
    ds = ray.data.from_items(rows).repartition(4)

    def norm(df):
        return df.sort_values(["vid", "rank"]).reset_index(drop=True)

    drv = knn_graph_ivf(ds, "emb", "vid", k=3, n_centroids=8,
                        nprobe=3).to_pandas()
    dist = knn_graph_ivf(ds, "emb", "vid", k=3, n_centroids=8,
                         nprobe=3, driver_cap=0).to_pandas()
    assert len(drv) > 0
    pd.testing.assert_frame_equal(norm(drv), norm(dist))


def test_landmark_distances_parity(ray_session):
    import collections

    import numpy as np
    import pandas as pd
    import ray

    from ci_log_processing_ray.ops.iterative import landmark_distances

    rng = np.random.default_rng(3)
    src = rng.integers(0, 60, 300)
    dst = rng.integers(0, 60, 300)
    edges = ray.data.from_items(
        [{"s": int(a), "d": int(b)} for a, b in zip(src, dst)]
    ).repartition(4)
    lms = [0, 7, 33]

    def norm(df):
        return (df.sort_values(["landmark", "node"])
                .reset_index(drop=True).astype("int64"))

    drv = landmark_distances(edges, "s", "d", lms,
                             n_rounds=6).to_pandas()
    dist = landmark_distances(edges, "s", "d", lms, n_rounds=6,
                              driver_edge_cap=0).to_pandas()
    pd.testing.assert_frame_equal(norm(drv), norm(dist))

    # brute-force BFS reference
    adj = collections.defaultdict(set)
    for a, b in zip(src, dst):
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))
    rows = []
    for lm in lms:
        d = {lm: 0}
        fr = [lm]
        for r in range(1, 7):
            nxt = []
            for u in fr:
                for v in adj[u]:
                    if v not in d:
                        d[v] = r
                        nxt.append(v)
            fr = nxt
        rows += [{"node": n, "landmark": lm, "dist": dd}
                 for n, dd in d.items()]
    pd.testing.assert_frame_equal(norm(drv), norm(pd.DataFrame(rows)))


def test_count_min_contract_and_merge_invariance(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from ci_log_processing_ray.ops.sketch import count_min_estimates

    rng = np.random.default_rng(11)
    vals = [f"u{int(x)}" for x in rng.zipf(1.5, 4000) % 300]
    items = sorted(set(vals))
    true = pd.Series(vals).value_counts()
    est4 = count_min_estimates(
        ray.data.from_items([{"u": v} for v in vals]).repartition(4),
        "u", items, depth=4, width=256)
    # one-sided guarantee: never underestimates
    for item, est in zip(est4["item"], est4["est_count"]):
        assert est >= true[item]
    # merge invariance: identical estimates on a different partitioning
    est2 = count_min_estimates(
        ray.data.from_items([{"u": v} for v in vals]).repartition(2),
        "u", items, depth=4, width=256)
    pd.testing.assert_frame_equal(est4, est2)
    # a wide sketch on a small vocab is near-exact
    wide = count_min_estimates(
        ray.data.from_items([{"u": v} for v in vals]).repartition(4),
        "u", items, depth=4, width=8192)
    assert (wide["est_count"].to_numpy()
            == true[wide["item"]].to_numpy()).all()


def test_neighbor_agg_driver_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from ci_log_processing_ray.ops.iterative import neighbor_feature_agg

    rng = np.random.default_rng(4)
    src = rng.integers(0, 50, 250)
    dst = rng.integers(0, 50, 250)
    edges = ray.data.from_items(
        [{"s": int(a), "d": int(b)} for a, b in zip(src, dst)]
    ).repartition(4)
    feats = ray.data.from_items(    # subset: pins inner-merge semantics
        [{"n": int(i), "f": int(i * 3 + 1)} for i in range(0, 50, 2)]
    ).repartition(3)

    def norm(df):
        return (df.sort_values("node").reset_index(drop=True)
                .astype("int64"))

    drv = neighbor_feature_agg(edges, "s", "d", feats, "n",
                               "f").to_pandas()
    dist = neighbor_feature_agg(edges, "s", "d", feats, "n", "f",
                                driver_edge_cap=0).to_pandas()
    pd.testing.assert_frame_equal(norm(drv), norm(dist))


def test_assortativity_driver_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from ci_log_processing_ray.ops.iterative import degree_assortativity

    rng = np.random.default_rng(9)
    src = rng.integers(0, 40, 300)
    dst = rng.integers(0, 40, 300)
    edges = ray.data.from_items(
        [{"s": int(a), "d": int(b)} for a, b in zip(src, dst)]
    ).repartition(4)
    drv = degree_assortativity(edges, "s", "d").to_pandas()
    dist = degree_assortativity(edges, "s", "d",
                                driver_edge_cap=0).to_pandas()
    pd.testing.assert_frame_equal(drv, dist)


def test_component_stats_driver_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from ci_log_processing_ray.ops.iterative import component_stats

    rng = np.random.default_rng(10)
    src = rng.integers(0, 120, 200)
    dst = rng.integers(0, 120, 200)
    # self-loops + duplicate edges must not change the counts
    src = np.concatenate([src, [5, 5, 7]])
    dst = np.concatenate([dst, [5, 5, 7]])
    edges = ray.data.from_items(
        [{"s": int(a), "d": int(b)} for a, b in zip(src, dst)]
    ).repartition(4)

    def norm(df):
        return (df.sort_values("component").reset_index(drop=True)
                .astype("int64"))

    drv = component_stats(edges, "s", "d").to_pandas()
    dist = component_stats(edges, "s", "d",
                           driver_edge_cap=0).to_pandas()
    pd.testing.assert_frame_equal(norm(drv), norm(dist))


def test_modularity_driver_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from ci_log_processing_ray.ops.iterative import partition_modularity

    rng = np.random.default_rng(12)
    src = rng.integers(0, 60, 300)
    dst = rng.integers(0, 60, 300)
    edges = ray.data.from_items(
        [{"s": int(a), "d": int(b)} for a, b in zip(src, dst)]
    ).repartition(4)
    comm = ray.data.from_items(   # partial labeling: unlabeled nodes drop
        [{"n": int(i), "c": int(i % 7)} for i in range(0, 55)]
    ).repartition(3)

    def norm(df):
        return (df.sort_values("community").reset_index(drop=True)
                .astype("int64"))

    drv = partition_modularity(edges, "s", "d", comm, "n",
                               "c").to_pandas()
    dist = partition_modularity(edges, "s", "d", comm, "n", "c",
                                driver_edge_cap=0).to_pandas()
    pd.testing.assert_frame_equal(norm(drv), norm(dist))


def test_msf_driver_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from ci_log_processing_ray.ops.iterative import minimum_spanning_forest

    rng = np.random.default_rng(13)
    src = rng.integers(0, 80, 400)
    dst = rng.integers(0, 80, 400)
    w = rng.integers(1, 50, 400)     # duplicate weights: ties exercise
    edges = ray.data.from_items(
        [{"s": int(a), "d": int(b), "w": int(ww)}
         for a, b, ww in zip(src, dst, w)]).repartition(4)

    def norm(df):
        return (df.sort_values(["u", "v", "w"]).reset_index(drop=True)
                .astype("int64"))

    drv = minimum_spanning_forest(edges, "s", "d", "w").to_pandas()
    dist = minimum_spanning_forest(edges, "s", "d", "w",
                                   driver_edge_cap=0).to_pandas()
    pd.testing.assert_frame_equal(norm(drv), norm(dist))
    # forest invariants: acyclic cover with same total weight as a
    # reference Kruskal over the canonical edge list
    assert len(drv) == len(dist)


def test_kcore_driver_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from ci_log_processing_ray.ops.iterative import kcore_resident

    rng = np.random.default_rng(14)
    src = rng.integers(0, 70, 400)
    dst = rng.integers(0, 70, 400)
    edges = ray.data.from_items(
        [{"s": int(a), "d": int(b)} for a, b in zip(src, dst)]
    ).repartition(4)

    def norm(df):
        return (df.sort_values("node").reset_index(drop=True)
                .astype("int64"))

    drv = kcore_resident(edges, "s", "d")
    dist = kcore_resident(edges, "s", "d", driver_edge_cap=0)
    pd.testing.assert_frame_equal(norm(drv), norm(dist))


def test_sssp_driver_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from ci_log_processing_ray.ops.iterative import sssp_weighted_resident

    rng = np.random.default_rng(15)
    src = rng.integers(0, 70, 400)
    dst = rng.integers(0, 70, 400)
    w = rng.integers(1, 9, 400)
    edges = ray.data.from_items(
        [{"s": int(a), "d": int(b), "w": int(ww)}
         for a, b, ww in zip(src, dst, w)]).repartition(4)
    seeds = ray.data.from_items([{"node": 0}, {"node": 41}])

    def norm(df):
        return (df.sort_values("node").reset_index(drop=True)
                .astype("int64"))

    drv = sssp_weighted_resident(edges, "s", "d", "w", seeds,
                                 n_rounds=4)
    dist = sssp_weighted_resident(edges, "s", "d", "w", seeds,
                                  n_rounds=4, driver_edge_cap=0)
    pd.testing.assert_frame_equal(norm(drv), norm(dist))


def test_dbscan_driver_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from ci_log_processing_ray.ops.iterative import dbscan_grid

    rng = np.random.default_rng(16)
    # two dense blobs + sprinkled noise
    bx = np.concatenate([rng.integers(0, 40, 120),
                         rng.integers(500, 540, 120),
                         rng.integers(0, 1000, 40)])
    by = np.concatenate([rng.integers(0, 40, 120),
                         rng.integers(500, 540, 120),
                         rng.integers(0, 1000, 40)])
    pts = ray.data.from_items(
        [{"pid": int(i), "x": int(a), "y": int(b)}
         for i, (a, b) in enumerate(zip(bx, by))]).repartition(4)

    def norm(df):
        return (df.sort_values("pid").reset_index(drop=True)
                .astype("int64"))

    drv = dbscan_grid(pts, "pid", "x", "y", eps=15,
                      min_pts=4).to_pandas()
    dist = dbscan_grid(pts, "pid", "x", "y", eps=15, min_pts=4,
                       driver_point_cap=0).to_pandas()
    pd.testing.assert_frame_equal(norm(drv), norm(dist))


def test_random_walks_driver_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from ci_log_processing_ray.ops.iterative import (
        deterministic_random_walks)

    rng = np.random.default_rng(17)
    src = rng.integers(0, 50, 200)
    dst = rng.integers(0, 50, 200)
    edges = ray.data.from_items(
        [{"s": int(a), "d": int(b)} for a, b in zip(src, dst)]
    ).repartition(4)

    def norm(df):
        return (df.sort_values(["start", "step"])
                .reset_index(drop=True).astype("int64"))

    drv = deterministic_random_walks(edges, "s", "d",
                                     walk_len=5).to_pandas()
    dist = deterministic_random_walks(edges, "s", "d", walk_len=5,
                                      driver_edge_cap=0).to_pandas()
    pd.testing.assert_frame_equal(norm(drv), norm(dist))


def _stress_bruteforce(src, dst, sources, n_rounds):
    """Reference: enumerate shortest paths by BFS DAG DP per source;
    stress(v) = sum over s in sources, t reachable within n_rounds of
    sigma_st(v) = sigma_sv * sigma_vt for v strictly inside."""
    import collections

    import numpy as np

    adj = collections.defaultdict(set)
    for a, b in zip(src, dst):
        if a != b:
            adj[int(a)].add(int(b))
            adj[int(b)].add(int(a))
    total = collections.Counter()
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1}
        frontier = [s]
        for r in range(1, n_rounds + 1):
            nxt = {}
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        nxt[w] = nxt.get(w, 0) + sigma[u]
            for w, sg in nxt.items():
                dist[w] = r
                sigma[w] = sg
            frontier = list(nxt)
        # P(v): DAG descendant-path count, by descending level
        P = {v: 0 for v in dist}
        for v in sorted(dist, key=lambda q: -dist[q]):
            for w in adj[v]:
                if w in dist and dist[w] == dist[v] + 1:
                    P[v] += 1 + P[w]
        for v in dist:
            if v != s and sigma[v] * P[v] > 0:
                total[v] += sigma[v] * P[v]
    return dict(total)


def test_stress_centrality_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from ci_log_processing_ray.ops.iterative import stress_centrality

    rng = np.random.default_rng(18)
    src = rng.integers(0, 45, 180)
    dst = rng.integers(0, 45, 180)
    edges = ray.data.from_items(
        [{"s": int(a), "d": int(b)} for a, b in zip(src, dst)]
    ).repartition(4)
    sources = [0, 7, 21]

    def norm(df):
        return (df.sort_values("node").reset_index(drop=True)
                .astype("int64"))

    drv = stress_centrality(edges, "s", "d", sources,
                            n_rounds=5).to_pandas()
    dist = stress_centrality(edges, "s", "d", sources, n_rounds=5,
                             driver_edge_cap=0).to_pandas()
    pd.testing.assert_frame_equal(norm(drv), norm(dist))

    ref = _stress_bruteforce(src, dst, sources, 5)
    want = (pd.DataFrame({"node": list(ref), "stress": list(ref.values())})
            if ref else pd.DataFrame({"node": [], "stress": []}))
    pd.testing.assert_frame_equal(norm(drv), norm(want))


def test_bpe_driver_distributed_parity(ray_session):
    import pandas as pd
    import ray

    from ci_log_processing_ray.ops.curation import bpe_train

    texts = ["low lower lowest news newer widow window",
             "low low lowest wide widen window news",
             "newer news lower widow wide low"]
    ds = ray.data.from_items([{"t": s} for s in texts]).repartition(3)
    drv = bpe_train(ds, "t", n_merges=6).to_pandas()
    dist = bpe_train(ds, "t", n_merges=6,
                     driver_vocab_cap=0).to_pandas()
    pd.testing.assert_frame_equal(drv, dist)
    assert len(drv) == 6
