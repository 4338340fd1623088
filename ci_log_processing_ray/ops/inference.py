"""Batched model-inference stages (the quality-model scoring step of a
training-data curation pipeline).

The real model libraries (torch / transformers / fasttext) are NOT in
this environment, so the model is a clearly-marked deterministic stub
-- a seeded random projection over hashed token features.  Everything
around it is the real at-scale shape and is what these classes
demonstrate:

* the model loads ONCE per actor in ``__init__`` (never per batch);
* inference is batched -- one matrix multiply per batch, sized by
  ``batch_size`` so batch x concurrency fits the worker heap;
* feature extraction is vectorized (hashed bag-of-words, no Python
  token loop beyond the split);
* output is a plain float score column, streamed -- scoring never
  materializes the corpus.

Swap ``_StubModel`` for a real model (ONNX session, torch module) and
nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_FEATURE_DIM = 256


class _StubModel:
    """Deterministic stand-in for a quality classifier: a fixed random
    projection + logistic squash.  Loading cost is simulated only by
    the weight allocation; outputs are reproducible across runs and
    partitionings."""

    def __init__(self, seed: int):
        rng = np.random.default_rng(seed)
        self.w = rng.standard_normal(_FEATURE_DIM)
        self.b = float(rng.standard_normal())

    def predict(self, feats: np.ndarray) -> np.ndarray:
        z = feats @ self.w + self.b
        return 1.0 / (1.0 + np.exp(-z))


def _hashed_bow(texts: list[str]) -> np.ndarray:
    """Vectorized hashed bag-of-words featurizer: one hash_array call
    over the flattened token stream, scatter-add into the feature
    matrix, l2 normalize."""
    words_per_doc = [t.lower().split() for t in texts]
    lens = np.fromiter((len(w) for w in words_per_doc), dtype=np.int64,
                       count=len(texts))
    feats = np.zeros((len(texts), _FEATURE_DIM))
    total = int(lens.sum())
    if total == 0:
        return feats
    flat = np.empty(total, dtype=object)
    pos = 0
    for w in words_per_doc:
        if w:
            flat[pos:pos + len(w)] = w
            pos += len(w)
    h = pd.util.hash_array(flat) % _FEATURE_DIM
    doc_idx = np.repeat(np.arange(len(texts)), lens)
    np.add.at(feats, (doc_idx, h.astype(np.int64)), 1.0)
    norms = np.linalg.norm(feats, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return feats / norms


class QualityScorer:
    """Actor-pool stage: text -> model quality score in [0, 1]."""

    def __init__(self, text_col: str, id_col: str, seed: int = 1234):
        self.text_col, self.id_col = text_col, id_col
        self.model = _StubModel(seed)  # once per actor

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = _hashed_bow(t[self.text_col].to_pylist())
        scores = self.model.predict(feats)
        return pa.table({
            self.id_col: t[self.id_col],
            "model_score": pa.array(scores, type=pa.float64()),
        })


def score_texts(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    seed: int = 1234,
    concurrency=(1, 4),
    batch_size: int = 1024,
) -> ray.data.Dataset:
    """Score every document with the (stub) quality model: actor pool,
    model in ``__init__``, one matmul per batch."""
    return ds.map_batches(
        QualityScorer, fn_constructor_args=(text_col, id_col, seed),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


def filter_by_score(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    threshold: float,
    seed: int = 1234,
) -> ray.data.Dataset:
    """Model-gated filter (score inline, keep passing rows WITH their
    payload): the fused form a curation pipeline uses so the text
    column never takes a second trip through the object store."""

    class ScoreAndFilter(QualityScorer):
        def __call__(self, t: pa.Table) -> pa.Table:
            feats = _hashed_bow(t[self.text_col].to_pylist())
            keep = self.model.predict(feats) >= threshold
            return t.filter(pa.array(keep))

    return ds.map_batches(
        ScoreAndFilter, fn_constructor_args=(text_col, id_col, seed),
        batch_format="pyarrow", batch_size=1024, concurrency=(1, 4),
        num_cpus=1)


def isotonic_calibrate(
    ds: "ray.data.Dataset",
    score_col: str,
    label_col: str,
    *,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Distributed isotonic regression (pool-adjacent-violators) of a
    binary label on an int64 score -- the calibration step that turns
    a quality classifier's raw scores into monotone empirical
    probabilities before thresholding a corpus on them.

    Output: one row per fitted level set, ordered by score:
    (block_id, score_lo, score_hi, pos, n, rate_permille =
    1000*pos//n), with the fitted rates pos/n STRICTLY increasing as
    exact rationals (rate_permille is their floored display and may
    tie) -- the exact least-squares monotone fit in canonical
    (maximally-merged) form.

    Scale shape (3 stages, each exact):
    1. per-score sufficient stats: one bucketed exchange collapses the
       corpus to (score, pos, n) -- distinct-score-sized, the same
       pre-shuffle collapse every sketch op here uses;
    2. RANGE-partitioned local PAV: equi-width range buckets on score
       (contiguous score intervals, the rank_global machinery), one
       stack-PAV kernel per bucket over its sorted points -> level-set
       blocks.  Pooling adjacent violators is always optimal (the
       classic PAV invariant), so local pooling never diverges from
       the global fit;
    3. driver stack-merge of the per-bucket block lists in score
       order -- identical to resuming the sequential algorithm on
       pre-pooled blocks, O(total blocks) work.  Blocks are level
       sets: bounded by distinct scores and in practice tiny; quantize
       scores upstream to bound it hard (the calibration contract).

    Not SQL-expressible (sequential pooling recurrence) -- verified by
    parity against a reference sequential PAV and closed-form tests.
    """
    import pyarrow.compute as pc

    from ci_log_processing_ray.ops.window import (bucketed_sum,
                                                  resolve_group_buckets)

    n_buckets = resolve_group_buckets(n_buckets)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "score": t[score_col].combine_chunks().cast(pa.int64()),
            "pos": t[label_col].combine_chunks().cast(pa.int64()),
            "n": pa.array(np.ones(len(t), np.int64))})

    stats = bucketed_sum(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["score"], ["pos", "n"], n_buckets=n_buckets).materialize()

    from ray.data.aggregate import Max, Min

    mm = stats.aggregate(Min("score"), Max("score"))
    lo, hi = int(mm["min(score)"]), int(mm["max(score)"])
    width = max((hi - lo) // n_buckets + 1, 1)

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_b", pc.divide(pc.cast(pc.subtract(
                t["score"].combine_chunks(), lo), pa.int64()),
                pa.scalar(width, pa.int64())))

    def _stack_pav(scores_lo, scores_hi, pos, n):
        """Stack PAV over blocks already sorted by score; merges on
        rate_left >= rate_right (canonical maximal merge).  Rational
        compare via cross-multiplication -- no floats."""
        out = []  # [lo, hi, pos, n]
        for i in range(len(pos)):
            out.append([scores_lo[i], scores_hi[i],
                        int(pos[i]), int(n[i])])
            while (len(out) > 1
                   and out[-2][2] * out[-1][3]
                   >= out[-1][2] * out[-2][3]):
                _blo, bhi, bp, bn = out.pop()
                out[-1][1] = max(out[-1][1], bhi)  # keep left lo
                out[-1][2] += bp
                out[-1][3] += bn
        return out

    def local_pav(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("score", kind="mergesort")
        s = g["score"].to_numpy(np.int64)
        blocks = _stack_pav(s, s, g["pos"].to_numpy(np.int64),
                            g["n"].to_numpy(np.int64))
        b = np.asarray(blocks, dtype=np.int64).reshape(-1, 4)
        return pd.DataFrame({
            "_b": np.full(len(b), np.int64(g["_b"].iloc[0])),
            "score_lo": b[:, 0], "score_hi": b[:, 1],
            "pos": b[:, 2], "n": b[:, 3]})

    local = (stats.map_batches(add_bucket, batch_format="pyarrow",
                               zero_copy_batch=True)
             .groupby("_b").map_groups(local_pav,
                                       batch_format="pandas")
             .to_pandas())
    local = local.sort_values(["_b", "score_lo"], kind="mergesort")
    final = _stack_pav(local["score_lo"].to_numpy(np.int64),
                       local["score_hi"].to_numpy(np.int64),
                       local["pos"].to_numpy(np.int64),
                       local["n"].to_numpy(np.int64))
    fb = np.asarray(final, dtype=np.int64).reshape(-1, 4)
    import ray

    return ray.data.from_arrow(pa.table({
        "block_id": pa.array(np.arange(len(fb), dtype=np.int64)),
        "score_lo": pa.array(fb[:, 0]),
        "score_hi": pa.array(fb[:, 1]),
        "pos": pa.array(fb[:, 2]),
        "n": pa.array(fb[:, 3]),
        "rate_permille": pa.array(1000 * fb[:, 2] // fb[:, 3])}))
