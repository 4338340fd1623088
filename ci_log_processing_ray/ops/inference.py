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
