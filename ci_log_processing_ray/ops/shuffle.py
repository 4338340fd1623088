"""Deterministic epoch shuffle: assign every row a global position in a
pseudo-random but reproducible training order.

LLM pretraining wants a different, *reproducible* global order per
epoch.  Sorting by a keyed content hash gives exactly that -- same
seed, same order, on any cluster size -- and the global position falls
out of the same two-pass prefix-sum used by ops/pack.py:

  1. shuffle_key = md5(seed || id) per row (pure map, C-speed digest);
     the first two hex chars define 256 ORDER-PRESERVING range buckets
     (hex prefix ranges partition the lexicographic key order, and the
     keys are uniform, so buckets balance by construction);
  2. per-bucket counts -> driver prefix sum (256 ints) -> bucket bases;
  3. per-bucket sort by (key, id) + arange + base = global 1-based
     position.  No global sort operator, no skew.

Partitioning assumption: one bucket (~rows/256) fits in a worker.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _md5_keys(ids: np.ndarray, prefix: str) -> np.ndarray:
    """md5 hex key per id; ids stringify with str() so string ids work
    too (for ints this matches SQL's CAST(id AS VARCHAR))."""
    md5 = hashlib.md5
    return np.array(
        [md5((prefix + str(i)).encode()).hexdigest() for i in ids],
        dtype=object)


def epoch_shuffle(
    ds: ray.data.Dataset,
    id_col: str,
    *,
    seed: str = "",
    n_buckets: int = 256,
) -> ray.data.Dataset:
    """Global deterministic shuffle order: (id, pos) with pos the
    1-based rank of md5(seed||id) (ties broken by id; md5 collisions do
    not occur in practice, the tie-break just pins determinism).

    ``n_buckets`` must divide 256 evenly into hex-prefix ranges."""
    per_prefix = 256 // n_buckets

    def add_key(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        keys = _md5_keys(ids, seed)
        buckets = np.array([int(k[:2], 16) for k in keys],
                           dtype=np.int64) // per_prefix
        return pa.table({id_col: pa.array(ids),
                         "_key": pa.array(keys, type=pa.string()),
                         "_b": pa.array(buckets)})

    keyed = ds.map_batches(add_key, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    # pass 1: bucket counts (n_buckets ints reach the driver)
    counts = keyed.groupby("_b").count().to_pandas()
    counts = counts.sort_values("_b")
    bases = np.zeros(n_buckets + 1, dtype=np.int64)
    cum = np.cumsum(counts["count()"].to_numpy())
    for i, b in enumerate(counts["_b"].to_numpy()):
        bases[int(b)] = cum[i] - counts["count()"].to_numpy()[i]
    bases_ref = ray.put(bases)

    # pass 2: in-bucket sort + base offset = global position
    def assign(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(bases_ref)[int(g["_b"].iloc[0])]
        g = g.sort_values(["_key", id_col], kind="mergesort")
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "pos": base + np.arange(1, len(g) + 1, dtype=np.int64),
        })

    return keyed.groupby("_b").map_groups(assign, batch_format="pandas")
