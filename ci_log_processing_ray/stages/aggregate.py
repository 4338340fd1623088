"""Aggregate stage: exact per-(sink, severity) document counts.

The conformance aggregate (A2, SURVEY.md 2.5): per-index document counts
that must equal the reference's bulk-insert counts exactly.  Implemented
as a SALTED TWO-PHASE aggregate to defuse hot-key skew (one hot CI job =
one huge sink):

  phase 1 (map_batches, no shuffle): pyarrow group_by inside each block
           -> one partial (sink, severity, count, tok_sum) row per key per
           block.  This is the combiner; the shuffle moves only partials.
  phase 2 (groupby().aggregate(Sum)): merges partials globally.  Since
           phase 1 already collapsed each block to O(#sinks x #severities)
           rows, the all-to-all exchange is trivially small regardless of
           input size -- the salt is the block id itself.

Returns a small Dataset: (sink, severity, doc_count, tok_sum).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum


def _partial_counts(batch: pa.Table) -> pa.Table:
    g = batch.group_by(["sink", "severity"]).aggregate(
        [("doc_id", "count"), ("n_tok", "sum")]
    )
    return pa.table({
        "sink": g["sink"],
        "severity": g["severity"],
        "doc_count": g["doc_id_count"],
        "tok_sum": g["n_tok_sum"],
    })


def sink_severity_counts(ds: ray.data.Dataset) -> ray.data.Dataset:
    partial = ds.map_batches(
        _partial_counts, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    return partial.groupby(["sink", "severity"]).aggregate(
        Sum("doc_count", alias_name="doc_count"),
        Sum("tok_sum", alias_name="tok_sum"),
    )
