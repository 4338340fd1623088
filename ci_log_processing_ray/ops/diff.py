"""Snapshot diff (CDC-style): classify each key across two dataset
versions as added / removed / changed / unchanged.

The standard operation between two crawls or corpus releases: ONE
full-outer hash join on the key carrying only (key, presence flag,
compare column) -- never the payload -- then a pure vectorized
classification map.  Keys present only in the new snapshot are
``added``, only in the old are ``removed``, present in both with a
differing compare column are ``changed``.  A null compare value on
both sides compares as unchanged (SQL ``<>`` semantics: NULL <> NULL
is not TRUE).

At scale, pass a precomputed fingerprint (e.g.
``ops/textstats.py:fingerprint``) as ``cmp_col`` instead of a raw text
column so the exchange ships fixed-width hashes, not documents.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def snapshot_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    key_col: str,
    cmp_col: str,
    *,
    keep_unchanged: bool = False,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Returns (key_col, status) with status in
    {'added', 'removed', 'changed'} (+ 'unchanged' if kept)."""

    def tag(suffix: str):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            return pa.table({
                key_col: t[key_col].combine_chunks(),
                f"_cmp_{suffix}": t[cmp_col].combine_chunks(),
                f"_in_{suffix}": pa.nulls(n, pa.int8()).fill_null(1)})
        return fn

    o = old.map_batches(tag("old"), batch_format="pyarrow",
                        zero_copy_batch=True)
    n = new.map_batches(tag("new"), batch_format="pyarrow",
                        zero_copy_batch=True)
    # Ray's full_outer coalesces the key pair into the left key name
    j = n.join(o, "full_outer", num_partitions=num_partitions,
               on=(key_col,), right_on=(key_col,))

    def classify(t: pa.Table) -> pa.Table:
        in_new = pc.is_valid(t["_in_new"].combine_chunks())
        in_old = pc.is_valid(t["_in_old"].combine_chunks())
        ne = pc.fill_null(pc.not_equal(t["_cmp_new"].combine_chunks(),
                                       t["_cmp_old"].combine_chunks()),
                          False)
        status = pc.if_else(
            pc.invert(in_old), pa.scalar("added"),
            pc.if_else(pc.invert(in_new), pa.scalar("removed"),
                       pc.if_else(ne, pa.scalar("changed"),
                                  pa.scalar("unchanged"))))
        out = pa.table({key_col: t[key_col].combine_chunks(),
                        "status": status})
        if keep_unchanged:
            return out
        return out.filter(pc.not_equal(status, "unchanged"))

    return j.map_batches(classify, batch_format="pyarrow")
