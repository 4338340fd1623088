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


def merge_upsert(
    base: ray.data.Dataset,
    updates: ray.data.Dataset,
    key_cols: list[str],
    value_cols: list[str],
    *,
    delete_col: str | None = None,
) -> ray.data.Dataset:
    """SQL ``MERGE INTO`` semantics: apply ``updates`` onto ``base`` by
    key -- matched keys take the update's values, unmatched update keys
    insert, and rows whose update has ``delete_col`` true disappear.
    Exactly one output row per surviving key (update keys must be
    unique; base keys must be unique).

    Scale shape: no driver-side state -- the two inputs union with an
    int64 source-priority column and compact through the bucketed
    argmax-per-key kernel (``ops/groupagg.py:last_by_group``): one
    key-hash exchange carrying key + values, then a vectorized delete
    filter.  This is the compaction step of an incremental corpus
    refresh."""
    from .groupagg import last_by_group

    cols = key_cols + value_cols

    def tag(prio: int):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            out = {c: t[c] for c in cols}
            out["_prio"] = pa.array([prio] * n, pa.int64())
            if delete_col is not None:
                out["_del"] = (
                    pc.cast(t[delete_col].combine_chunks(), pa.int64())
                    if prio else pa.array([0] * n, pa.int64()))
            return pa.table(out)
        return fn

    tagged = (base.map_batches(tag(0), batch_format="pyarrow",
                               zero_copy_batch=True)
              .union(updates.map_batches(tag(1), batch_format="pyarrow",
                                         zero_copy_batch=True)))
    keep = value_cols + (["_del"] if delete_col is not None else [])
    merged = last_by_group(tagged, key_cols, ["_prio"], keep, keep="last")
    if delete_col is None:
        return merged.select_columns(cols)
    return (merged.filter(expr="_del == 0")
            .select_columns(cols))


def delta_aggregate(
    view: ray.data.Dataset,
    delta: ray.data.Dataset,
    key_cols: list[str],
    *,
    count_col: str = "n",
    sum_cols: tuple[str, ...] = (),
    op_col: str = "op",
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Incremental view maintenance for a grouped COUNT/SUM view:
    apply an insert/delete delta stream (``op_col`` = +1 insert,
    -1 delete/retraction) to a previously materialized aggregate
    WITHOUT rescanning the base data -- the streaming-refresh
    primitive.  ``view`` carries ``key_cols + count_col + sum_cols``
    (the old aggregate rows); ``delta`` carries ``key_cols + op_col``
    plus, for each sum column, a SAME-NAMED per-row value column.
    Groups whose maintained count reaches zero are dropped; a negative
    count (a delete with no matching base rows) raises rather than
    silently corrupting the view.

    Scale design: delta rows collapse to per-block (key -> sum(op),
    sum(op*value)) partials inside ``map_batches``, then ONE bucketed
    exchange over view-rows + delta-partials -- cost scales with view
    size + delta distinct keys, never with the base row count the view
    summarizes."""
    import numpy as np
    import pandas as pd

    from ci_log_processing_ray.ops.window import bucketed_groups

    sums = list(sum_cols)
    agg_cols = [count_col] + sums

    def dpart(t: pa.Table) -> pa.Table:
        op = pc.cast(t[op_col].combine_chunks(), pa.int64())
        cols = {k: t[k].combine_chunks() for k in key_cols}
        cols[count_col] = op
        for s in sums:
            cols[s] = pc.multiply(
                op, pc.cast(t[s].combine_chunks(), pa.int64()))
        tt = pa.table(cols)
        g = tt.group_by(key_cols).aggregate(
            [(c, "sum") for c in agg_cols])
        return pa.table({**{k: g[k] for k in key_cols},
                         **{c: g[f"{c}_sum"] for c in agg_cols}})

    def tidy(t: pa.Table) -> pa.Table:
        return pa.table({
            **{k: t[k].combine_chunks() for k in key_cols},
            **{c: pc.cast(t[c].combine_chunks(), pa.int64())
               for c in agg_cols}})

    dp = delta.map_batches(dpart, batch_format="pyarrow",
                           zero_copy_batch=True)
    both = view.map_batches(tidy, batch_format="pyarrow",
                            zero_copy_batch=True).union(dp)

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key_cols, as_index=False, sort=False)[
            agg_cols].sum()
        neg = out[count_col].to_numpy(np.int64) < 0
        if neg.any():
            bad = out[key_cols][neg].iloc[0].to_dict()
            raise ValueError(
                f"delta_aggregate: maintained count went negative at"
                f" key {bad} -- delete without matching base rows")
        return out[out[count_col].to_numpy(np.int64) > 0]

    return bucketed_groups(both, key_cols[0], kern, n_buckets=n_buckets)
