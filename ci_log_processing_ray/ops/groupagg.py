"""Order-sensitive and argmax-style grouped aggregates that Ray Data's
built-in aggregate set lacks: ordered string concatenation
(``string_agg(... ORDER BY ...)``) and per-group mode (most frequent
value, deterministic tie-break).

Both ride the coarse-bucket shuffle from ops/window.py so per-group
work is one vectorized kernel per hash bucket, never one dispatch per
distinct key.  ``mode_by_group`` additionally pre-aggregates
(group, value) counts inside ``map_batches`` before the shuffle, so the
exchange carries distinct pairs, not rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ci_log_processing_ray.ops.window import DEFAULT_GROUP_BUCKETS, bucketed_groups


def string_agg_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    order_col: str,
    *,
    sep: str = "|",
    out_col: str = "agg",
    n_buckets: int = DEFAULT_GROUP_BUCKETS,
) -> ray.data.Dataset:
    """SQL ``string_agg(value, sep ORDER BY order_col)`` per group.

    Partitioning assumption: one group's concatenated payload fits in a
    worker (same contract as SQL's string_agg itself)."""

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, order_col], kind="mergesort")
        agg = g.groupby(group_col, sort=False)[value_col].agg(sep.join)
        return pd.DataFrame({group_col: agg.index.to_numpy(),
                             out_col: agg.to_numpy()})

    return bucketed_groups(ds, group_col, kern, n_buckets=n_buckets)


def mode_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    *,
    out_col: str = "mode",
    n_buckets: int = DEFAULT_GROUP_BUCKETS,
) -> ray.data.Dataset:
    """Per-group mode with deterministic ties (highest count, then
    smallest value).  Output: group, ``out_col`` (the winning value),
    ``n`` (its count)."""

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({
            group_col: t[group_col].combine_chunks(),
            value_col: t[value_col].combine_chunks(),
            "_n": pa.array(np.ones(len(t), dtype=np.int64)),
        })
        g = tt.group_by([group_col, value_col]).aggregate([("_n", "sum")])
        return pa.table({group_col: g[group_col], value_col: g[value_col],
                         "_n": g["_n_sum"]})

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.groupby([group_col, value_col], sort=False)["_n"].sum()
              .reset_index())
        g = g.sort_values([group_col, "_n", value_col],
                          ascending=[True, False, True], kind="mergesort")
        first = g.drop_duplicates(group_col, keep="first")
        return pd.DataFrame({group_col: first[group_col].to_numpy(),
                             out_col: first[value_col].to_numpy(),
                             "n": first["_n"].to_numpy()})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return bucketed_groups(partials, group_col, pick, n_buckets=n_buckets)
