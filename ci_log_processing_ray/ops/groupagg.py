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
import pyarrow.compute as pc

import ray.data

from ci_log_processing_ray.ops.window import bucketed_groups


def string_agg_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    order_col: str,
    *,
    sep: str = "|",
    out_col: str = "agg",
    n_buckets: int | None = None,
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
    n_buckets: int | None = None,
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


def rollup_counts(
    ds: ray.data.Dataset,
    dims: list[str],
    count_name: str,
    sum_col: str | None = None,
    sum_name: str | None = None,
) -> pd.DataFrame:
    """SQL ``GROUP BY ROLLUP(dims...)``: counts (and an optional sum)
    at every rollup level, super-aggregate rows carrying NULL dims.

    Single shuffle: ONE distributed aggregate at the finest level (its
    cardinality is the product of dim cardinalities -- driver-sized by
    construction), then the coarser levels re-aggregate that small
    frame locally.  Never re-scans the data per level."""
    from ray.data.aggregate import Count, Sum

    aggs = [Count(alias_name=count_name)]
    if sum_col:
        aggs.append(Sum(sum_col, alias_name=sum_name or f"sum_{sum_col}"))
    finest = ds.groupby(dims).aggregate(*aggs).to_pandas()
    val_cols = [c for c in finest.columns if c not in dims]
    levels = [finest]
    for lvl in range(len(dims) - 1, -1, -1):
        keep = dims[:lvl]
        if keep:
            g = finest.groupby(keep, as_index=False)[val_cols].sum()
        else:
            g = finest[val_cols].sum().to_frame().T
        for d in dims[lvl:]:
            g[d] = None
        levels.append(g[dims + val_cols])
    out = pd.concat(levels, ignore_index=True)[dims + val_cols]
    for c in val_cols:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(dims + val_cols, na_position="first").reset_index(
        drop=True)


def cube_counts(
    ds: ray.data.Dataset,
    dims: list[str],
    count_name: str,
    sum_col: str | None = None,
    sum_name: str | None = None,
) -> pd.DataFrame:
    """SQL ``GROUP BY CUBE(dims...)``: aggregates for every subset of
    the dims, super-aggregate rows carrying NULL for absent dims.

    Same single-shuffle plan as :func:`rollup_counts`: ONE distributed
    aggregate at the finest level (cardinality = product of dim
    cardinalities, driver-sized by construction), then each of the
    2^d - 1 coarser subsets re-aggregates that small frame locally --
    the data is scanned once no matter how many subsets CUBE expands
    to."""
    from itertools import combinations

    from ray.data.aggregate import Count, Sum

    aggs = [Count(alias_name=count_name)]
    if sum_col:
        aggs.append(Sum(sum_col, alias_name=sum_name or f"sum_{sum_col}"))
    finest = ds.groupby(dims).aggregate(*aggs).to_pandas()
    val_cols = [c for c in finest.columns if c not in dims]
    levels = [finest]
    for r in range(len(dims) - 1, -1, -1):
        for keep in combinations(dims, r):
            keep = list(keep)
            if keep:
                g = finest.groupby(keep, as_index=False)[val_cols].sum()
            else:
                g = finest[val_cols].sum().to_frame().T
            for d in dims:
                if d not in keep:
                    g[d] = None
            levels.append(g[dims + val_cols])
    out = pd.concat(levels, ignore_index=True)[dims + val_cols]
    for c in val_cols:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(dims + val_cols, na_position="first").reset_index(
        drop=True)


def corr_suffstats_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
) -> ray.data.Dataset:
    """Exact sufficient statistics for covariance / correlation / OLS
    per group: ``n, sum_x, sum_y, sum_xx, sum_yy, sum_xy`` -- all int64,
    so the result is bit-exact and order-independent (float covariance
    depends on reduction order and would break cross-engine hashing).
    Callers derive the moments downstream: ``cov*n^2 = n*sxy - sx*sy``,
    ``var_x*n^2 = n*sxx - sx^2``, slope = cov/var_x, etc.

    Inputs must be integer-valued (floor/round upstream); the op casts
    to int64 and fails loudly on fractional values rather than silently
    truncating.

    Scale shape: each block pre-aggregates to one row per distinct key
    (seven int64s), so the single exchange is bounded by per-block key
    cardinality -- the classic combiner plan; partials merge by plain
    summation at any tree depth."""
    from ray.data.aggregate import Sum

    stat_cols = ["n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(t[x_col].combine_chunks(), pa.int64())
        y = pc.cast(t[y_col].combine_chunks(), pa.int64())
        tt = pa.table({
            group_col: t[group_col],
            "n": pa.array(np.ones(len(t), np.int64)),
            "sum_x": x, "sum_y": y,
            "sum_xx": pc.multiply_checked(x, x),
            "sum_yy": pc.multiply_checked(y, y),
            "sum_xy": pc.multiply_checked(x, y),
        })
        g = tt.group_by([group_col]).aggregate(
            [(c, "sum") for c in stat_cols])
        return pa.table({group_col: g[group_col],
                         **{c: g[f"{c}_sum"] for c in stat_cols}})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return partials.groupby(group_col).aggregate(
        *[Sum(c, alias_name=c) for c in stat_cols])


def minmax_scale_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    x_col: str,
    *,
    out_col: str = "scaled",
    scale: int = 1000,
) -> ray.data.Dataset:
    """Per-group min-max feature scaling to exact integers in
    ``[0, scale]``: ``(x - min) * scale // (max - min)`` (0 for a
    constant group) -- the normalization step of an ML feature
    pipeline, bit-exact so it cross-checks against a SQL window oracle.

    Two passes, no row shuffle: a per-group (min, max) aggregate
    (partials combine inside each block first, so the exchange is
    bounded by group cardinality), broadcast once via ``ray.put``,
    then a pure vectorized map appends ``out_col`` to every block.
    ``x_col`` must be int64."""
    from ray.data.aggregate import Max, Min

    band = (ds.groupby(group_col)
            .aggregate(Min(x_col, alias_name="mn"),
                       Max(x_col, alias_name="mx"))
            .to_pandas().sort_values(group_col))
    band_ref = ray.put((band[group_col].to_numpy().astype(object),
                        band["mn"].to_numpy().astype(np.int64),
                        band["mx"].to_numpy().astype(np.int64)))

    def apply(t: pa.Table) -> pa.Table:
        keys, mn, mx = ray.get(band_ref)
        g = t[group_col].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys, g)
        x = t[x_col].combine_chunks().to_numpy()
        span = mx[idx] - mn[idx]
        out = np.where(span == 0, 0,
                       (x - mn[idx]) * scale // np.where(span == 0, 1, span))
        return t.append_column(out_col, pa.array(out, pa.int64()))

    return ds.map_batches(apply, batch_format="pyarrow",
                          zero_copy_batch=True)


def last_by_group(
    ds: ray.data.Dataset,
    group_cols: str | list[str],
    order_cols: list[str],
    keep_cols: list[str],
    *,
    keep: str = "last",
) -> ray.data.Dataset:
    """Latest (``keep='last'``) or earliest (``keep='first'``) row per
    group (the CDC / upsert-compaction primitive): the row with the
    max/min ``order_cols`` tuple per group, deterministic when the
    tuple is unique.  Mergeable argmax partials: each batch keeps its
    per-group winner BEFORE the shuffle, so the exchange carries at
    most (distinct groups) rows per block.  Composite groups bucket on
    the first group column (the rest ride along)."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    cols = groups + [c for c in order_cols if c not in groups] + [
        c for c in keep_cols if c not in order_cols + groups]
    asc = keep == "first"

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(groups + order_cols,
                          ascending=[True] * len(groups)
                          + [asc] * len(order_cols),
                          kind="mergesort")
        return g.drop_duplicates(groups, keep="first")[cols]

    partials = ds.map_batches(
        lambda t: partial(t.to_pandas()), batch_format="pyarrow")
    return bucketed_groups(partials, groups[0], partial)


def presence_set_op(
    ds: ray.data.Dataset,
    key_cols: list[str],
    flag_col: str,
    include: tuple[str, ...],
    exclude: tuple[str, ...],
) -> ray.data.Dataset:
    """Distinct-key INTERSECT / EXCEPT over one pass: keys whose rows
    cover every ``include`` value of ``flag_col`` and none of the
    ``exclude`` values.  Per-batch distinct (key, value) partials, one
    small shuffle bounded by keys x tracked values, then a C-level
    presence pivot per bucket -- no per-group Python."""
    vals = list(include) + list(exclude)

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_in(t[flag_col].combine_chunks(),
                        value_set=pa.array(vals, type=pa.string()))
        sub = t.select(key_cols + [flag_col]).filter(keep)
        # distinct (key, value) pairs per batch: the exchange carries at
        # most |keys| x |vals| rows per block, never the raw rows
        return sub.group_by(key_cols + [flag_col]).aggregate([])

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        fl = g[flag_col].to_numpy()
        for v in vals:
            g[f"_has_{v}"] = fl == v
        agg = g.groupby(key_cols, as_index=False)[
            [f"_has_{v}" for v in vals]].max()
        ok = np.ones(len(agg), dtype=bool)
        for v in include:
            ok &= agg[f"_has_{v}"].to_numpy()
        for v in exclude:
            ok &= ~agg[f"_has_{v}"].to_numpy()
        return agg.loc[ok, key_cols].reset_index(drop=True)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return bucketed_groups(partials, key_cols[0], finish)


def retention_cohorts(
    ds: ray.data.Dataset,
    user_col: str,
    ts_col: str,
    *,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Cohort retention: distinct users active per (cohort_day,
    day_offset), where a user's cohort is their first active day.

    Shape: batches pre-shrink to distinct (user, day) pairs, ONE
    user-keyed bucketed shuffle co-locates each user's full history,
    and the per-bucket kernel both derives cohorts (per-user min day)
    and counts (cohort, offset) pairs LOCALLY -- each user lives
    wholly in one bucket, so bucket partials sum to exact distinct-user
    counts in a final tiny groupby.  The exchange carries distinct
    (user, day) pairs, never events."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def day_pairs(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(
            pc.cast(t[ts_col].combine_chunks(), pa.timestamp("us")),
            unit="day")
        tt = pa.table({user_col: t[user_col], "day": day})
        g = tt.group_by([user_col, "day"]).aggregate([])
        return g

    pairs = ds.map_batches(day_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([user_col, "day"])
        cohort = g.groupby(user_col)["day"].transform("min")
        off = ((g["day"].to_numpy() - cohort.to_numpy())
               / np.timedelta64(1, "D")).astype(np.int64)
        out = (pd.DataFrame({"cohort": cohort.to_numpy(),
                             "day_offset": off})
               .value_counts(["cohort", "day_offset"])
               .rename("n_users").reset_index())
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    partials = bucketed_groups(pairs, user_col, kern, n_buckets=n_buckets)
    return partials.groupby(["cohort", "day_offset"]).aggregate(
        Sum("n_users", alias_name="n_users"))


def target_encode_loo(
    ds: ray.data.Dataset,
    cat_col: str,
    target_col: str,
    *,
    num_col: str = "loo_num",
    den_col: str = "loo_den",
) -> ray.data.Dataset:
    """Leave-one-out target encoding, the category-feature primitive:
    for every row, the mean of ``target_col`` over the OTHER rows of
    its category, emitted as the exact integer rational
    ``(sum_g - x, n_g - 1)`` (numerator/denominator columns -- no
    float division, so the result is bit-exact and cross-engine
    hashable; singleton categories get (0, 0)).

    Two passes, no row shuffle: a category-cardinality (sum, n)
    aggregate (combined per block first) broadcasts via ``ray.put``;
    a pure vectorized map appends the two columns.  ``target_col``
    must be int64."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({
            cat_col: t[cat_col],
            "_s": pc.cast(t[target_col].combine_chunks(), pa.int64()),
            "_n": pa.array(np.ones(len(t), np.int64)),
        })
        g = tt.group_by(cat_col).aggregate([("_s", "sum"), ("_n", "sum")])
        return pa.table({cat_col: g[cat_col], "_s": g["_s_sum"],
                         "_n": g["_n_sum"]})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(cat_col)
           .aggregate(Sum("_s", alias_name="s"),
                      Sum("_n", alias_name="n"))
           .to_pandas().sort_values(cat_col))
    ref = ray.put((agg[cat_col].to_numpy().astype(object),
                   agg["s"].to_numpy().astype(np.int64),
                   agg["n"].to_numpy().astype(np.int64)))

    def apply(t: pa.Table) -> pa.Table:
        keys, s, n = ray.get(ref)
        g = t[cat_col].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys, g)
        x = pc.cast(t[target_col].combine_chunks(), pa.int64()).to_numpy()
        den = n[idx] - 1
        num = np.where(den == 0, 0, s[idx] - x)
        t = t.append_column(num_col, pa.array(num, pa.int64()))
        return t.append_column(den_col,
                               pa.array(np.maximum(den, 0), pa.int64()))

    return ds.map_batches(apply, batch_format="pyarrow",
                          zero_copy_batch=True)


def grouping_sets_counts(
    ds: ray.data.Dataset,
    dims: list[str],
    sets: list[list[str]],
    count_name: str,
    sum_col: str | None = None,
    sum_name: str | None = None,
) -> pd.DataFrame:
    """SQL ``GROUP BY GROUPING SETS ((...), (...))``: aggregates for an
    ARBITRARY list of dim subsets, super-aggregate rows carrying NULL
    for absent dims -- the generalization the ROLLUP/CUBE helpers
    specialize.

    Same single-shuffle plan: ONE distributed aggregate at the finest
    level (product of dim cardinalities, driver-sized by construction),
    then each requested subset re-aggregates that small frame locally;
    the data is scanned once regardless of how many sets are asked."""
    from ray.data.aggregate import Count, Sum

    aggs = [Count(alias_name=count_name)]
    if sum_col:
        aggs.append(Sum(sum_col, alias_name=sum_name or f"sum_{sum_col}"))
    finest = ds.groupby(dims).aggregate(*aggs).to_pandas()
    val_cols = [c for c in finest.columns if c not in dims]
    levels = []
    for keep in sets:
        keep = list(keep)
        if sorted(keep) == sorted(dims):
            g = finest.copy()
        elif keep:
            g = finest.groupby(keep, as_index=False)[val_cols].sum()
        else:
            g = finest[val_cols].sum().to_frame().T
        for d in dims:
            if d not in keep:
                g[d] = None
        levels.append(g[dims + val_cols])
    out = pd.concat(levels, ignore_index=True)[dims + val_cols]
    for c in val_cols:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(dims + val_cols, na_position="first").reset_index(
        drop=True)


# ---------------------------------------------------------------------------
# Grouped evaluation / time-series statistics (round-3 additions).
#
# All three ops below share one plan shape: a per-block pa.Table
# ``group_by`` partial collapses rows to (group, unit) pairs BEFORE the
# exchange, so the shuffle carries block-distinct partials (score or
# day cardinality, never raw rows), and one coarse hash bucket per
# group family runs a fully vectorized numpy sweep.  Exact integer
# outputs throughout so the DuckDB oracles hash bit-for-bit.


def _group_segments(keys: np.ndarray) -> np.ndarray:
    """Start offsets of each run in a SORTED key array (1-D)."""
    if len(keys) == 0:
        return np.zeros(0, np.int64)
    return np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]]).astype(np.int64)


def _per_group_exclusive_cumsum(
        vals: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Exclusive cumulative sum restarting at every segment start."""
    inc = np.cumsum(vals)
    lens = np.diff(np.r_[starts, len(vals)])
    base = np.repeat(np.r_[0, inc[starts[1:] - 1]] if len(starts) else
                     np.zeros(0, np.int64), lens)
    return inc - base - vals


def grouped_auc(
    ds: ray.data.Dataset,
    group_col: str,
    label_col: str,
    score_col: str,
    *,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Exact grouped ROC-AUC (Mann-Whitney rank-sum with tie-average)
    as an integer rational: per group emits ``n_pos``, ``n_neg``,
    ``auc_num`` = 2U and ``auc_den`` = 2*n_pos*n_neg, so
    AUC = auc_num/auc_den exactly (the factor 2 absorbs the half-credit
    for score ties).  This is the standard data-quality-classifier
    evaluation over corpus-scale scores.

    Scale design: rows collapse to (group, score) -> (pos, neg) count
    partials inside ``map_batches`` (the exchange is distinct-score
    sized, not row sized -- scores are integer cents/permille by
    convention here, so cardinality is range-bounded); one bucket
    kernel per group family sorts scores once and resolves every
    group's rank sum with two reduceats.  Overflow bound: requires
    n_pos * n_neg < 2^62 per group (~2e9 rows balanced) -- quantize or
    sample above that."""

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({
            group_col: t[group_col].combine_chunks(),
            "score": pc.cast(t[score_col].combine_chunks(), pa.int64()),
            "pos": pc.cast(t[label_col].combine_chunks(), pa.int64()),
            "one": pa.array(np.ones(len(t), np.int64)),
        })
        g = tt.group_by([group_col, "score"]).aggregate(
            [("pos", "sum"), ("one", "sum")])
        return pa.table({
            group_col: g[group_col], "score": g["score"],
            "np_": g["pos_sum"],
            "nn_": pc.subtract(g["one_sum"], g["pos_sum"])})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby([group_col, "score"], as_index=False,
                      sort=False)[["np_", "nn_"]].sum()
        g = g.sort_values([group_col, "score"], kind="mergesort")
        keys = g[group_col].to_numpy()
        npos = g["np_"].to_numpy(np.int64)
        nneg = g["nn_"].to_numpy(np.int64)
        starts = _group_segments(keys)
        cnn_before = _per_group_exclusive_cumsum(nneg, starts)
        terms = npos * (2 * cnn_before + nneg)
        two_u = np.add.reduceat(terms, starts)
        n_pos = np.add.reduceat(npos, starts)
        n_neg = np.add.reduceat(nneg, starts)
        return pd.DataFrame({
            group_col: keys[starts],
            "n_pos": n_pos, "n_neg": n_neg,
            "auc_num": two_u, "auc_den": 2 * n_pos * n_neg})

    pre = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    return bucketed_groups(pre, group_col, kern, n_buckets=n_buckets)


def daily_count_partials(
    ds: ray.data.Dataset,
    group_col: str,
    ts_col: str,
) -> ray.data.Dataset:
    """(group, epoch_day) -> partial row count, collapsed per block.
    ``day`` is int64 days since 1970-01-01 (matches DuckDB
    ``DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE))``)."""

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.cast(pc.cast(
            pc.cast(t[ts_col].combine_chunks(), pa.timestamp("us")),
            pa.date32()), pa.int32()), pa.int64())
        tt = pa.table({group_col: t[group_col].combine_chunks(),
                       "day": day,
                       "n": pa.array(np.ones(len(t), np.int64))})
        g = tt.group_by([group_col, "day"]).aggregate([("n", "sum")])
        return pa.table({group_col: g[group_col], "day": g["day"],
                         "n": g["n_sum"]})

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)


def grouped_trend_slope(
    ds: ray.data.Dataset,
    group_col: str,
    ts_col: str,
    *,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-group OLS slope of daily row counts vs day index, as the
    exact integer rational (slope_num, slope_den):
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) over (x = day - min day of
    the group, y = that day's count).  Centering x per group keeps
    every product inside int64 (x <= observed span in days; bound:
    span^2 * total_rows < 2^63).  The trend detector for growing log
    sources / hot CI jobs.

    One exchange total: per-block (group, day) count partials, then a
    single bucket kernel folds exact daily counts and the five
    sufficient sums per group with reduceats."""
    pre = daily_count_partials(ds, group_col, ts_col)

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby([group_col, "day"], as_index=False,
                      sort=False)[["n"]].sum()
        g = g.sort_values([group_col, "day"], kind="mergesort")
        keys = g[group_col].to_numpy()
        day = g["day"].to_numpy(np.int64)
        y = g["n"].to_numpy(np.int64)
        starts = _group_segments(keys)
        lens = np.diff(np.r_[starts, len(keys)])
        x = day - np.repeat(day[starts], lens)
        n = lens.astype(np.int64)
        sx = np.add.reduceat(x, starts)
        sy = np.add.reduceat(y, starts)
        sxy = np.add.reduceat(x * y, starts)
        sxx = np.add.reduceat(x * x, starts)
        return pd.DataFrame({
            group_col: keys[starts], "n_days": n,
            "slope_num": n * sxy - sx * sy,
            "slope_den": n * sxx - sx * sx})

    return bucketed_groups(pre, group_col, kern, n_buckets=n_buckets)


def grouped_cusum_peak(
    ds: ray.data.Dataset,
    group_col: str,
    ts_col: str,
    *,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-group CUSUM level-shift detector over the daily count
    series, exact integers: with n observed days and S total rows,
    dev_k = n*cumsum(y)_k - k*S (the cumulative deviation from the
    group's own mean, scaled by n to stay integral).  Emits the peak
    |dev| and the FIRST day attaining it -- the classic change-point
    locator for a log route whose volume steps up or down.

    Same one-exchange plan as :func:`grouped_trend_slope`; the argmax
    with first-day tie-break is a masked min-reduceat, no per-group
    Python."""
    pre = daily_count_partials(ds, group_col, ts_col)

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby([group_col, "day"], as_index=False,
                      sort=False)[["n"]].sum()
        g = g.sort_values([group_col, "day"], kind="mergesort")
        keys = g[group_col].to_numpy()
        day = g["day"].to_numpy(np.int64)
        y = g["n"].to_numpy(np.int64)
        starts = _group_segments(keys)
        lens = np.diff(np.r_[starts, len(keys)])
        n_rep = np.repeat(lens.astype(np.int64), lens)
        s = np.add.reduceat(y, starts)
        s_rep = np.repeat(s, lens)
        cumy = _per_group_exclusive_cumsum(y, starts) + y
        k = np.arange(len(y), dtype=np.int64) - np.repeat(starts, lens) + 1
        dev = np.abs(n_rep * cumy - k * s_rep)
        peak = np.maximum.reduceat(dev, starts)
        is_peak = dev == np.repeat(peak, lens)
        big = np.iinfo(np.int64).max
        peak_day = np.minimum.reduceat(np.where(is_peak, day, big), starts)
        return pd.DataFrame({
            group_col: keys[starts],
            "n_days": lens.astype(np.int64), "total": s,
            "max_dev": peak, "peak_day": peak_day})

    return bucketed_groups(pre, group_col, kern, n_buckets=n_buckets)


def decayed_sum_by_group(
    ds: "ray.data.Dataset",
    group_col: str,
    ts_col: str,
    cents_col: str,
    *,
    half_life_days: int,
) -> "ray.data.Dataset":
    """Recency-weighted (exponentially decayed) grouped sum, EXACT in
    int64: each row's non-negative integer cents are right-shifted by
    ``age_days // half_life_days`` (capped at 62) where age is
    measured back from the corpus's max day -- bit-shift halving
    instead of float ``exp(-age/tau)``, so the result value-hashes
    against DuckDB's integer division bit-for-bit.  The recency
    weighting every leaderboard/trending aggregate needs, without the
    float-determinism trap.

    Two passes: a one-row MAX(day) aggregate (the anchor must be
    global), then a pure map partial + vocabulary-sized final sum.
    ``cents_col`` must be non-negative (shift == floor-division only
    holds there); negative rows raise.  Returns
    (group, decayed_cents, n)."""
    from ray.data.aggregate import Max, Sum

    US_PER_DAY = 86_400_000_000
    mx = ds.aggregate(Max(ts_col))[f"max({ts_col})"]
    max_day = int(_ts_to_us_int(mx)) // US_PER_DAY

    def partial(t: pa.Table) -> pa.Table:
        cents = t[cents_col].combine_chunks().to_numpy()
        if len(cents) and int(cents.min()) < 0:
            raise ValueError("decayed_sum_by_group needs cents >= 0")
        ts = pc.cast(t[ts_col].combine_chunks(),
                     pa.int64()).to_numpy()
        age = max_day - ts // US_PER_DAY
        shift = np.minimum(age // half_life_days, 62).astype(np.int64)
        tt = pa.table({
            group_col: t[group_col],
            "w": pa.array(cents >> shift),
            "one": pa.array(np.ones(len(t), np.int64))})
        g = tt.group_by(group_col).aggregate([("w", "sum"),
                                              ("one", "sum")])
        return pa.table({group_col: g[group_col],
                         "decayed_cents": g["w_sum"],
                         "n": g["one_sum"]})

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        group_col).aggregate(Sum("decayed_cents",
                                 alias_name="decayed_cents"),
                             Sum("n", alias_name="n"))


def _ts_to_us_int(v) -> int:
    """Normalize an aggregate-returned timestamp (pandas Timestamp,
    numpy datetime64, or already-int64 microseconds) to epoch us."""
    if hasattr(v, "value"):  # pandas Timestamp: ns since epoch
        return int(v.value) // 1000
    if isinstance(v, np.datetime64):
        return int(v.astype("datetime64[us]").astype(np.int64))
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        epoch = _dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
        return int((v - epoch) / _dt.timedelta(microseconds=1))
    return int(v)


def sequential_pair_support(
    ds: "ray.data.Dataset",
    group_col: str,
    order_cols: list[str],
    type_col: str,
    *,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Sequential pattern mining, order-2 support counting: for every
    ordered type pair (t1, t2), in how many groups does t1 occur
    STRICTLY before t2 (by the total order ``order_cols``) -- the
    support table the classic GSP/PrefixSpan algorithms build their
    first generation from.  t1 == t2 counts groups with >= 2
    occurrences, exactly like the SQL DISTINCT self-join.

    Scale shape: one bucketed group-hash exchange; the per-bucket
    kernel reduces each group to first/last POSITION per type (one
    mergesort + two drop_duplicates -- never the quadratic self-join),
    then emits the vocabulary-sized pair partials that a tiny final
    sum folds.  Returns (t1, t2, support)."""
    from ray.data.aggregate import Sum

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col] + order_cols, kind="mergesort")
        pos = np.arange(len(g), dtype=np.int64)
        gg = pd.DataFrame({"k": g[group_col].to_numpy(),
                           "t": g[type_col].to_numpy(),
                           "pos": pos})
        first = gg.drop_duplicates(["k", "t"], keep="first")
        last = gg.drop_duplicates(["k", "t"], keep="last")
        m = first.merge(last, on="k", suffixes=("_1", "_2"))
        m = m[m["pos_1"] < m["pos_2"]]
        out = (m.groupby(["t_1", "t_2"], as_index=False, sort=False)
               .size())
        return pd.DataFrame({"t1": out["t_1"], "t2": out["t_2"],
                             "support": out["size"].astype(np.int64)})

    parts = bucketed_groups(ds, group_col, kern, n_buckets=n_buckets)
    return parts.groupby(["t1", "t2"]).aggregate(
        Sum("support", alias_name="support"))


def gini_impurity_by_group(
    ds: "ray.data.Dataset",
    group_col: str,
    label_col: str,
) -> "ray.data.Dataset":
    """Per-group Gini impurity of a categorical label -- the exact-
    rational purity metric (entropy needs a log; Gini does not):
    ``gini_permille = 1000 * (n^2 - sum_c c^2) // n^2`` with n rows
    and per-class counts c.  0 = pure group, -> 1000*(1-1/k) uniform.
    The per-source label-mix audit before sampling weights are set.

    Scale shape: blocks collapse to (group, label, cnt) partials
    (vocabulary contract: groups x classes), one native groupby-sum
    merge, then a groups-sized fold computes the rational.  Output:
    group, n, gini_permille (all int64)."""

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby([group_col, label_col], sort=False)
               .size().reset_index(name="cnt"))
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    conf = (ds.map_batches(partial, batch_format="pandas")
            .groupby([group_col, label_col]).sum("cnt"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g["sum(cnt)"].to_numpy(np.int64)
        n = int(c.sum())
        ss = int((c.astype(object) ** 2).sum())  # Python ints: no wrap
        return pd.DataFrame({
            group_col: [g[group_col].iloc[0]],
            "n": np.array([n], np.int64),
            "gini_permille": np.array(
                [1000 * (n * n - ss) // (n * n)], np.int64)})

    return conf.groupby(group_col).map_groups(fold,
                                              batch_format="pandas")


def hhi_by_group(
    ds: "ray.data.Dataset",
    group_col: str,
    label_col: str,
    *,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Per-group Herfindahl-Hirschman concentration of a categorical
    label, exact permille: ``hhi_permille = (1000 * sum_c c^2) // n^2``
    with per-class counts c and n rows -- 1000 = all mass on one class,
    ~1000/k = uniform over k classes.  The single-denominator dual of
    :func:`gini_impurity_by_group` (hhi = 1000 - gini up to
    truncation), kept separate because consumers threshold on
    concentration directly (e.g. "is this user's event mix
    single-typed?").

    Scale shape: unlike gini's vocabulary-keyed native groupby, groups
    here are CORPUS-shaped (per-user/per-session), so blocks collapse
    to (group, label, cnt) partials and ONE coarse hash(group) bucketed
    exchange finishes both the (group,label) sum and the per-group
    rational -- the ops/window.py rule for corpus-shaped keys.  The
    int64 bound is n < ~3e6 rows per group (1000 * n^2 < 2^63);
    per-entity groups sit far below it at any corpus size.

    Output: (group_col, n, hhi_permille), all int64."""
    from ci_log_processing_ray.ops.window import bucketed_groups

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby([group_col, label_col], sort=False)
               .size().reset_index(name="cnt"))
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                group_col: pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
                "hhi_permille": pd.Series([], dtype=np.int64)})
        c = (g.groupby([group_col, label_col], sort=False)["cnt"]
             .sum().reset_index())
        c["sq"] = c["cnt"] * c["cnt"]
        agg = (c.groupby(group_col, sort=False)
               .agg(n=("cnt", "sum"), s2=("sq", "sum")).reset_index())
        n = agg["n"].to_numpy(np.int64)
        s2 = agg["s2"].to_numpy(np.int64)
        return pd.DataFrame({
            group_col: agg[group_col].to_numpy(np.int64),
            "n": n,
            "hhi_permille": (1000 * s2) // (n * n)})

    return bucketed_groups(
        ds.map_batches(partial, batch_format="pandas"),
        group_col, kern, n_buckets=n_buckets)


def fano_by_group(
    ds: "ray.data.Dataset",
    group_col: str,
    unit_col: str,
    *,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Per-group burstiness (Fano factor) of event counts per unit
    (e.g. per day), exact permille: with per-unit counts c over the
    group's n observed units and S = total events,

        fano_permille = (1000 * (n * sum(c^2) - S^2)) // (n * S)

    (population variance-to-mean; ~1000 = Poisson-like, >>1000 =
    bursty, ->0 = metronomic).  Cauchy-Schwarz keeps the numerator
    non-negative, so truncation equals floor and SQL agrees exactly.
    Units are OBSERVED units only (zero-count units need a calendar
    grid -- compose with resample_grid when that is the contract).

    Scale shape: per-block (group, unit, cnt) partials + one coarse
    hash(group) bucketed exchange finishing the (group,unit) sum and
    the per-group rational (corpus-shaped groups).  int64 bound:
    n * sum(c^2) < 2^63 -- safe while any group's event count stays
    under ~3e6 per unit.

    Output: (group_col, n_units, n_events, fano_permille), int64."""
    from ci_log_processing_ray.ops.window import bucketed_groups

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby([group_col, unit_col], sort=False)
               .size().reset_index(name="cnt"))
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                group_col: pd.Series([], dtype=np.int64),
                "n_units": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64),
                "fano_permille": pd.Series([], dtype=np.int64)})
        c = (g.groupby([group_col, unit_col], sort=False)["cnt"]
             .sum().reset_index())
        c["sq"] = c["cnt"] * c["cnt"]
        agg = (c.groupby(group_col, sort=False)
               .agg(n=("cnt", "size"), s=("cnt", "sum"),
                    q=("sq", "sum")).reset_index())
        n = agg["n"].to_numpy(np.int64)
        s = agg["s"].to_numpy(np.int64)
        q = agg["q"].to_numpy(np.int64)
        return pd.DataFrame({
            group_col: agg[group_col].to_numpy(np.int64),
            "n_units": n,
            "n_events": s,
            "fano_permille": (1000 * (n * q - s * s)) // (n * s)})

    return bucketed_groups(
        ds.map_batches(partial, batch_format="pandas"),
        group_col, kern, n_buckets=n_buckets)


def ks_wasserstein_two_sample(
    ds: "ray.data.Dataset",
    value_col: str,
    side_col: str,
    *,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Two-sample Kolmogorov-Smirnov statistic AND 1-D Wasserstein-1
    (earth mover's) distance between the int64 ``value_col``
    distributions of side 0 and side 1 -- the train/serve /
    shard-vs-shard distribution-drift detectors, both as EXACT integer
    rationals (no floats in the hash path)::

        KS  = max_v |n2*C1(v) - n1*C2(v)| / (n1*n2)
        W1  = sum over adjacent distinct values (v, v') of
              |n2*C1(v) - n1*C2(v)| * (v' - v) / (n1*n2)

    with C_i the inclusive cumulative counts at each distinct value.
    Output: one row (n1, n2, ks_num, w1_num, den = n1*n2,
    ks_permille).

    Scale shape (no global sort): (1) one bucketed exchange collapses
    the corpus to per-distinct-value (c1, c2) counts; (2) equi-width
    RANGE buckets over the value domain -- a per-bucket aggregate
    returns (bucket, n1, n2, vmin, vmax), the driver prefix-sums side
    offsets in bucket order (the rank_global two-pass idea); (3) each
    bucket's kernel gets its entry cums + the previous bucket's last
    value and computes its local max and gap-weighted sum, INCLUDING
    the cross-bucket entry gap; the driver folds bucket partials with
    Python ints (wrap-safe).  Magnitudes: |num| <= n1*n2*range --
    int64-safe for corpus counts up to ~2^31 at cent-scale ranges;
    beyond that the fold already holds Python ints, widen the kernel
    to object dtype."""
    import pyarrow.compute as pc_

    import ray

    from ci_log_processing_ray.ops.window import (bucketed_sum,
                                                  resolve_group_buckets)

    n_buckets = resolve_group_buckets(n_buckets)

    def prep(t: pa.Table) -> pa.Table:
        side = t[side_col].combine_chunks().cast(pa.int64())
        ones = np.ones(len(t), np.int64)
        s = side.to_numpy(zero_copy_only=False)
        return pa.table({
            "v": t[value_col].combine_chunks().cast(pa.int64()),
            "c1": pa.array(np.where(s == 0, ones, 0)),
            "c2": pa.array(np.where(s == 1, ones, 0))})

    per_value = bucketed_sum(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["v"], ["c1", "c2"], n_buckets=n_buckets).materialize()

    from ray.data.aggregate import Max, Min

    mm = per_value.aggregate(Min("v"), Max("v"))
    lo, hi = int(mm["min(v)"]), int(mm["max(v)"])
    width = max((hi - lo) // n_buckets + 1, 1)

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_b", pc_.divide(pc_.cast(pc_.subtract(
                t["v"].combine_chunks(), lo), pa.int64()),
                pa.scalar(width, pa.int64())))

    bucketed = per_value.map_batches(
        add_bucket, batch_format="pyarrow",
        zero_copy_batch=True).materialize()

    def bstats(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "_b": t["_b"], "n1": t["c1"], "n2": t["c2"],
            "vmin": t["v"], "vmax": t["v"]})
        g = tt.group_by("_b").aggregate(
            [("n1", "sum"), ("n2", "sum"),
             ("vmin", "min"), ("vmax", "max")])
        return g.rename_columns(["_b", "n1", "n2", "vmin", "vmax"])

    bs = (bucketed.map_batches(bstats, batch_format="pyarrow",
                               zero_copy_batch=True)
          .to_pandas()
          .groupby("_b")
          .agg(n1=("n1", "sum"), n2=("n2", "sum"),
               vmin=("vmin", "min"), vmax=("vmax", "max"))
          .sort_index())
    n1 = int(bs["n1"].sum())
    n2 = int(bs["n2"].sum())
    if n1 == 0 or n2 == 0:
        raise ValueError("both sides need at least one row")
    # driver prefix: entry cums and previous bucket's last value
    entry1, entry2, prev_last = {}, {}, {}
    run1 = run2 = 0
    last_v = None
    for b, row in bs.iterrows():
        entry1[int(b)], entry2[int(b)] = run1, run2
        prev_last[int(b)] = last_v
        run1 += int(row["n1"])
        run2 += int(row["n2"])
        last_v = int(row["vmax"])
    ctx = ray.put((entry1, entry2, prev_last, n1, n2))

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        e1, e2, pl, nn1, nn2 = ray.get(ctx)
        b = int(g["_b"].iloc[0])
        g = g.sort_values("v", kind="mergesort")
        v = g["v"].to_numpy(np.int64)
        cum1 = e1[b] + np.cumsum(g["c1"].to_numpy(np.int64))
        cum2 = e2[b] + np.cumsum(g["c2"].to_numpy(np.int64))
        dev = np.abs(nn2 * cum1 - nn1 * cum2)
        ks = int(dev.max()) if len(dev) else 0
        # gaps inside the bucket
        w1 = int((dev[:-1] * np.diff(v)).sum()) if len(v) > 1 else 0
        # entry gap from the previous bucket's last value: the step
        # level there equals this bucket's ENTRY cums
        if pl[b] is not None:
            dev_in = abs(nn2 * e1[b] - nn1 * e2[b])
            w1 += dev_in * (int(v[0]) - pl[b])
        # local KS must also consider the entry level (a max could
        # sit on a run ending exactly at the bucket boundary)
        return pd.DataFrame({"ks": np.array([ks], np.int64),
                             "w1": np.array([w1], np.int64)})

    parts = (bucketed.groupby("_b")
             .map_groups(kern, batch_format="pandas").to_pandas())
    ks_num = int(parts["ks"].max())
    w1_num = sum(int(x) for x in parts["w1"])  # Python-int fold
    den = n1 * n2
    return ray.data.from_arrow(pa.table({
        "n1": pa.array([n1], pa.int64()),
        "n2": pa.array([n2], pa.int64()),
        "ks_num": pa.array([ks_num], pa.int64()),
        "w1_num": pa.array([w1_num], pa.int64()),
        "den": pa.array([den], pa.int64()),
        "ks_permille": pa.array([1000 * ks_num // den], pa.int64())}))


def _doubled_centered_ranks(
        v: np.ndarray, c: np.ndarray, n: int) -> np.ndarray:
    """Per-cell doubled, centered, tie-averaged rank.

    ``v`` are a group's distinct-cell values (any order) with row
    counts ``c``; returns, aligned per cell, ``2*avg_rank(v) - (n+1)``
    where ``avg_rank`` is the tie-averaged rank of that value over all
    ``n`` rows.  Doubling keeps tie averages integral; centering by the
    exact doubled-rank mean ``n+1`` makes per-group sums of products
    directly usable as correlation sufficient statistics (and keeps
    magnitudes <= n so sums stay inside int64 for n < 2^21)."""
    order = np.argsort(v, kind="stable")
    sv = v[order]
    sc = c[order]
    starts = _group_segments(sv)
    cnt = np.add.reduceat(sc, starts) if len(sv) else \
        np.zeros(0, np.int64)
    cum_excl = np.cumsum(cnt) - cnt
    d_distinct = 2 * (1 + cum_excl) + cnt - 1 - (n + 1)
    # map each sorted cell to its distinct-run index, then un-permute
    run_id = np.cumsum(np.r_[False, sv[1:] != sv[:-1]])
    d_sorted = d_distinct[run_id] if len(sv) else sv
    out = np.empty(len(v), np.int64)
    out[order] = d_sorted
    return out


def spearman_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
    *,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Exact grouped Spearman rank correlation as integer sufficient
    statistics: per group emits ``n_obs`` and the centered doubled-rank
    sums ``sxy = sum(dx*dy)``, ``sxx = sum(dx^2)``, ``syy = sum(dy^2)``
    (tie-averaged ranks), so rho = sxy / sqrt(sxx*syy) exactly -- the
    monotone-association screen for corpus feature pairs, no float
    ever crosses the wire.

    Scale design: rows collapse to distinct (group, x, y) cells with
    counts inside ``map_batches`` before the exchange (both columns are
    integer-quantized by convention here, so cell cardinality is
    value-domain-bounded, never row-bounded); one coarse hash bucket
    per group family resolves every group with two argsort+reduceat
    rank sweeps.  Overflow bound: |d| <= n so the sums are < n^3;
    requires n < 2^21 rows per group -- quantize coarser or sample
    above that (the kernel raises rather than wrap)."""

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({
            group_col: t[group_col].combine_chunks(),
            "x": pc.cast(t[x_col].combine_chunks(), pa.int64()),
            "y": pc.cast(t[y_col].combine_chunks(), pa.int64()),
            "n": pa.array(np.ones(len(t), np.int64)),
        })
        g = tt.group_by([group_col, "x", "y"]).aggregate([("n", "sum")])
        return pa.table({group_col: g[group_col], "x": g["x"],
                         "y": g["y"], "n": g["n_sum"]})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby([group_col, "x", "y"], as_index=False,
                      sort=False)["n"].sum()
        g = g.sort_values([group_col, "x", "y"], kind="mergesort")
        keys = g[group_col].to_numpy()
        xs = g["x"].to_numpy(np.int64)
        ys = g["y"].to_numpy(np.int64)
        cs = g["n"].to_numpy(np.int64)
        starts = _group_segments(keys)
        ends = np.r_[starts[1:], len(g)]
        rows = []
        for s, e in zip(starts, ends):  # loop over GROUPS, not rows
            c = cs[s:e]
            n = int(c.sum())
            if n >= 1 << 21:
                raise ValueError(
                    f"spearman_by_group: group {keys[s]!r} has {n} rows"
                    " (>= 2^21); int64 rank sums would overflow --"
                    " quantize coarser or sample first")
            dx = _doubled_centered_ranks(xs[s:e], c, n)
            dy = _doubled_centered_ranks(ys[s:e], c, n)
            rows.append((keys[s], n, int((c * dx * dy).sum()),
                         int((c * dx * dx).sum()),
                         int((c * dy * dy).sum())))
        return pd.DataFrame(rows, columns=[
            group_col, "n_obs", "sxy", "sxx", "syy"]).astype(
            {"n_obs": np.int64, "sxy": np.int64, "sxx": np.int64,
             "syy": np.int64})

    pre = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    return bucketed_groups(pre, group_col, kern, n_buckets=n_buckets)


def kendall_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    x_col: str,
    y_col: str,
    *,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Exact grouped Kendall tau-b sufficient statistics: per group
    emits ``n_obs``, concordant and discordant pair counts and the
    x-/y-tied pair counts, so
    tau_b = (conc - disc) / sqrt((n0 - tied_x) * (n0 - tied_y)) with
    n0 = n*(n-1)/2 -- the ordinal-association companion to
    :func:`spearman_by_group`, robust to heavy ties.

    Scale design: rows collapse to distinct (group, x, y) cells with
    counts before the exchange (integer-quantized columns by
    convention, so the exchange is value-domain-sized); the kernel
    sweeps each group's cells once in (x, y) order keeping a running
    per-y-value count table, so pair counts cost
    O(cells * distinct_y) adds, never O(n^2) row pairs.  Overflow
    bound: pair counts < n^2/2, so n < 2^31 rows per group."""

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({
            group_col: t[group_col].combine_chunks(),
            "x": pc.cast(t[x_col].combine_chunks(), pa.int64()),
            "y": pc.cast(t[y_col].combine_chunks(), pa.int64()),
            "n": pa.array(np.ones(len(t), np.int64)),
        })
        g = tt.group_by([group_col, "x", "y"]).aggregate([("n", "sum")])
        return pa.table({group_col: g[group_col], "x": g["x"],
                         "y": g["y"], "n": g["n_sum"]})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby([group_col, "x", "y"], as_index=False,
                      sort=False)["n"].sum()
        g = g.sort_values([group_col, "x", "y"], kind="mergesort")
        keys = g[group_col].to_numpy()
        xs = g["x"].to_numpy(np.int64)
        ys = g["y"].to_numpy(np.int64)
        cs = g["n"].to_numpy(np.int64)
        starts = _group_segments(keys)
        ends = np.r_[starts[1:], len(g)]
        rows = []
        for s, e in zip(starts, ends):  # loop over GROUPS
            x_, y_, c_ = xs[s:e], ys[s:e], cs[s:e]
            n = int(c_.sum())
            yv, yinv = np.unique(y_, return_inverse=True)
            cum = np.zeros(len(yv), np.int64)
            xstarts = _group_segments(x_)
            xends = np.r_[xstarts[1:], len(x_)]
            conc = disc = 0
            tot_prev = 0
            # loop over DISTINCT x values (value-domain bounded)
            for bs, be in zip(xstarts, xends):
                cj, yj = c_[bs:be], yinv[bs:be]
                if tot_prev:
                    pref = np.cumsum(cum)
                    less = np.where(yj > 0, pref[yj - 1], 0)
                    greater = tot_prev - pref[yj]
                    conc += int((cj * less).sum())
                    disc += int((cj * greater).sum())
                np.add.at(cum, yj, cj)
                tot_prev += int(cj.sum())
            cx = np.add.reduceat(c_, xstarts)
            tied_x = int((cx * (cx - 1) // 2).sum())
            cy = np.zeros(len(yv), np.int64)
            np.add.at(cy, yinv, c_)
            tied_y = int((cy * (cy - 1) // 2).sum())
            rows.append((keys[s], n, conc, disc, tied_x, tied_y))
        return pd.DataFrame(rows, columns=[
            group_col, "n_obs", "conc", "disc", "tied_x",
            "tied_y"]).astype({
                "n_obs": np.int64, "conc": np.int64, "disc": np.int64,
                "tied_x": np.int64, "tied_y": np.int64})

    pre = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    return bucketed_groups(pre, group_col, kern, n_buckets=n_buckets)


def theilsen_mk_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    ts_col: str,
    *,
    slope_scale: int = 1000,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Robust per-group volume trend over daily counts: the
    Mann-Kendall S statistic (sum over day pairs of
    sign(count_later - count_earlier)) plus the Theil-Sen slope as the
    LOWER MEDIAN of the per-pair integer slopes
    ``(slope_scale * dn) // dd`` (division truncating toward zero,
    matching DuckDB's ``//``) -- the outlier-proof alternative to
    :func:`grouped_trend_slope`'s OLS, undisturbed by one log-storm
    day.  Groups with fewer than two observed days are omitted.

    Scale design: rows collapse to (group, day) count partials inside
    ``map_batches`` (the exchange is day-count sized); the kernel
    enumerates DAY pairs, never row pairs -- m observed days cost
    m*(m-1)/2 integer ops, so years-long spans stay trivial (3650 days
    = 6.7M pairs) while row count is unbounded."""

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby([group_col, "day"], as_index=False,
                      sort=False)["n"].sum()
        g = g.sort_values([group_col, "day"], kind="mergesort")
        keys = g[group_col].to_numpy()
        days = g["day"].to_numpy(np.int64)
        ns = g["n"].to_numpy(np.int64)
        starts = _group_segments(keys)
        ends = np.r_[starts[1:], len(g)]
        rows = []
        for s, e in zip(starts, ends):  # loop over GROUPS
            m = e - s
            if m < 2:
                continue
            d, n = days[s:e], ns[s:e]
            i, j = np.triu_indices(m, k=1)
            dn = n[j] - n[i]
            dd = d[j] - d[i]
            mk_s = int(np.sign(dn).sum())
            sp = np.sign(dn) * ((slope_scale * np.abs(dn)) // dd)
            p = len(sp)
            med = int(np.partition(sp, (p - 1) // 2)[(p - 1) // 2])
            rows.append((keys[s], m, p, mk_s, med))
        return pd.DataFrame(rows, columns=[
            group_col, "n_days", "n_pairs", "mk_s",
            "ts_slope_milli"]).astype({
                "n_days": np.int64, "n_pairs": np.int64,
                "mk_s": np.int64, "ts_slope_milli": np.int64})

    pre = daily_count_partials(ds, group_col, ts_col)
    return bucketed_groups(pre, group_col, kern, n_buckets=n_buckets)


def decision_stump_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    feature_col: str,
    label_col: str,
    *,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Train a one-split decision stump per group on an integer
    feature and a 0/1 label, minimizing exact TRAINING ERROR COUNT
    (min(pos,neg) on each side) -- the classic weak learner / data-slice
    diagnostic, with a fully integer objective so the result hashes
    bit-for-bit.  Emits the best threshold t (left = feature <= t),
    its error count, the majority label of each side (ties -> 0; an
    empty right side -> 0) and n_obs.  Ties on error pick the SMALLEST
    threshold; t = max(feature) encodes "no split" (right side empty),
    so the stump never does worse than the majority baseline.

    Scale design: rows collapse to (group, feature) -> (pos, neg)
    count partials inside ``map_batches`` (exchange is value-domain
    sized); the kernel resolves every group with one sort + two
    cumsums over its distinct feature values."""

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({
            group_col: t[group_col].combine_chunks(),
            "x": pc.cast(t[feature_col].combine_chunks(), pa.int64()),
            "pos": pc.cast(t[label_col].combine_chunks(), pa.int64()),
            "one": pa.array(np.ones(len(t), np.int64)),
        })
        g = tt.group_by([group_col, "x"]).aggregate(
            [("pos", "sum"), ("one", "sum")])
        return pa.table({
            group_col: g[group_col], "x": g["x"],
            "p": g["pos_sum"],
            "q": pc.subtract(g["one_sum"], g["pos_sum"])})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby([group_col, "x"], as_index=False,
                      sort=False)[["p", "q"]].sum()
        g = g.sort_values([group_col, "x"], kind="mergesort")
        keys = g[group_col].to_numpy()
        xs = g["x"].to_numpy(np.int64)
        ps = g["p"].to_numpy(np.int64)
        qs = g["q"].to_numpy(np.int64)
        starts = _group_segments(keys)
        pl = _per_group_exclusive_cumsum(ps, starts) + ps
        ql = _per_group_exclusive_cumsum(qs, starts) + qs
        pt = np.repeat(np.add.reduceat(ps, starts),
                       np.diff(np.r_[starts, len(g)]))
        qt = np.repeat(np.add.reduceat(qs, starts),
                       np.diff(np.r_[starts, len(g)]))
        err = np.minimum(pl, ql) + np.minimum(pt - pl, qt - ql)
        # argmin per group with (error, threshold) lexical tie-break:
        # the frame is already sorted by (group, x), so the FIRST
        # minimal error per segment is the smallest-threshold winner
        best = starts + np.array(
            [int(np.argmin(err[s:e])) for s, e in
             zip(starts, np.r_[starts[1:], len(g)])], np.int64)
        return pd.DataFrame({
            group_col: keys[best],
            "threshold": xs[best],
            "n_errors": err[best],
            "left_label": (pl[best] > ql[best]).astype(np.int64),
            "right_label": ((pt[best] - pl[best]) >
                            (qt[best] - ql[best])).astype(np.int64),
            "n_obs": pt[best] + qt[best]})

    pre = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    return bucketed_groups(pre, group_col, kern, n_buckets=n_buckets)


def mann_whitney_u(
    ds: ray.data.Dataset,
    group_col: str,
    side_col: str,
    value_col: str,
    *,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-group two-sample Mann-Whitney rank-sum statistic as an EXACT
    integer: for each group, over all (a, b) pairs with a from side 0
    and b from side 1,

        u2 = 2 * #(a > b) + #(a == b)      (= 2 * U_A with ties at 1/2)

    plus the side sizes (n_a, n_b) -- the standard nonparametric
    "did this segment's distribution shift up?" test statistic (compare
    u2 against n_a*n_b: equal distributions hover at u2 ~= n_a*n_b).
    Doubling clears the half-credit ties, so the hash path stays
    integer-exact against the SQL pair-count oracle.

    Scale shape: one ``map_batches`` pass collapses the corpus to
    per-(group, side, value) counts (value-domain-sized partials, the
    ks_wasserstein_two_sample collapse), then ONE bucketed exchange on
    hash(group) computes every group's statistic from its count table
    via sort + per-side cumulative sums -- no pair enumeration
    anywhere; cost is O(distinct values) per group.  Groups are assumed
    vocabulary-shaped (each group's distinct-value table fits a reduce
    task); magnitudes: u2 <= 2*n_a*n_b, int64-safe to ~2^31 rows per
    group per side."""
    from ci_log_processing_ray.ops.window import bucketed_groups

    def collapse(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "grp": t[group_col],
            "side": t[side_col].combine_chunks().cast(pa.int64()),
            "val": t[value_col].combine_chunks().cast(pa.int64())})
        g = tt.group_by(["grp", "side", "val"]).aggregate([([], "count_all")])
        return g.rename_columns(["grp", "side", "val", "n"])

    pre = ds.map_batches(collapse, batch_format="pyarrow",
                         zero_copy_batch=True)

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["grp", "side", "val"], as_index=False,
                      sort=False)["n"].sum()
        side = g["side"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        piv = pd.DataFrame({
            "grp": g["grp"], "val": g["val"].to_numpy(np.int64),
            "na": np.where(side == 0, n, 0),
            "nb": np.where(side == 1, n, 0)})
        piv = piv.groupby(["grp", "val"], as_index=False, sort=False).sum()
        piv = piv.sort_values(["grp", "val"], kind="mergesort")
        na = piv["na"].to_numpy(np.int64)
        nb = piv["nb"].to_numpy(np.int64)
        grp = piv["grp"]
        # per-group exclusive cumsum of side-1 counts below each value
        cum_b = piv.groupby("grp", sort=False)["nb"].cumsum().to_numpy(
            np.int64) - nb
        gt2 = 2 * na * cum_b
        eq = na * nb
        out = pd.DataFrame({"grp": grp, "u2": gt2 + eq,
                            "na": na, "nb": nb})
        out = out.groupby("grp", as_index=False, sort=False).sum()
        return pd.DataFrame({
            "grp": out["grp"],
            "n_a": out["na"].to_numpy(np.int64),
            "n_b": out["nb"].to_numpy(np.int64),
            "u2": out["u2"].to_numpy(np.int64)})

    return bucketed_groups(pre, "grp", kern, n_buckets=n_buckets)


def group_share_filter(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    *,
    mult_num: int = 3,
    mult_den: int = 2,
    n_buckets: int | None = None,
) -> pd.DataFrame:
    """Share-of-global-total group filter (the TPC-H Q11 shape): group
    sums of ``val_col`` by ``key_col``, keeping groups whose sum
    exceeds ``(mult_num/mult_den) x`` the AVERAGE group sum -- Q11's
    threshold is scale-relative (``fraction = 0.0001/SF``), so is this
    (1.5x-average by default survives any corpus size).  Exact: the
    cutoff cross-multiplies in Python ints
    (``s * mult_den * n_groups > mult_num * total``), equivalently
    ``s > (mult_num * total) // (mult_den * n_groups)`` for integer
    ``s`` in both divisibility cases; no float shares anywhere.

    Plan: one bucketed exchange collapses per-key partials exactly
    (key cardinality corpus-shaped); per-block ``(sum, count)``
    partials of THAT small table fold to ``(total, n_groups)`` in
    Python ints (int64 wrap guard); the threshold broadcasts into a
    distributed filter so only surviving groups -- the output itself
    -- reach the driver, where ``share_permille = 1000*s // total``
    is computed per row in Python ints.

    Reference parity: TPC-H Q11 ``HAVING value > fraction * total``;
    SURVEY.md §2.5 extension family.
    """
    from .window import bucketed_sum

    def prep(t: pa.Table) -> pa.Table:
        tt = pa.table({
            key_col: t[key_col].combine_chunks(),
            "_v": t[val_col].combine_chunks().cast(pa.int64())})
        g = tt.group_by(key_col).aggregate([("_v", "sum")])
        return pa.table({key_col: g[key_col], "_v": g["_v_sum"]})

    g = bucketed_sum(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True),
        [key_col], ["_v"], n_buckets=n_buckets)

    def totals(frame: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "t": [int(sum(int(x) for x in frame["_v"]))],
            "n": [len(frame)]})

    tdf = g.map_batches(totals, batch_format="pandas").to_pandas()
    total = int(sum(int(x) for x in tdf["t"]))
    n_groups = int(tdf["n"].sum())
    if n_groups == 0:
        return pd.DataFrame({key_col: pd.Series([], dtype=np.int64),
                             "sum_val": pd.Series([], dtype=np.int64),
                             "share_permille": pd.Series(
                                 [], dtype=np.int64)})
    cutoff = (mult_num * total) // (mult_den * n_groups)

    keep = g.map_batches(
        lambda f: f[f["_v"].to_numpy() > cutoff],
        batch_format="pandas").to_pandas()
    if not len(keep) or "_v" not in keep.columns:
        # empty pandas-block datasets drop columns on to_pandas()
        return pd.DataFrame({key_col: pd.Series([], dtype=object),
                             "sum_val": pd.Series([], dtype=np.int64),
                             "share_permille": pd.Series(
                                 [], dtype=np.int64)})
    s = [int(x) for x in keep["_v"]]
    return pd.DataFrame({
        key_col: keep[key_col].to_numpy(),
        "sum_val": np.asarray(s, np.int64),
        "share_permille": np.asarray(
            [(1000 * x) // total for x in s], np.int64)})


def chi2_contingency_cells(
    ds: ray.data.Dataset,
    col_a: str,
    col_b: str,
) -> pd.DataFrame:
    """Chi-squared independence test cells for two categorical columns,
    in EXACT integer arithmetic: per cell, ``observed``,
    ``expected_micros = r*c*1e6 // N`` and
    ``term_micros = ((O*N - r*c)^2 * 1e6) // (N*r*c)`` (the cell's
    contribution to chi2, scaled by 1e6 -- floor-divided per cell so a
    SQL oracle reproduces it bit-for-bit; chi2_micros is the sum).

    Plan: blocks collapse to per-(a,b) count partials in Arrow before
    ONE vocabulary-shaped native groupby; marginals and the per-cell
    arithmetic run on the tiny merged matrix in Python ints (exact at
    any corpus size -- O*N fits far inside int128 even at 10^10 rows).

    SURVEY.md §2 training-data analysis family (feature association
    screens over corpus metadata)."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([col_a, col_b]).group_by([col_a, col_b]).aggregate(
            [([], "count_all")])
        return pa.table({col_a: g[col_a], col_b: g[col_b],
                         "_n": g["count_all"].cast(pa.int64())})

    cells = (ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby([col_a, col_b]).sum("_n")).to_pandas()
    cells = cells.rename(columns={"sum(_n)": "_n"})
    if not len(cells):
        return pd.DataFrame({col_a: pd.Series([], dtype=object),
                             col_b: pd.Series([], dtype=object),
                             "observed": pd.Series([], dtype=np.int64),
                             "expected_micros": pd.Series([], dtype=np.int64),
                             "term_micros": pd.Series([], dtype=np.int64)})
    o = [int(x) for x in cells["_n"]]
    row_tot = {k: 0 for k in cells[col_a].unique()}
    col_tot = {k: 0 for k in cells[col_b].unique()}
    for a, b, n in zip(cells[col_a], cells[col_b], o):
        row_tot[a] += n
        col_tot[b] += n
    big_n = sum(o)
    exp, term = [], []
    for a, b, n in zip(cells[col_a], cells[col_b], o):
        r, c = row_tot[a], col_tot[b]
        exp.append(r * c * 1_000_000 // big_n)
        d = n * big_n - r * c
        term.append(d * d * 1_000_000 // (big_n * r * c))
    return pd.DataFrame({
        col_a: cells[col_a], col_b: cells[col_b],
        "observed": np.asarray(o, np.int64),
        "expected_micros": np.asarray(exp, np.int64),
        "term_micros": np.asarray(term, np.int64)})


def classifier_eval(
    ds: ray.data.Dataset,
    true_col: str,
    pred_col: str,
) -> pd.DataFrame:
    """Per-class precision / recall / F1 in exact integer permille from
    a (true, predicted) label dataset -- the multi-class classifier
    evaluation primitive (permille = 1000*tp // denom; -1 sentinel when
    a denominator is zero so the SQL oracle stays binding).

    Plan: blocks collapse to classes^2 confusion partials before one
    vocabulary-shaped groupby; the per-class metrics run on the tiny
    merged matrix only.  Pairs with ops/textstats.py:prediction_kappa
    (chance-corrected agreement) over the same confusion shape."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([true_col, pred_col]).group_by(
            [true_col, pred_col]).aggregate([([], "count_all")])
        return pa.table({true_col: g[true_col], pred_col: g[pred_col],
                         "_n": g["count_all"].cast(pa.int64())})

    conf = (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby([true_col, pred_col]).sum("_n")).to_pandas()
    conf = conf.rename(columns={"sum(_n)": "_n"})
    classes = sorted(set(conf[true_col]) | set(conf[pred_col]))
    tp = {c: 0 for c in classes}
    pred_n = {c: 0 for c in classes}
    true_n = {c: 0 for c in classes}
    for t_, p_, n in zip(conf[true_col], conf[pred_col], conf["_n"]):
        n = int(n)
        true_n[t_] += n
        pred_n[p_] += n
        if t_ == p_:
            tp[t_] += n

    def _pm(num: int, den: int) -> int:
        return 1000 * num // den if den else -1

    return pd.DataFrame({
        "cls": classes,
        "tp": np.asarray([tp[c] for c in classes], np.int64),
        "pred_n": np.asarray([pred_n[c] for c in classes], np.int64),
        "true_n": np.asarray([true_n[c] for c in classes], np.int64),
        "precision_permille": np.asarray(
            [_pm(tp[c], pred_n[c]) for c in classes], np.int64),
        "recall_permille": np.asarray(
            [_pm(tp[c], true_n[c]) for c in classes], np.int64),
        "f1_permille": np.asarray(
            [2000 * tp[c] // (pred_n[c] + true_n[c])
             if (pred_n[c] + true_n[c]) else -1
             for c in classes], np.int64)})


def calibration_bins(
    ds: ray.data.Dataset,
    score_col: str,
    label_col: str,
    *,
    bin_width: int,
) -> ray.data.Dataset:
    """Reliability-diagram table: fixed-width score bins with exact
    integer mean label (permille) and mean score -- the probability-
    calibration check run on model-scored corpora before threshold
    selection.  ``score_col`` and ``label_col`` must already be int64
    (cents / 0-1).

    Plan: pure-map binning, per-block (n, n_pos, sum_score) Arrow
    partials, one vocabulary-shaped groupby (bin count is
    range/bin_width, corpus-size independent); permille and mean
    columns are exact floor divisions computed distributed per bin."""

    def partial(t: pa.Table) -> pa.Table:
        s = t[score_col].combine_chunks().to_numpy()
        lab = t[label_col].combine_chunks().to_numpy()
        b = s // bin_width
        tt = pa.table({"bin": pa.array(b, pa.int64()),
                       "_one": pa.array(np.ones(len(s), np.int64)),
                       "_pos": pa.array(lab.astype(np.int64)),
                       "_s": pa.array(s.astype(np.int64))})
        g = tt.group_by("bin").aggregate(
            [("_one", "sum"), ("_pos", "sum"), ("_s", "sum")])
        return pa.table({"bin": g["bin"], "_one": g["_one_sum"],
                         "_pos": g["_pos_sum"], "_s": g["_s_sum"]})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("bin").sum(["_one", "_pos", "_s"]))

    def final(t: pa.Table) -> pa.Table:
        n = t["sum(_one)"].combine_chunks().to_numpy().astype(np.int64)
        pos = t["sum(_pos)"].combine_chunks().to_numpy().astype(np.int64)
        s = t["sum(_s)"].combine_chunks().to_numpy().astype(np.int64)
        return pa.table({
            "bin": t["bin"].combine_chunks().cast(pa.int64()),
            "n": pa.array(n), "n_pos": pa.array(pos),
            "mean_label_permille": pa.array(1000 * pos // n),
            "mean_score": pa.array(s // n)})

    return agg.map_batches(final, batch_format="pyarrow",
                           zero_copy_batch=True)


def seasonal_index_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    ts_col: str,
    val_col: str,
) -> pd.DataFrame:
    """Day-of-week seasonality profile per group: for each
    (group, dow), ``n``, ``sum_val`` and the seasonal index in exact
    integer permille (``mean_dow / mean_overall``, cross-multiplied as
    ``sum_w * n_tot * 1000 // (n_w * sum_tot)``).  Day-of-week is
    computed from epoch days as ``(days + 4) % 7`` (0 = Sunday,
    locale/TZ-free -- matches DuckDB's dayofweek on naive timestamps).

    Plan: per-block (group, dow) sum/count Arrow partials, one
    vocabulary-shaped groupby (groups x 7 rows), per-group totals and
    the permille arithmetic on the tiny merged table in Python ints."""

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t[ts_col].combine_chunks().cast(
            pa.timestamp("us")), pa.int64()).to_numpy()
        dow = (us // 86_400_000_000 + 4) % 7
        tt = pa.table({
            group_col: t[group_col].combine_chunks(),
            "dow": pa.array(dow.astype(np.int64)),
            "_one": pa.array(np.ones(len(us), np.int64)),
            "_v": t[val_col].combine_chunks().cast(pa.int64())})
        g = tt.group_by([group_col, "dow"]).aggregate(
            [("_one", "sum"), ("_v", "sum")])
        return pa.table({group_col: g[group_col], "dow": g["dow"],
                         "_one": g["_one_sum"], "_v": g["_v_sum"]})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby([group_col, "dow"]).sum(["_one", "_v"])).to_pandas()
    agg = agg.rename(columns={"sum(_one)": "n", "sum(_v)": "sum_val"})
    tot = agg.groupby(group_col).agg(
        n_tot=("n", "sum"), s_tot=("sum_val", "sum"))
    idx = []
    for g_, n_, s_ in zip(agg[group_col], agg["n"], agg["sum_val"]):
        n_tot = int(tot.loc[g_, "n_tot"])
        s_tot = int(tot.loc[g_, "s_tot"])
        idx.append(int(s_) * n_tot * 1000 // (int(n_) * s_tot)
                   if int(n_) * s_tot else -1)
    out = agg[[group_col, "dow", "n", "sum_val"]].copy()
    out["dow"] = out["dow"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    out["sum_val"] = out["sum_val"].astype(np.int64)
    out["index_permille"] = np.asarray(idx, np.int64)
    return out
