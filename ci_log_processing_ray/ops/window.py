"""Stream-shaped operators over an ordered, partitioned event log.

Ray Data has no event-time windows; these express the reference's
order-dependent semantics (ST3 carry-forward) and classic sessionization
over a SINGLE coarse bucketed shuffle: rows route to hash(key) % 64
partitions, and the per-bucket kernel sorts once by (key, order) and
runs a vectorized pass over the whole bucket.  At high key cardinality
this is the difference between 64 map_groups dispatches and one
dispatch per distinct key (the proven pattern from
ops/dedup.py:ngram_jaccard_pairs).  Partitioning assumption: one
BUCKET (≈ corpus/64) fits in a worker's heap; raise ``n_buckets`` to
shrink buckets at larger scale.
"""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

DEFAULT_GROUP_BUCKETS = 64


def _key_buckets(arr: np.ndarray, n_buckets: int) -> np.ndarray:
    if arr.dtype.kind not in "iufb":
        arr = arr.astype(object)
    return (pd.util.hash_array(arr) % n_buckets).astype(np.int32)


def bucketed_groups(
    ds: ray.data.Dataset,
    group_col: str,
    per_bucket,
    *,
    n_buckets: int = DEFAULT_GROUP_BUCKETS,
) -> ray.data.Dataset:
    """hash(group) % n_buckets coarse shuffle + one pandas kernel per
    bucket.  ``per_bucket`` receives the bucket frame (NOT yet sorted,
    ``_kb`` column already removed) holding every row of each of its
    keys, and must be vectorized over the whole bucket."""

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t[group_col].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column(
            "_kb", pa.array(_key_buckets(k, n_buckets)))

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return per_bucket(g.drop(columns="_kb"))

    return ds.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("_kb").map_groups(run, batch_format="pandas")


def forward_fill_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    order_col: str,
    value_col: str,
    *,
    fill_leading,
    out_col: str | None = None,
    n_buckets: int = DEFAULT_GROUP_BUCKETS,
) -> ray.data.Dataset:
    """Per-group ordered forward fill (the generalized M2 carry-forward):
    nulls inherit the last non-null value earlier in the group; leading
    nulls get ``fill_leading``.  One sort + a cython groupby-ffill per
    bucket."""
    out = out_col or value_col

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, order_col], kind="mergesort").copy()
        g[out] = g.groupby(group_col, sort=False)[value_col].ffill()
        g[out] = g[out].fillna(fill_leading)
        return g

    return bucketed_groups(ds, group_col, fill, n_buckets=n_buckets)


def sessionize(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    *,
    gap: datetime.timedelta,
    tiebreak_cols: list[str] | None = None,
    n_buckets: int = DEFAULT_GROUP_BUCKETS,
) -> ray.data.Dataset:
    """Assign session ids per key: a new session starts when the gap to
    the previous event exceeds ``gap``.  Adds ``session_id`` (0-based
    per key, in (ts, *tiebreak) order -- pass tiebreaks for determinism
    when timestamps can tie).  Whole-bucket vectorized: one sort by
    (key, ts, *tiebreaks), boundary-aware cumsum, no per-key kernel."""
    order = [ts_col] + list(tiebreak_cols or [])

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col] + order, kind="mergesort").copy()
        key = g[key_col]
        newkey = key.ne(key.shift()).to_numpy()
        gapped = (g[ts_col].diff() > gap).to_numpy()
        start = newkey | gapped
        s = np.cumsum(start)
        base = np.maximum.accumulate(np.where(newkey, s, 0))
        g["session_id"] = (s - base).astype(np.int64)
        return g

    return bucketed_groups(ds, key_col, assign, n_buckets=n_buckets)


def lag_diff_by_group(
    ds: "ray.data.Dataset",
    group_col: str,
    ts_col: str,
    id_col: str,
    *,
    tiebreak_col: str | None = None,
    sentinel: int = -1,
    out_col: str = "gap_us",
    n_buckets: int = DEFAULT_GROUP_BUCKETS,
) -> "ray.data.Dataset":
    """SQL ``lag()`` delta: for each row, microseconds since the
    previous row of the same group in (ts, tiebreak) order; the first
    row of each group gets ``sentinel`` (int64 throughout -- no
    NaN-bearing upcast, the dtype leak class fixed in relational.py).
    Whole-bucket vectorized: one sort, one diff, group-boundary mask."""
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col] + order, kind="mergesort")
        ts = g[ts_col].to_numpy()
        key = g[group_col].to_numpy()
        gap = np.empty(len(g), dtype=np.int64)
        if len(g):
            gap[1:] = ((ts[1:] - ts[:-1])
                       .astype("timedelta64[us]").astype(np.int64))
            first = np.r_[True, key[1:] != key[:-1]]
            gap[first] = sentinel
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             group_col: key, out_col: gap})

    return bucketed_groups(ds, group_col, kern, n_buckets=n_buckets)


def running_total_by_group(
    ds: "ray.data.Dataset",
    group_col: str,
    order_cols: list[str],
    value_col: str,
    id_col: str,
    *,
    out_col: str = "running_total",
    n_buckets: int = DEFAULT_GROUP_BUCKETS,
) -> "ray.data.Dataset":
    """SQL ``sum() OVER (PARTITION BY key ORDER BY ... ROWS UNBOUNDED
    PRECEDING)``: per-key cumulative sum in the given order.  Whole-
    bucket vectorized: global cumsum minus the segment-start offset."""

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col] + order_cols, kind="mergesort")
        key = g[group_col].to_numpy()
        v = g[value_col].to_numpy()
        cs = np.cumsum(v)
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        # cumulative total just BEFORE each segment, broadcast per row
        seg_lens = np.diff(np.append(starts, len(g)))
        base = np.repeat(np.r_[0, cs[starts[1:] - 1]], seg_lens)
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             group_col: key,
                             out_col: cs - base})

    return bucketed_groups(ds, group_col, kern, n_buckets=n_buckets)


def rank_by_group(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    id_col: str,
    *,
    descending: bool = True,
    n_buckets: int = DEFAULT_GROUP_BUCKETS,
) -> "ray.data.Dataset":
    """SQL ``rank()`` and ``dense_rank()`` per group ordered by
    ``value_col``: peers (equal values) share a rank; rank skips after
    ties, dense_rank does not.  Whole-bucket vectorized (one sort +
    boundary cumsums, no per-key dispatch)."""

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, value_col], kind="mergesort",
                          ascending=[True, not descending])
        key = g[group_col].to_numpy()
        v = g[value_col].to_numpy()
        n = len(g)
        newkey = np.r_[True, key[1:] != key[:-1]]
        newval = np.r_[True, (v[1:] != v[:-1])] | newkey
        idx = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(newkey, idx, 0))
        # rank: 1 + rows before the first peer within the segment
        peer_start = np.maximum.accumulate(np.where(newval, idx, 0))
        rank = peer_start - seg_start + 1
        # dense_rank: distinct-value counter within the segment
        dr = np.cumsum(newval)
        dense = dr - np.maximum.accumulate(np.where(newkey, dr, 0)) + 1
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             group_col: key,
                             "rank": rank.astype(np.int64),
                             "dense_rank": dense.astype(np.int64)})

    return bucketed_groups(ds, group_col, kern, n_buckets=n_buckets)


def rolling_count_by_group(
    ds: "ray.data.Dataset",
    group_col: str,
    ts_col: str,
    id_col: str,
    window,
    *,
    n_buckets: int = DEFAULT_GROUP_BUCKETS,
) -> "ray.data.Dataset":
    """SQL RANGE-frame rolling count: for each row, the number of rows
    of the same group with ts in [row.ts - window, row.ts] (peers with
    EQUAL timestamps all count, exactly like ``RANGE BETWEEN <window>
    PRECEDING AND CURRENT ROW``).  Per-bucket kernel: one sort by
    (key, ts), then two searchsorted passes per key SLICE (numpy over
    contiguous views; the per-slice loop is in-worker, not a dispatch)
    -- deliberately NOT pandas ``rolling`` whose ROW-based tie handling
    diverges from SQL."""

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, ts_col], kind="mergesort")
        ts = g[ts_col].to_numpy()
        key = g[group_col].to_numpy()
        n = len(g)
        bounds = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        bounds = np.append(bounds, n)
        out = np.empty(n, dtype=np.int64)
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = ts[s:e]
            hi = np.searchsorted(seg, seg, side="right")
            lo = np.searchsorted(seg, seg - window, side="left")
            out[s:e] = hi - lo
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             "n_in_window": out})

    return bucketed_groups(ds, group_col, roll, n_buckets=n_buckets)


def ntile_by_group(
    ds: "ray.data.Dataset",
    group_col: str,
    order_cols: list[str],
    id_col: str,
    n_tiles: int,
    *,
    out_col: str = "tile",
    n_buckets: int = DEFAULT_GROUP_BUCKETS,
) -> "ray.data.Dataset":
    """SQL ``ntile(n) OVER (PARTITION BY group ORDER BY ...)``: rows of
    each group split into ``n`` tiles as equal as possible, the first
    ``count mod n`` tiles one row larger (the SQL-standard fill rule).
    Pass a unique tie-break in ``order_cols`` for determinism.  Whole-
    bucket vectorized: one sort, segment arithmetic, no per-key kernel."""

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col] + order_cols, kind="mergesort")
        key = g[group_col].to_numpy()
        n = len(g)
        idx = np.arange(n, dtype=np.int64)
        newkey = np.r_[True, key[1:] != key[:-1]] if n else np.array([], bool)
        seg_start = np.maximum.accumulate(np.where(newkey, idx, 0))
        starts = np.flatnonzero(newkey)
        seg_lens = np.diff(np.append(starts, n))
        size = np.repeat(seg_lens, seg_lens)          # group size per row
        pos = idx - seg_start                         # 0-based row in group
        q, r = size // n_tiles, size % n_tiles
        # rows 0 .. (q+1)*r-1 fall in the r big tiles of size q+1
        big = pos < (q + 1) * r
        tile = np.where(big, pos // np.maximum(q + 1, 1),
                        r + (pos - (q + 1) * r) // np.maximum(q, 1)) + 1
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             group_col: key,
                             out_col: tile.astype(np.int64)})

    return bucketed_groups(ds, group_col, kern, n_buckets=n_buckets)


def hopping_window_agg(
    ds: "ray.data.Dataset",
    ts_col: str,
    value_col: str,
    *,
    window_s: int,
    hop_s: int,
) -> "ray.data.Dataset":
    """Hopping (sliding) event-time windows: every event lands in
    ``window_s / hop_s`` overlapping windows; per-window count and
    integer-cents value sum.  The window explode and the aggregation
    partials happen INSIDE each batch (one Arrow group_by), so the
    shuffle carries (window, count, cents) partials -- bounded by
    distinct windows per block, never the exploded rows.  Output:
    window_start_s (epoch seconds, int64), n_events, value_cents."""
    if window_s % hop_s:
        raise ValueError("window_s must be a multiple of hop_s")
    n_hops = window_s // hop_s

    def partial(t: pa.Table) -> pa.Table:
        ts = t[ts_col].combine_chunks().to_numpy().astype(
            "datetime64[us]").astype(np.int64)
        sec = ts // 1_000_000
        hb = sec // hop_s
        v = t[value_col].combine_chunks().to_numpy()
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        # each event's n_hops window starts, exploded batch-locally
        starts = ((hb[:, None] - np.arange(n_hops, dtype=np.int64))
                  * hop_s).reshape(-1)
        tt = pa.table({
            "window_start_s": pa.array(starts),
            "n_events": pa.array(np.ones(len(starts), dtype=np.int64)),
            "value_cents": pa.array(np.repeat(cents, n_hops)),
        })
        g = tt.group_by("window_start_s").aggregate(
            [("n_events", "sum"), ("value_cents", "sum")])
        return pa.table({"window_start_s": g["window_start_s"],
                         "n_events": g["n_events_sum"],
                         "value_cents": g["value_cents_sum"]})

    from ray.data.aggregate import Sum

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("window_start_s").aggregate(
                Sum("n_events", alias_name="n_events"),
                Sum("value_cents", alias_name="value_cents")))


def tag_late_events(
    ds: "ray.data.Dataset",
    arrival_col: str,
    ts_col: str,
    *,
    allowed_lateness_us: int,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Watermark-style late-data tagging: an event is LATE when its
    event time trails the high-water mark of everything that ARRIVED
    before it (max event-time over preceding arrival order) by more
    than ``allowed_lateness_us``.

    Distributed running max without a global sort: ``arrival_col``
    range-buckets preserve arrival order (the ops/pack.py pattern), a
    tiny per-bucket max table prefix-maxes on the driver, and each
    bucket's kernel runs one vectorized cummax seeded with its
    predecessor buckets' watermark.  Output: arrival_col, is_late
    (int64 0/1; the first-arriving event is never late)."""
    from ray.data.aggregate import Max, Min

    stats = ds.aggregate(Min(arrival_col), Max(arrival_col))
    lo = int(stats[f"min({arrival_col})"])
    hi = int(stats[f"max({arrival_col})"])
    width = max((hi - lo) // n_buckets + 1, 1)

    def bucket_of(arr: pa.Array) -> pa.Array:
        import pyarrow.compute as pc

        return pc.divide(pc.cast(pc.subtract(arr, lo), pa.int64()),
                         pa.scalar(width, pa.int64()))

    def bucket_max(t: pa.Table) -> pa.Table:
        b = bucket_of(t[arrival_col].combine_chunks())
        # normalize to MICROSECONDS regardless of the source's timestamp
        # unit (an in-memory source can carry timestamp[s]; the kernel
        # below always works in us)
        ts = (t[ts_col].combine_chunks().cast(pa.timestamp("us"))
              .cast(pa.int64()))
        tt = pa.table({"_b": b, "_m": ts})
        g = tt.group_by("_b").aggregate([("_m", "max")])
        return pa.table({"_b": g["_b"], "_m": g["_m_max"]})

    maxes = (ds.map_batches(bucket_max, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("_b").max("_m").to_pandas().sort_values("_b"))
    # watermark entering bucket b = max event time of buckets < b
    SENTINEL = np.iinfo(np.int64).min // 4  # "- lateness" cannot underflow
    seed = np.full(n_buckets + 1, SENTINEL, dtype=np.int64)
    run = SENTINEL
    by_b = dict(zip(maxes["_b"].astype(int), maxes["max(_m)"]))
    for b in range(n_buckets + 1):
        seed[b] = run
        if b in by_b:
            run = max(run, int(by_b[b]))
    seed_ref = ray.put(seed)

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_b", bucket_of(t[arrival_col].combine_chunks()))

    def tag(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(seed_ref)[int(g["_b"].iloc[0])]
        g = g.sort_values(arrival_col, kind="mergesort")
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        # watermark BEFORE each row: running max shifted by one
        run = np.maximum.accumulate(np.r_[base, ts[:-1]])
        late = (ts < run - allowed_lateness_us).astype(np.int64)
        return pd.DataFrame({arrival_col: g[arrival_col].to_numpy(),
                             "is_late": late})

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_b").map_groups(tag, batch_format="pandas"))
