"""Sequence packing for LLM pretraining: concatenate documents in a
deterministic global order and split the token stream into fixed-size
context windows (GPT-style packing).

Each document gets its global token offset (an exclusive prefix sum of
token counts in ``order_col`` order), the id of the window its first
token lands in, its offset within that window, and whether it spans a
window boundary.

The prefix sum is distributed the textbook way (two passes, no global
sort):
  1. one streaming pass computes per-range-bucket token sums -- a
     tiny table (one row per bucket) reaches the driver;
  2. the driver prefix-sums the bucket totals (K values) and the
     per-bucket offsets ride back into a range-partitioned second pass
     that cumsums within each bucket and adds its bucket's base.
Range bucketing (``order // width``, ORDER-PRESERVING -- not a hash)
keeps every bucket a contiguous slice of the global order, so the
in-bucket cumsum plus the bucket base IS the global prefix sum.
Partitioning assumption: one bucket (~rows/n_buckets) fits in a worker;
raise ``n_buckets`` at larger scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Max, Min

from ci_log_processing_ray.ops.window import resolve_group_buckets


def pack_fixed_windows(
    ds: ray.data.Dataset,
    order_col: str,
    len_col: str,
    window: int,
    *,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Assign each doc its global token offset and fixed-window slot.

    ``order_col`` must be a non-negative int64 defining the global
    concatenation order (dense ids are ideal; gaps are fine).  Output
    columns: order_col, tok_start, pack_id, offset_in_pack,
    spans_boundary (0/1) -- all int64.
    """
    # pass 0 (metadata-cheap): order-domain width for range bucketing
    lo, hi = _order_range(ds, order_col)
    n_buckets = resolve_group_buckets(n_buckets)
    width = max((hi - lo) // n_buckets + 1, 1)

    def bucket_of(arr: pa.Array) -> pa.Array:
        # integer division (non-negative after the lo shift) -- exact
        # for the full int64 id domain, unlike a float path
        return pc.divide(pc.cast(pc.subtract(arr, lo), pa.int64()),
                         pa.scalar(width, pa.int64()))

    # pass 1: per-bucket token sums (tiny -- one row per bucket/block)
    def bucket_sums(t: pa.Table) -> pa.Table:
        b = bucket_of(t[order_col].combine_chunks())
        tt = pa.table({"_b": b,
                       "_n": pc.cast(t[len_col].combine_chunks(), pa.int64())})
        g = tt.group_by("_b").aggregate([("_n", "sum")])
        return pa.table({"_b": g["_b"], "_n": g["_n_sum"]})

    sums = (ds.map_batches(bucket_sums, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_b").sum("_n").to_pandas())
    sums = sums.sort_values("_b")
    bucket_ids = sums["_b"].to_numpy()
    totals = sums["sum(_n)"].to_numpy()
    bases = np.zeros(n_buckets + 1, dtype=np.int64)
    # exclusive prefix: base of bucket b = sum of totals of buckets < b
    cum = np.cumsum(totals)
    for i, b in enumerate(bucket_ids):
        bases[b] = cum[i] - totals[i]
    bases_ref = ray.put(bases)

    # pass 2: range shuffle by bucket, in-bucket cumsum + bucket base
    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_b", bucket_of(t[order_col].combine_chunks()))

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(bases_ref)[int(g["_b"].iloc[0])]
        g = g.sort_values(order_col, kind="mergesort")
        n = g[len_col].to_numpy().astype(np.int64)
        start = base + np.cumsum(n) - n
        pack_id = start // window
        off = start - pack_id * window
        spans = ((off + n) > window).astype(np.int64)
        return pd.DataFrame({
            order_col: g[order_col].to_numpy(),
            "tok_start": start,
            "pack_id": pack_id,
            "offset_in_pack": off,
            "spans_boundary": spans,
        })

    return (ds.map_batches(add_bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_b").map_groups(assign, batch_format="pandas"))


def _order_range(ds: ray.data.Dataset, order_col: str) -> tuple[int, int]:
    """Min/max of the order column -- one cheap aggregate pass (Parquet
    sources answer it from row-group statistics where available)."""
    stats = ds.aggregate(Min(order_col), Max(order_col))
    return int(stats[f"min({order_col})"]), int(stats[f"max({order_col})"])


def pack_bins_ffd(
    ds: ray.data.Dataset,
    id_col: str,
    len_col: str,
    capacity: int,
    *,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Bin packing for LLM pretraining without document splitting
    (best-fit-decreasing style, cf. the public "fewer truncations" line
    of work): documents group into bins of at most ``capacity`` tokens;
    a doc with length >= capacity gets its own bin, flagged truncated
    when longer.

    Distributed approximation: docs hash into ``n_buckets`` independent
    packing domains (via the shared ``bucketed_groups`` shuffle), each
    domain packs docs in decreasing length order into the TIGHTEST
    viable free-space class -- open bins index into capacity/64-wide
    free-space classes with lazy-deletion stacks, so placement is
    amortized O(1) per doc instead of a linear scan over all open bins.
    Zero-length docs still claim a real >= 1-token slot so no offset
    ever reaches ``capacity``.  Bin ids are globally unique via
    domain << 32 | local index.  Output: id, bin_id, offset_in_bin,
    truncated (int64).
    """
    from ci_log_processing_ray.ops.window import bucketed_groups

    n_buckets = resolve_group_buckets(n_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        b = (pd.util.hash_array(np.ascontiguousarray(ids))
             % n_buckets).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            len_col: pc.cast(t[len_col].combine_chunks(), pa.int64()),
            "_pb": pa.array(b),
        })

    n_classes = 64
    cw = max(1, capacity // n_classes)

    def pack_domain(g: pd.DataFrame) -> pd.DataFrame:
        base = int(g["_pb"].iloc[0]) << 32
        g = g.sort_values([len_col, id_col], ascending=[False, True],
                          kind="mergesort")
        ids = g[id_col].to_numpy()
        lens = g[len_col].to_numpy()
        bin_free: list[int] = []
        classes: list[list[int]] = [[] for _ in range(n_classes + 1)]

        def class_of(free: int) -> int:
            return min(free // cw, n_classes)

        out_bin = np.empty(len(g), dtype=np.int64)
        out_off = np.empty(len(g), dtype=np.int64)
        out_trunc = np.zeros(len(g), dtype=np.int64)
        for i, ln in enumerate(lens):
            ln = int(ln)
            if ln >= capacity:
                bin_free.append(0)
                out_bin[i] = base + len(bin_free) - 1
                out_off[i] = 0
                out_trunc[i] = int(ln > capacity)
                continue
            need = max(ln, 1)  # zero-length docs still take a slot
            c0 = need // cw
            j = -1
            # exact class: entries may be stale (bin moved classes) or
            # too small within the class window -- scan lazily, keep
            # the non-viable live entries
            keepback = []
            cls = classes[c0]
            while cls:
                cand = cls.pop()
                free = bin_free[cand]
                if class_of(free) != c0:
                    continue  # stale entry; its live entry is elsewhere
                if free >= need:
                    j = cand
                    break
                keepback.append(cand)
            cls.extend(keepback)
            if j < 0:
                # tightest strictly-higher class: ANY live bin there has
                # free >= (c0+1)*cw >= need
                for c in range(c0 + 1, n_classes + 1):
                    cls = classes[c]
                    while cls:
                        cand = cls.pop()
                        if class_of(bin_free[cand]) != c:
                            continue
                        j = cand
                        break
                    if j >= 0:
                        break
            if j < 0:
                bin_free.append(capacity)
                j = len(bin_free) - 1
            out_bin[i] = base + j
            out_off[i] = capacity - bin_free[j]
            bin_free[j] -= ln
            classes[class_of(bin_free[j])].append(j)
        return pd.DataFrame({id_col: ids, "bin_id": out_bin,
                             "offset_in_bin": out_off,
                             "truncated": out_trunc})

    def pack_many(frame: pd.DataFrame) -> pd.DataFrame:
        outs = [pack_domain(d) for _, d in frame.groupby("_pb", sort=False)]
        return pd.concat(outs, ignore_index=True)

    keyed = ds.map_batches(add_bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
    return bucketed_groups(keyed, "_pb", pack_many, n_buckets=n_buckets)


def length_batches(
    ds: ray.data.Dataset,
    len_col: str,
    id_col: str,
    *,
    batch_size: int,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Length-sorted fixed-size micro-batches (the padding-minimizing
    batching step before training): rank every doc by
    (length DESC, id ASC), group consecutive ranks into batches of
    ``batch_size``, and report per-batch stats including the padding
    waste ``n_docs * max_len - sum_len`` (tokens burned when padding
    each batch to its own max -- near-zero when lengths are sorted,
    the whole point of length bucketing).

    Scale shape: the global rank is the row_number_global primitive
    (order-preserving range buckets + a driver prefix sum over
    n_buckets integers -- no global sort operator); batch stats are
    mergeable (count, max, sum) partials through one coarse bucketed
    exchange keyed on batch_id.  Output: batch_id, n_docs, max_len,
    sum_len, padding (all int64).
    """
    from ci_log_processing_ray.ops.window import (
        bucketed_groups, row_number_global)

    def keyed(t: pa.Table) -> pa.Table:
        ln = pc.cast(t[len_col].combine_chunks(), pa.int64())
        return pa.table({
            id_col: t[id_col],
            "_len": ln,
            # negate so ASC row numbering = length DESC
            "_neg": pc.multiply(ln, pa.scalar(-1, pa.int64())),
        })

    numbered = row_number_global(
        ds.map_batches(keyed, batch_format="pyarrow",
                       zero_copy_batch=True),
        "_neg", tie_cols=[id_col], n_buckets=n_buckets)

    def batch_partial(t: pa.Table) -> pa.Table:
        rn = t["row_num"].combine_chunks().to_numpy()
        ln = t["_len"].combine_chunks().to_numpy()
        bid = (rn - 1) // batch_size
        df = pd.DataFrame({"batch_id": bid, "_len": ln})
        g = df.groupby("batch_id", as_index=False).agg(
            n_docs=("_len", "size"), max_len=("_len", "max"),
            sum_len=("_len", "sum"))
        return pa.Table.from_pandas(g.astype(np.int64),
                                    preserve_index=False)

    partials = numbered.map_batches(batch_partial, batch_format="pyarrow")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("batch_id", as_index=False).agg(
            n_docs=("n_docs", "sum"), max_len=("max_len", "max"),
            sum_len=("sum_len", "sum"))
        out["padding"] = out["n_docs"] * out["max_len"] - out["sum_len"]
        return out

    return bucketed_groups(partials, "batch_id", finish,
                           n_buckets=n_buckets)
