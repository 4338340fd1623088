"""Distributed quantiles: exact (value-histogram) and approximate
(mergeable DDSketch-style log-histogram).

The reference computes latency percentiles over performance-JSON
metrics downstream (in OpenSearch dashboards); here they are engine
operators.

``quantile_disc_by_group`` is EXACT for bounded-cardinality value
domains (durations in ms, token counts, integer money): each batch
pre-aggregates to (group, value) -> count partials, so the shuffle
carries one row per distinct (group, value) pair per block -- never the
raw rows.  The final per-group pick (sort values, cumulative counts,
index ceil(q*n)-1, i.e. SQL ``percentile_disc`` / DuckDB
``quantile_disc``) runs over a table whose size is distinct-values, not
rows.  Partitioning assumption: distinct (group, value) pairs fit in
one worker per hash bucket -- raise ``n_buckets`` at larger scale.

``DDSketch`` is the unbounded-domain scale path: a fixed-gamma
log-histogram (Masson et al., "DDSketch: A Fast and Fully-Mergeable
Quantile Sketch with Relative-Error Guarantees", VLDB 2019 -- public
paper) whose partials are (bin, count) rows, merged by a tiny groupby
sum; any quantile is then answered with relative error <= (gamma-1)/
(gamma+1) from the merged histogram.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ci_log_processing_ray.ops.window import bucketed_groups


def quantile_disc_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs: dict[str, float],
    *,
    weight_col: str | None = None,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Exact per-group percentile_disc for integer-valued columns.

    ``qs`` maps output column name -> quantile (e.g. {"q50": 0.5}).
    Output: one row per group with int64 quantile columns.

    ``weight_col`` (int64) switches to the exact WEIGHTED percentile:
    a row counts ``weight`` times, identical to percentile_disc over
    the weight-expanded multiset -- same (group, value, weight-sum)
    partial exchange, no row expansion anywhere.
    """

    def partial(t: pa.Table) -> pa.Table:
        w = (pc.cast(t[weight_col].combine_chunks(), pa.int64())
             if weight_col is not None
             else pa.array(np.ones(len(t), dtype=np.int64)))
        tt = pa.table({
            group_col: t[group_col].combine_chunks(),
            "_v": pc.cast(t[value_col].combine_chunks(), pa.int64()),
            "_n": w,
        })
        g = tt.group_by([group_col, "_v"]).aggregate([("_n", "sum")])
        return pa.table({group_col: g[group_col], "_v": g["_v"],
                         "_n": g["_n_sum"]})

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        # bucket frame: counts for every (group, value) of its keys;
        # vectorized over the whole bucket -- one sort, per-group
        # cumulative counts, searchsorted rank pick per quantile.
        g = (g.groupby([group_col, "_v"], sort=False)["_n"].sum()
              .reset_index().sort_values([group_col, "_v"],
                                         kind="mergesort"))
        key = g[group_col].to_numpy()
        cnt = g["_n"].to_numpy()
        bounds = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        bounds = np.append(bounds, len(g))
        vals = g["_v"].to_numpy()
        out = {group_col: key[bounds[:-1]]}
        cum = np.cumsum(cnt)
        seg_tot = cum[bounds[1:] - 1] - np.r_[0, cum[bounds[1:-1] - 1]]
        for name, q in qs.items():
            ranks = np.ceil(q * seg_tot).astype(np.int64)
            ranks = np.maximum(ranks, 1)
            picks = np.empty(len(seg_tot), dtype=np.int64)
            for i, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
                seg_cum = cum[s:e] - (cum[s - 1] if s else 0)
                picks[i] = vals[s + np.searchsorted(seg_cum, ranks[i])]
            out[name] = picks
        return pd.DataFrame(out)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return bucketed_groups(partials, group_col, pick, n_buckets=n_buckets)


def quantile_cont_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs: dict[str, float],
    *,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Exact per-group percentile_cont (linear interpolation at
    position q*(n-1), DuckDB/Postgres semantics) over integer-valued
    columns, same (group, value)->count partial shuffle as
    ``quantile_disc_by_group``.

    Float-determinism: with integer values and DYADIC quantiles
    (0.25, 0.5, 0.75, ...) the interpolation ``v_lo + (v_hi-v_lo)*frac``
    is exact in IEEE double, so results hash-compare exactly against a
    SQL oracle; non-dyadic q may differ in the last ulp.
    """

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({
            group_col: t[group_col].combine_chunks(),
            "_v": pc.cast(t[value_col].combine_chunks(), pa.int64()),
            "_n": pa.array(np.ones(len(t), dtype=np.int64)),
        })
        g = tt.group_by([group_col, "_v"]).aggregate([("_n", "sum")])
        return pa.table({group_col: g[group_col], "_v": g["_v"],
                         "_n": g["_n_sum"]})

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.groupby([group_col, "_v"], sort=False)["_n"].sum()
              .reset_index().sort_values([group_col, "_v"],
                                         kind="mergesort"))
        key = g[group_col].to_numpy()
        cnt = g["_n"].to_numpy()
        vals = g["_v"].to_numpy().astype(np.float64)
        bounds = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        bounds = np.append(bounds, len(g))
        out = {group_col: key[bounds[:-1]]}
        for name, q in qs.items():
            res = np.empty(len(bounds) - 1, dtype=np.float64)
            for i, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
                seg_cum = np.cumsum(cnt[s:e])
                n = seg_cum[-1]
                pos = q * (n - 1)
                lo = int(np.floor(pos))
                frac = pos - lo
                # value at 0-based rank r = first value with cum > r
                v_lo = vals[s + np.searchsorted(seg_cum, lo, side="right")]
                if frac == 0.0:
                    res[i] = v_lo
                else:
                    v_hi = vals[s + np.searchsorted(seg_cum, lo + 1,
                                                    side="right")]
                    res[i] = v_lo + (v_hi - v_lo) * frac
            out[name] = res
        return pd.DataFrame(out)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return bucketed_groups(partials, group_col, pick, n_buckets=n_buckets)


# ---------------------------------------------------------------------------
# DDSketch: mergeable approximate quantiles with relative-error guarantee
# ---------------------------------------------------------------------------
class DDSketch:
    """Log-histogram quantile sketch over positive values.

    relative error <= alpha where gamma = (1+alpha)/(1-alpha).
    Partials are (bin_index, count) pairs -- fixed-size, mergeable by
    addition, exactly like the HLL registers in ops/sketch.py.
    """

    def __init__(self, alpha: float = 0.01):
        self.alpha = alpha
        self.gamma = (1 + alpha) / (1 - alpha)
        self._log_gamma = np.log(self.gamma)

    def bins(self, values: np.ndarray) -> np.ndarray:
        """Bin index per value (values must be > 0)."""
        return np.ceil(np.log(values) / self._log_gamma).astype(np.int64)

    def value(self, bin_idx: np.ndarray) -> np.ndarray:
        """Midpoint estimate for a bin: 2*gamma^i/(gamma+1)."""
        return 2.0 * np.power(self.gamma, bin_idx.astype(np.float64)) / (
            self.gamma + 1)

    def partial_table(self, values: np.ndarray) -> pa.Table:
        pos = values[values > 0]
        b, n = np.unique(self.bins(pos), return_counts=True)
        nz = int((values <= 0).sum())
        if nz:
            b = np.r_[np.iinfo(np.int64).min, b]
            n = np.r_[nz, n]
        return pa.table({"bin": pa.array(b), "n": pa.array(n.astype(np.int64))})

    def quantiles(self, merged: pd.DataFrame, qs: list[float]) -> list[float]:
        """Answer quantiles from the merged (bin, n) histogram."""
        m = merged.sort_values("bin")
        bins = m["bin"].to_numpy()
        cum = np.cumsum(m["n"].to_numpy())
        total = cum[-1]
        out = []
        for q in qs:
            rank = max(int(np.ceil(q * total)), 1)
            i = int(np.searchsorted(cum, rank))
            b = bins[i]
            out.append(0.0 if b == np.iinfo(np.int64).min
                       else float(self.value(np.array([b]))[0]))
        return out


def approx_quantiles(
    ds: ray.data.Dataset,
    value_col: str,
    qs: list[float],
    *,
    alpha: float = 0.01,
) -> list[float]:
    """Global approximate quantiles: per-batch DDSketch partials ->
    tiny (bin, n) groupby sum -> driver-side answer.  The shuffle moves
    at most O(log(max/min)/alpha) rows per block regardless of data
    size."""
    sk = DDSketch(alpha)

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        return sk.partial_table(v.astype(np.float64))

    merged = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("bin").sum("n").to_pandas())
    merged = merged.rename(columns={"sum(n)": "n"})
    return sk.quantiles(merged, qs)


def mad_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    x_col: str,
    *,
    n_buckets: int | None = None,
) -> pa.Table:
    """Median absolute deviation per group -- the robust spread
    statistic (median of |x - group median|), exact in int64 via two
    passes of the exact distributed percentile op: the per-group
    median table (group-cardinality-sized) broadcasts once, a pure map
    emits deviations, and a second percentile pass yields the MAD.
    Output: (group, med, mad), one row per group.

    Both exchanges carry (group, value, count) pre-aggregates, never
    rows -- the same scale contract as quantile_disc_by_group."""
    import ray

    med = (quantile_disc_by_group(ds, group_col, x_col, {"med": 0.5},
                                  n_buckets=n_buckets)
           .to_pandas().sort_values(group_col))
    med_ref = ray.put((med[group_col].to_numpy().astype(object),
                       med["med"].to_numpy().astype(np.int64)))

    def dev(t: pa.Table) -> pa.Table:
        keys, m = ray.get(med_ref)
        g = t[group_col].combine_chunks().to_numpy(zero_copy_only=False)
        x = pc.cast(t[x_col].combine_chunks(), pa.int64()).to_numpy()
        d = np.abs(x - m[np.searchsorted(keys, g)])
        return pa.table({group_col: t[group_col], "dev": pa.array(d)})

    mad = (quantile_disc_by_group(
        ds.map_batches(dev, batch_format="pyarrow", zero_copy_batch=True),
        group_col, "dev", {"mad": 0.5}, n_buckets=n_buckets)
        .to_pandas())
    out = med.merge(mad, on=group_col).sort_values(group_col)
    return pa.table({group_col: pa.array(out[group_col]),
                     "med": pa.array(out["med"].to_numpy(np.int64)),
                     "mad": pa.array(out["mad"].to_numpy(np.int64))})


def approx_quantiles_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs: dict[str, float],
    *,
    alpha: float = 0.01,
) -> pd.DataFrame:
    """Per-group approximate quantiles via grouped DDSketch partials:
    each block emits (group, bin, n) rows -- at most
    groups x O(log(max/min)/alpha) per block, fixed-size and mergeable
    by addition -- then one small groupby-sum and a driver-side answer
    per group.  The approximate per-group companion to
    quantile_disc_by_group (exact), with relative error <= alpha.
    Returns a pandas frame: group_col + one column per ``qs`` key."""
    sk = DDSketch(alpha)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": t[group_col].to_pylist(),
            "v": t[value_col].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.float64),
        })
        gs, bs, ns = [], [], []
        for g, sub in df.groupby("g", sort=False):
            pt = sk.partial_table(sub["v"].to_numpy())
            k = len(pt)
            gs.extend([g] * k)
            bs.append(pt["bin"].to_numpy())
            ns.append(pt["n"].to_numpy())
        if not gs:
            return pa.table({group_col: pa.array([], pa.string()),
                             "bin": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({group_col: pa.array(gs),
                         "bin": pa.array(np.concatenate(bs)),
                         "n": pa.array(np.concatenate(ns))})

    merged = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby([group_col, "bin"]).sum("n").to_pandas()
              .rename(columns={"sum(n)": "n"}))
    rows = []
    for g, sub in merged.groupby(group_col, sort=True):
        vals = sk.quantiles(sub, list(qs.values()))
        rows.append({group_col: g,
                     **dict(zip(qs.keys(), vals))})
    return pd.DataFrame(rows)


def gini_coefficient_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    *,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-group Gini COEFFICIENT of a non-negative int64 value column
    (inequality of a continuous magnitude -- the dual of the
    categorical HHI/impurity pair), exact permille:

        gini_permille = (1000 * num) // (n * S)
        num = sum_i (2i - n - 1) * x_(i)   (x sorted ascending)

    Ties make num permutation-invariant, so the value is well-defined;
    num >= 0, so truncation equals floor and SQL agrees exactly.
    Groups with S = 0 are dropped.

    Scale shape: the corpus collapses to per-(group, DISTINCT value)
    count partials per block (the quantile_disc exchange -- bounded by
    the value DOMAIN, never the row count), one coarse bucketed
    exchange, then the rank-run identity

        num = sum_k v_k * c_k * (C_k + C_{k-1} - n)

    over each group's distinct values (C = cumulative counts) folds in
    exact Python ints -- value-domain-shaped work, wrap-safe at any n.

    Output: (group_col, n_obs, gini_permille) with n_obs int64."""

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({
            group_col: t[group_col].combine_chunks(),
            "_v": pc.cast(t[value_col].combine_chunks(), pa.int64()),
            "_n": pa.array(np.ones(len(t), dtype=np.int64)),
        })
        g = tt.group_by([group_col, "_v"]).aggregate([("_n", "sum")])
        return pa.table({group_col: g[group_col], "_v": g["_v"],
                         "_n": g["_n_sum"]})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        out_g: list = []
        out_n: list[int] = []
        out_p: list[int] = []
        if len(g):
            g = (g.groupby([group_col, "_v"], sort=False)["_n"].sum()
                 .reset_index().sort_values([group_col, "_v"],
                                            kind="mergesort"))
            key = g[group_col].to_numpy()
            bounds = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
            bounds = np.append(bounds, len(g))
            vals = g["_v"].to_numpy()
            cnts = g["_n"].to_numpy()
            for s, e in zip(bounds[:-1], bounds[1:]):
                v, c = vals[s:e], cnts[s:e]
                n = int(c.sum())
                S = int((v.astype(object) * c.astype(object)).sum())
                if S <= 0:
                    continue
                num = 0
                C = 0
                for vk, ck in zip(v.tolist(), c.tolist()):
                    num += vk * ck * (2 * C + ck - n)
                    C += ck
                out_g.append(key[s])
                out_n.append(n)
                out_p.append((1000 * num) // (n * S))
        gdtype = g[group_col].dtype if len(g) else object
        return pd.DataFrame({
            group_col: pd.Series(out_g, dtype=gdtype),
            "n_obs": pd.Series(out_n, dtype=np.int64),
            "gini_permille": pd.Series(out_p, dtype=np.int64)})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return bucketed_groups(partials, group_col, kern,
                           n_buckets=n_buckets)
