"""Dataset profiling: per-column row / null / exact-distinct counts.

The profiling report every curation pipeline starts from.  Row and
null counts combine as one-pass mergeable partials (a single streaming
pass, bytes-sized result).  Exact distinct counts run one per-column
distinct each -- kept NATIVE-dtype end-to-end (per-batch ``unique``
partial to shrink the exchange, then a distributed groupby whose row
count is the answer), so no string-representation drift can diverge
from a SQL oracle's ``COUNT(DISTINCT col)``.  Nulls are excluded from
the distinct, matching SQL semantics.

At 100 TB an exact distinct per column is a deliberate cost (each is
its own shuffle of the column's unique values); the approximate
alternative is ``ops/sketch.py``'s HyperLogLog, one pass for ALL
columns.  This operator is the exact small-report variant.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum


def profile_columns(ds: ray.data.Dataset, cols: list[str]) -> pa.Table:
    """Return a pyarrow Table (col_name, n, n_null, n_distinct), one
    row per profiled column, sorted by col_name."""

    def count_partials(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({
            "col_name": pa.array(list(cols)),
            "n": pa.array([n] * len(cols), type=pa.int64()),
            "n_null": pa.array([t[c].null_count for c in cols],
                               type=pa.int64())})

    def run_counts():
        return (ds.map_batches(count_partials, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("col_name")
                .aggregate(Sum("n", alias_name="n"),
                           Sum("n_null", alias_name="n_null"))
                .to_pandas().set_index("col_name"))

    def run_distinct(c: str) -> int:
        # distinct-value cardinality is corpus-shaped (id columns), so
        # the global dedup runs through the coarse-bucket kernel --
        # native groupby pays per-distinct-group merge cost there
        # (ops/window.py:bucketed_sum rationale)
        from .window import bucketed_distinct

        def batch_unique(t: pa.Table, _c=c) -> pa.Table:
            v = t[_c].combine_chunks().drop_null().unique()
            return pa.table({_c: v})

        return bucketed_distinct(
            ds.select_columns([c])
            .map_batches(batch_unique, batch_format="pyarrow",
                         zero_copy_batch=True), [c]).count()

    # the count pass and the per-column distincts are independent Ray
    # jobs; launch them together from driver threads so their stages
    # interleave on the cluster instead of running back-to-back
    with ThreadPoolExecutor(max_workers=len(cols) + 1) as ex:
        counts_f = ex.submit(run_counts)
        distinct_f = {c: ex.submit(run_distinct, c) for c in cols}
        counts = counts_f.result()
        n_distinct = {c: f.result() for c, f in distinct_f.items()}

    order = sorted(cols)
    return pa.table({
        "col_name": pa.array(order),
        "n": pa.array([int(counts.loc[c, "n"]) for c in order],
                      type=pa.int64()),
        "n_null": pa.array([int(counts.loc[c, "n_null"]) for c in order],
                           type=pa.int64()),
        "n_distinct": pa.array([int(n_distinct[c]) for c in order],
                               type=pa.int64())})


def check_contract(
    ds: ray.data.Dataset,
    rules: dict,
    *,
    unique_keys: dict | None = None,
) -> pa.Table:
    """Data-quality contract report: ``rules`` maps a rule name to a
    vectorized predicate ``pa.Table -> pa.BooleanArray`` marking
    VIOLATING rows; ``unique_keys`` maps a rule name to a key-column
    list whose duplicates (rows beyond the first per key) violate.
    Returns (rule, n_violations) sorted by rule -- the schema-contract
    gate a pipeline runs before promoting a dataset.

    Scale shape: every predicate rule folds into ONE shared streaming
    pass of bytes-sized count partials; each uniqueness rule adds one
    key-hash exchange of per-block (key, n) pre-aggregates (distinct
    keys, never rows).  Nothing corpus-sized reaches the driver."""
    import pyarrow.compute as pc

    names = sorted(rules)

    def partial(t: pa.Table) -> pa.Table:
        counts = []
        for r in names:
            mask = rules[r](t)
            if isinstance(mask, pa.ChunkedArray):
                mask = mask.combine_chunks()
            counts.append(pc.sum(mask, min_count=0).as_py() or 0)
        return pa.table({"rule": pa.array(names),
                         "n_violations": pa.array(counts, pa.int64())})

    def run_predicates():
        if not names:
            return {}
        out = (ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby("rule")
               .aggregate(Sum("n_violations", alias_name="v"))
               .to_pandas())
        return dict(zip(out["rule"], out["v"].astype(int)))

    def run_unique(keys: list[str]) -> int:
        # key cardinality is corpus-shaped (primary keys), so the
        # global count runs through the coarse-bucket sum kernel
        from .window import bucketed_sum

        def key_counts(t: pa.Table) -> pa.Table:
            g = (t.select(keys)
                 .append_column("_n", pa.array([1] * len(t), pa.int64()))
                 .group_by(keys).aggregate([("_n", "sum")]))
            return pa.table({**{k: g[k] for k in keys},
                             "_n": g["_n_sum"]})

        per_key = bucketed_sum(
            ds.map_batches(key_counts, batch_format="pyarrow",
                           zero_copy_batch=True), keys, ["_n"])

        def dups(df):
            extra = int((df["_n"].to_numpy() - 1).sum())
            return pa.table({"d": pa.array([extra], pa.int64())})

        total = (per_key.map_batches(dups, batch_format="pandas")
                 .sum("d"))
        return int(total or 0)

    with ThreadPoolExecutor(max_workers=len(unique_keys or {}) + 1) as ex:
        pred_f = ex.submit(run_predicates)
        uniq_f = {r: ex.submit(run_unique, ks)
                  for r, ks in (unique_keys or {}).items()}
        got = pred_f.result()
        for r, f in uniq_f.items():
            got[r] = f.result()

    order = sorted(got)
    return pa.table({"rule": pa.array(order),
                     "n_violations": pa.array([got[r] for r in order],
                                              pa.int64())})


def dataset_checksum(
    ds: ray.data.Dataset,
    cols: list[str],
    *,
    mod: int = (1 << 61) - 1,
) -> pa.Table:
    """Order-independent content checksum: sum over rows of
    md5-60bit('col1|col2|...') modulo a Mersenne prime, plus the row
    count -- the cheap equality witness for migration validation and
    replica comparison (two datasets match iff (n_rows, checksum)
    match, regardless of partitioning or row order).

    Scale shape: one streaming pass; each block reduces to TWO
    integers (count, modular partial sum), the driver folds the
    block-count-sized partial table.  md5 is C-speed hashlib per row;
    the serialization ('|'-joined string casts) is pinned so a SQL
    engine can reproduce the value exactly."""
    import hashlib

    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        parts = []
        for i, c in enumerate(cols):
            if i:
                parts.append("|")
            parts.append(pc.cast(t[c].combine_chunks(), pa.string()))
        parts.append("")
        keys = pc.binary_join_element_wise(*parts)
        s = 0
        for v in keys.to_pylist():
            s = (s + int(hashlib.md5(v.encode()).hexdigest()[:15], 16)) % mod
        return pa.table({"n": pa.array([len(t)], pa.int64()),
                         "partial": pa.array([s], pa.int64())})

    parts = (ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas())
    # fold in Python ints: a numpy sum of ~2^61-sized partials wraps
    checksum = sum(int(v) for v in parts["partial"]) % mod
    return pa.table({
        "n_rows": pa.array([int(parts["n"].sum())], pa.int64()),
        "checksum": pa.array([checksum], pa.int64())})


# floor(1000 * log10(1 + 1/d)) for d = 1..9 -- fixed integer contract
# (hardcoded so the engine and any SQL oracle share EXACT constants
# rather than each re-deriving floats)
BENFORD_PERMILLE = (301, 176, 124, 96, 79, 66, 57, 51, 45)


def benford_deviation(
    ds: ray.data.Dataset,
    value_col: str,
) -> ray.data.Dataset:
    """First-digit Benford's-law audit of a positive int64 column --
    the classic fabricated-data / unit-mixup detector for financial
    and measurement fields.  Emits one row per leading digit 1..9:
    observed count, observed permille (floor), the fixed Benford
    permille constant, and the absolute deviation.

    Scale shape: embarrassingly parallel -- per-block leading-digit
    counts (Arrow cast-to-string + slice, no per-row Python), one
    9-key vocabulary-sized groupby sum, constants applied in a final
    tiny kernel.  Non-positive values are excluded (Benford is
    defined on positive magnitudes).

    Output: (digit, n, obs_permille, benford_permille,
    abs_dev_permille), all int64.
    """
    import numpy as np
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        x = t[value_col].combine_chunks()
        x = x.filter(pc.greater(x, 0))
        lead = pc.utf8_slice_codeunits(
            pc.cast(x, pa.string()), 0, 1)
        dig = pc.cast(lead, pa.int64())
        vc = dig.value_counts()
        return pa.table({"digit": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("digit").sum("n").to_pandas())
    dig = counts["digit"].to_numpy().astype(np.int64)
    n = counts["sum(n)"].to_numpy().astype(np.int64)
    total = int(n.sum())
    obs = (1000 * n) // max(total, 1)
    bp = np.array([BENFORD_PERMILLE[d - 1] for d in dig], np.int64)
    order = np.argsort(dig)
    return ray.data.from_arrow(pa.table({
        "digit": pa.array(dig[order]),
        "n": pa.array(n[order]),
        "obs_permille": pa.array(obs[order]),
        "benford_permille": pa.array(bp[order]),
        "abs_dev_permille": pa.array(np.abs(obs - bp)[order])}))
