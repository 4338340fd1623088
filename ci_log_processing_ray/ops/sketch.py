"""Mergeable sketches: approximate aggregates whose partials are tiny
fixed-size states -- the pattern that replaces exact all-to-all
aggregation when key cardinality itself is the problem at 100 TB.

``hll_distinct`` -- HyperLogLog distinct count (Flajolet et al. 2007,
with the standard small-range linear-counting correction).  Each batch
produces ONE 2^p-byte register array (vectorized numpy, no Python per
row); register arrays merge by elementwise max, so the shuffle moves
kilobytes regardless of input size.  Standard error ~= 1.04/sqrt(2^p).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_HASH_KEY = "cilogprocraysktc"  # 16 bytes (pandas hash_key contract)


def _fmix64(h: np.ndarray) -> np.ndarray:
    """murmur3 64-bit finalizer: FNV-1a of short digit strings leaves
    most entropy in the LOW bits, but HLL takes the bucket from the
    TOP p bits -- this avalanche pass (xor-shift / wraparound-multiply
    only, so still exactly reproducible in SQL) fixes that."""
    h = h.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(33)
        h *= np.uint64(18397679294719823053)   # 0xff51afd7ed558ccd
        h ^= h >> np.uint64(33)
        h *= np.uint64(14181476777654086739)   # 0xc4ceb9fe1a85ec53
        h ^= h >> np.uint64(33)
    return h


def _registers(values, p: int, *, hash: str = "pandas") -> np.ndarray:
    """One batch's HLL register array (uint8[2^p]).

    ``hash="fnv"`` hashes str(value) with the seeded FNV-1a from
    ops/dedup.py -- exactly reproducible in SQL (recursive CTE over
    character positions), which lets a DuckDB oracle rebuild the
    register state itself (see __ray_entry__._HLL_ORACLE)."""
    if hash == "fnv":
        from ci_log_processing_ray.ops.dedup import _fnv1a_word_hashes

        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            values = values.to_numpy(zero_copy_only=False)
        h = _fmix64(_fnv1a_word_hashes(
            pa.array(np.asarray(values).astype(str)), 0))
    else:
        arr = np.asarray(
            values.to_pylist()
            if isinstance(values, (pa.Array, pa.ChunkedArray))
            else values, dtype=object)
        h = pd.util.hash_array(arr, hash_key=_HASH_KEY).astype(np.uint64)
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad low bits
    # exact vectorized CLZ (binary-search shifts; rest is never 0
    # thanks to the padding)
    log2 = np.zeros(len(h), dtype=np.int64)
    x = rest.copy()
    for sft in (32, 16, 8, 4, 2, 1):
        y = x >> np.uint64(sft)
        nz = y != 0
        log2[nz] += sft
        x = np.where(nz, y, x)
    lz = 63 - log2
    rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _estimate(regs: np.ndarray, p: int) -> float:
    m = 1 << p
    am = 0.7213 / (1 + 1.079 / m)
    est = am * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting small-range fix
    return float(est)


def hll_distinct(
    ds: ray.data.Dataset, col: str, *, p: int = 12
) -> int:
    """Approximate COUNT(DISTINCT col): per-batch register arrays
    (combiner), merged by elementwise max on the driver (the merged
    state is 2^p bytes -- at cluster scale you would tree-reduce the
    same arrays through map_batches stages)."""

    def partial(t: pa.Table) -> pa.Table:
        regs = _registers(t[col].combine_chunks(), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for batch in ds.map_batches(
            partial, batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        for payload in batch["regs"].to_pylist():
            merged = np.maximum(merged,
                                np.frombuffer(payload, dtype=np.uint8))
    return round(_estimate(merged, p))


def hll_distinct_by_group(
    ds: ray.data.Dataset, group_col: str, col: str, *, p: int = 10,
    hash: str = "pandas", return_state: bool = False,
) -> "pd.DataFrame":
    """Approximate per-group distinct counts: one register array per
    (batch, group) -- the shuffle ships #groups x 2^p bytes of state,
    never rows.

    ``return_state=True`` emits the register-RANK HISTOGRAM instead of
    the float-corrected estimate: rows (group, rank, n_regs) with
    rank 0 = untouched registers.  All-integer (the repo's int64
    contract) and a sufficient statistic -- the estimate is a pure
    function of it -- so with ``hash="fnv"`` a SQL oracle can check
    the entire sketch state, not just the estimate."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({group_col: t[group_col].to_pylist(),
                           col: t[col].to_pylist()})
        groups, payloads = [], []
        for g, sub in df.groupby(group_col, sort=False):
            groups.append(g)
            payloads.append(
                _registers(sub[col].to_numpy(object), p,
                           hash=hash).tobytes())
        return pa.table({group_col: pa.array(groups),
                         "regs": pa.array(payloads, pa.binary())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        merged = np.zeros(1 << p, dtype=np.uint8)
        for payload in g["regs"]:
            merged = np.maximum(merged, np.frombuffer(payload, np.uint8))
        if return_state:
            counts = np.bincount(merged.astype(np.int64))
            ranks = np.flatnonzero(counts)
            return pd.DataFrame({
                group_col: [g[group_col].iloc[0]] * len(ranks),
                "rank": ranks.astype(np.int64),
                "n_regs": counts[ranks].astype(np.int64)})
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             "n_distinct": [round(_estimate(merged, p))]})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col).map_groups(merge, batch_format="pandas")
            .to_pandas().sort_values(group_col).reset_index(drop=True))


def estimate_from_rank_histogram(ranks: np.ndarray, n_regs: np.ndarray,
                                 p: int) -> float:
    """HLL estimate from a (rank, count) histogram -- identical math to
    :func:`_estimate` (the histogram is a sufficient statistic)."""
    m = 1 << p
    am = 0.7213 / (1 + 1.079 / m)
    denom = float(np.sum(n_regs * np.exp2(-ranks.astype(np.float64))))
    est = am * m * m / denom
    zeros = int(n_regs[ranks == 0].sum()) if (ranks == 0).any() else 0
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters: fixed-size mergeable frequent-item summaries
# ---------------------------------------------------------------------------
def _mg_summarize(items: np.ndarray, counts: np.ndarray, k: int):
    """Reduce (item, count) pairs to <= k counters, Misra-Gries style:
    keep the top-k by count and subtract the (k+1)-th count from the
    survivors (the classic decrement step, batched).  Guarantees
    true_count - n/(k+1) <= est <= true_count over any merge tree."""
    if len(items) <= k:
        return items, counts
    order = np.argsort(-counts, kind="stable")
    thresh = counts[order[k]]
    keep = order[:k]
    kept_counts = counts[keep] - thresh
    nz = kept_counts > 0
    return items[keep][nz], kept_counts[nz]


def heavy_hitters(
    ds: "ray.data.Dataset",
    col: str,
    k: int = 64,
) -> "pd.DataFrame":
    """Approximate most-frequent values of ``col``: each batch reduces
    to <= k Misra-Gries counters (fixed-size partials, like the HLL
    registers above), the tiny (item, count) union is groupby-summed,
    and one final MG prune bounds the result.  Underestimates by at
    most n/(k+1); any item with frequency > n/(k+1) is guaranteed
    present.  Returns a pandas frame (item, est_count) sorted by count
    desc -- driver-sized output by construction."""

    def partial(t: pa.Table) -> pa.Table:
        arr = t[col].combine_chunks()
        vc = arr.value_counts()
        items = vc.field("values").to_numpy(zero_copy_only=False)
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(
            np.int64)
        items, counts = _mg_summarize(items, counts, k)
        return pa.table({"item": pa.array(items),
                         "n": pa.array(counts)})

    merged = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("item").sum("n").to_pandas())
    merged = merged.rename(columns={"sum(n)": "n"})
    items, counts = _mg_summarize(merged["item"].to_numpy(),
                                  merged["n"].to_numpy().astype(np.int64), k)
    out = pd.DataFrame({"item": items, "est_count": counts})
    return out.sort_values(["est_count", "item"],
                           ascending=[False, True]).reset_index(drop=True)


def heavy_hitters_exact(
    ds: "ray.data.Dataset",
    col: str,
    share_den: int = 125,
    k: int = 256,
) -> "pd.DataFrame":
    """EXACT frequent items via sketch-for-candidates + exact verify:
    every value of ``col`` whose frequency is >= n/share_den, with its
    exact count.

    Pass 1 is the Misra-Gries summary above with ``k`` counters.  MG
    guarantees any item with true count > n/(k+1) survives the merge
    tree, so with k + 1 > share_den the candidate set is a SUPERSET of
    the answer -- never a miss.  Pass 2 broadcasts the <= k candidates
    (sorted array, searchsorted membership per block) and sums exact
    per-block counts; the final threshold filter uses integer
    arithmetic (cnt * share_den >= n) so the result is bit-exact and
    oracle-checkable (DuckDB ``HAVING count(*) * share_den >= total``).

    Neither pass shuffles the data: pass 1 moves <= k counters per
    block, pass 2 moves <= k exact partial counts per block.  At 100 TB
    the exchange stays kilobytes while a naive GROUP BY ... HAVING
    would shuffle every distinct key.
    """
    if k + 1 <= share_den:
        raise ValueError(
            f"k={k} too small for share 1/{share_den}: need k+1 > share_den "
            "for the Misra-Gries no-miss guarantee")
    import ray

    cand = heavy_hitters(ds, col, k=k)["item"].to_numpy()
    if len(cand) == 0:
        return pd.DataFrame({"item": cand, "cnt": np.array([], np.int64)})
    cand_ref = ray.put(np.sort(cand))
    # Exact total row count: metadata-served on Parquet sources, one
    # streaming count otherwise -- either way no data leaves workers.
    n = ds.count()

    def exact_partial(t: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        vc = t[col].combine_chunks().value_counts()
        items = vc.field("values").to_numpy(zero_copy_only=False)
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(cands, items)
        pos_c = np.minimum(pos, len(cands) - 1)
        hit = cands[pos_c] == items
        return pa.table({"item": pa.array(items[hit]),
                         "cnt": pa.array(counts[hit].astype(np.int64))})

    exact = (ds.map_batches(exact_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("item").sum("cnt").to_pandas()
             .rename(columns={"sum(cnt)": "cnt"}))
    exact["cnt"] = exact["cnt"].astype(np.int64)
    out = exact[exact["cnt"] * share_den >= n]
    return (out.sort_values(["cnt", "item"], ascending=[False, True])
            .reset_index(drop=True))


def count_min_estimates(
    ds: "ray.data.Dataset",
    col: str,
    query_items: "np.ndarray | list",
    *,
    depth: int = 4,
    width: int = 1024,
    hash: str = "pandas",
) -> "pd.DataFrame":
    """Count-min sketch point-frequency estimates (Cormode &
    Muthukrishnan 2005) -- the fourth member of the mergeable-sketch
    family next to HLL (distinct), Misra-Gries (heavy hitters) and
    DDSketch (quantiles).  Each batch collapses to ONE depth x width
    int64 counter matrix (vectorized value_counts + d hashed
    scatter-adds); matrices merge by ADDITION through a
    (cell, n) groupby whose exchange is depth*width rows per block
    regardless of input size; the driver answers point queries as the
    min over the d hashed cells.

    Guarantees (deterministic on fixed data + fixed hash keys, the
    binding-gate contract): estimates NEVER underestimate, and
    overestimate only by colliding mass -- expected <= n/width per
    row, min over ``depth`` independent rows.

    ``hash="fnv"`` switches row j's hash to seeded FNV-1a of
    str(value) + fmix64 (seed = j) -- SQL-reproducible, so a DuckDB
    oracle can rebuild the whole depth x width counter table and the
    point estimates (__ray_entry__._COUNT_MIN_ORACLE).
    """
    keys = [f"cmsketchrow{j:05d}" for j in range(depth)]

    def row_hash(items: np.ndarray, j: int) -> np.ndarray:
        if hash == "fnv":
            from ci_log_processing_ray.ops.dedup import _fnv1a_word_hashes

            return _fmix64(_fnv1a_word_hashes(
                pa.array(items.astype(str)), j))
        return pd.util.hash_array(items, hash_key=keys[j]).astype(np.uint64)

    def partial(t: pa.Table) -> pa.Table:
        arr = t[col].combine_chunks()
        vc = arr.value_counts()
        items = np.asarray(vc.field("values").to_pylist(), dtype=object)
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(
            np.int64)
        cells, ns = [], []
        for j in range(depth):
            h = row_hash(items, j)
            pos = (h % np.uint64(width)).astype(np.int64) + j * width
            m = np.zeros(width, np.int64)
            np.add.at(m, pos - j * width, counts)
            nz = np.flatnonzero(m)
            cells.append(nz + j * width)
            ns.append(m[nz])
        return pa.table({"cell": pa.array(np.concatenate(cells)),
                         "n": pa.array(np.concatenate(ns))})

    merged = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("cell").sum("n").to_pandas()
              .rename(columns={"sum(n)": "n"}))
    table = np.zeros(depth * width, np.int64)
    table[merged["cell"].to_numpy()] = merged["n"].to_numpy()
    q = np.asarray(list(query_items), dtype=object)
    est = np.full(len(q), np.iinfo(np.int64).max)
    for j in range(depth):
        h = row_hash(q, j)
        pos = (h % np.uint64(width)).astype(np.int64) + j * width
        est = np.minimum(est, table[pos])
    return pd.DataFrame({"item": list(query_items),
                         "est_count": est.astype(np.int64)})
