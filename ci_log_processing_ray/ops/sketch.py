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


def _registers(values, p: int) -> np.ndarray:
    """One batch's HLL register array (uint8[2^p])."""
    arr = np.asarray(
        values.to_pylist() if isinstance(values, (pa.Array, pa.ChunkedArray))
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
    ds: ray.data.Dataset, group_col: str, col: str, *, p: int = 10
) -> "pd.DataFrame":
    """Approximate per-group distinct counts: one register array per
    (batch, group) -- the shuffle ships #groups x 2^p bytes of state,
    never rows."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({group_col: t[group_col].to_pylist(),
                           col: t[col].to_pylist()})
        groups, payloads = [], []
        for g, sub in df.groupby(group_col, sort=False):
            groups.append(g)
            payloads.append(_registers(sub[col].to_numpy(object), p).tobytes())
        return pa.table({group_col: pa.array(groups),
                         "regs": pa.array(payloads, pa.binary())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        merged = np.zeros(1 << p, dtype=np.uint8)
        for payload in g["regs"]:
            merged = np.maximum(merged, np.frombuffer(payload, np.uint8))
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             "n_distinct": [round(_estimate(merged, p))]})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col).map_groups(merge, batch_format="pandas")
            .to_pandas().sort_values(group_col).reset_index(drop=True))


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
    """
    keys = [f"cmsketchrow{j:05d}" for j in range(depth)]

    def partial(t: pa.Table) -> pa.Table:
        arr = t[col].combine_chunks()
        vc = arr.value_counts()
        items = np.asarray(vc.field("values").to_pylist(), dtype=object)
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(
            np.int64)
        cells, ns = [], []
        for j, key in enumerate(keys):
            h = pd.util.hash_array(items, hash_key=key).astype(np.uint64)
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
    for j, key in enumerate(keys):
        h = pd.util.hash_array(q, hash_key=key).astype(np.uint64)
        pos = (h % np.uint64(width)).astype(np.int64) + j * width
        est = np.minimum(est, table[pos])
    return pd.DataFrame({"item": list(query_items),
                         "est_count": est.astype(np.int64)})
