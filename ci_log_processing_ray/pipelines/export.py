"""Resumable globally-sorted Parquet export (the CLUSTER BY sink):
range-partition the dataset on a sort column, write ONE sorted file per
range, and commit a per-range manifest so a re-run (or a crashed run)
redoes only unfinished ranges -- the write-side complement of the
flagship's per-shard fan-out manifests (state/manifest.py semantics:
tmp + atomic rename, commit-after-write).

Plan shape:
1. cut points from one DDSketch pass (`ops/quantile.py:approx_quantiles`
   -- sketch partials only, never data); exactness is NOT needed, the
   cuts only balance file sizes.  Range membership, and therefore
   CORRECTNESS of the global order, comes from the searchsorted
   assignment itself: file i holds exactly the rows in
   [cut[i-1], cut[i]), so files are disjoint and ordered by
   construction.
2. one streaming pass routes rows of PENDING ranges into per-range
   piece files (finished ranges are filtered out at the batch level,
   so a resume ships only the missing ranges' bytes).
3. one Ray task per pending range sorts its pieces and writes
   `range-NNNNN.parquet` via tmp + atomic rename, then commits a
   manifest carrying (rows, min, max) -- the min/max chain is asserted
   monotone across committed ranges at the end of every run.

At 100 TB: resume granularity is one range (pick n_ranges so a range
is a few GB); the pass-2 scan is read-only and prunes finished ranges
before any shuffle; no stage holds more than one range in memory.

Reference parity: logsender's per-index routing + checkpoint semantics
(SURVEY.md S12/ST1) applied to a sorted lake export.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ci_log_processing_ray.state.manifest import Manifest, ManifestStore


def _range_pid(i: int) -> str:
    return f"sorted-range-{i:05d}"


def sorted_export(
    ds: ray.data.Dataset,
    sort_col: str,
    out_dir: str,
    *,
    n_ranges: int = 32,
) -> dict:
    """Export ``ds`` as ``n_ranges`` Parquet files globally sorted on
    int64 ``sort_col`` (ties keep arbitrary stable order within the
    file).  Idempotent: committed ranges are skipped wholesale on
    re-run.  Returns {written, skipped, rows_written}."""
    os.makedirs(out_dir, exist_ok=True)
    store = ManifestStore(os.path.join(out_dir, "_manifests"))
    done = {pid for pid in store.committed_ids()
            if pid.startswith("sorted-range-")}
    pending = [i for i in range(n_ranges) if _range_pid(i) not in done]
    if not pending:
        _assert_monotone(store, n_ranges)
        return {"written": 0, "skipped": n_ranges, "rows_written": 0}

    from ci_log_processing_ray.ops.quantile import approx_quantiles

    qs = [i / n_ranges for i in range(1, n_ranges)]
    cuts = np.array(sorted(approx_quantiles(ds, sort_col, qs)),
                    dtype=np.float64) if n_ranges > 1 else \
        np.array([], dtype=np.float64)

    pieces_root = os.path.join(out_dir, "_pieces")
    # pending ranges restart from clean piece dirs (block splits are
    # not deterministic across runs, so stale pieces must not survive)
    for i in pending:
        shutil.rmtree(os.path.join(pieces_root, f"range={i}"),
                      ignore_errors=True)
        os.makedirs(os.path.join(pieces_root, f"range={i}"),
                    exist_ok=True)
    pending_set = set(pending)

    def route(t: pa.Table) -> pa.Table:
        v = t[sort_col].combine_chunks().to_numpy(zero_copy_only=False)
        rid = np.searchsorted(cuts, v, side="right") if len(cuts) \
            else np.zeros(len(v), np.int64)
        wrote = 0
        for i in np.unique(rid):
            if int(i) not in pending_set:
                continue
            sub = t.filter(pa.array(rid == i))
            name = f"piece-{abs(hash((int(i), os.getpid(), wrote)))}-" \
                   f"{np.random.default_rng().integers(1 << 62)}.parquet"
            pq.write_table(sub, os.path.join(
                pieces_root, f"range={int(i)}", name))
            wrote += 1
        return pa.table({"n": pa.array([len(v)], pa.int64())})

    ds.map_batches(route, batch_format="pyarrow",
                   zero_copy_batch=True).count()

    @ray.remote
    def finalize(i: int) -> tuple[int, int, int, int]:
        pdir = os.path.join(pieces_root, f"range={i}")
        files = sorted(os.path.join(pdir, f) for f in os.listdir(pdir))
        if files:
            tab = pa.concat_tables([pq.read_table(f) for f in files])
            order = np.argsort(
                tab[sort_col].combine_chunks().to_numpy(
                    zero_copy_only=False), kind="stable")
            tab = tab.take(pa.array(order))
        else:
            tab = None
        final = os.path.join(out_dir, f"range-{i:05d}.parquet")
        tmp = final + ".tmp"
        if tab is not None and tab.num_rows:
            pq.write_table(tab, tmp)
            os.replace(tmp, final)
            col = tab[sort_col].combine_chunks()
            lo = int(col[0].as_py())
            hi = int(col[-1].as_py())
            n = tab.num_rows
        else:
            lo, hi, n = 0, 0, 0  # empty range: manifest only
        shutil.rmtree(pdir, ignore_errors=True)
        return i, n, lo, hi

    results = ray.get([finalize.remote(i) for i in pending])
    rows = 0
    for i, n, lo, hi in results:
        rows += n
        store.commit(Manifest(
            partition_id=_range_pid(i),
            input_path=f"range:{i}", row_count=n,
            per_sink_counts={"min": lo, "max": hi, "empty": int(n == 0)}))
    _assert_monotone(store, n_ranges)
    return {"written": len(pending), "skipped": n_ranges - len(pending),
            "rows_written": rows}


def _assert_monotone(store: ManifestStore, n_ranges: int) -> None:
    """Committed range manifests must chain monotonically: every
    non-empty range's min >= the previous non-empty range's max."""
    prev_max = None
    for i in range(n_ranges):
        m = store.load(_range_pid(i))
        if m is None or m.per_sink_counts.get("empty"):
            continue
        lo = m.per_sink_counts["min"]
        if prev_max is not None and lo < prev_max:
            raise AssertionError(
                f"sorted_export: range {i} min {lo} < previous max "
                f"{prev_max} -- cut assignment violated")
        prev_max = m.per_sink_counts["max"]
