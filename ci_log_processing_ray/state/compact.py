"""Small-file compaction for partitioned Parquet output.

Long-running pipelines (the flagship's fan-out writer, any
write-per-batch sink) accumulate many small files per partition
directory; readers then pay per-file open/plan costs.  ``compact_dir``
rewrites a directory tree to ~``target_bytes`` files, preserving every
row -- the OPTIMIZE/maintenance step of a table format, expressed as a
plain streaming Ray Data job (read -> repartition -> write).

Safety: output goes to a NEW directory plus an atomic `_compacted`
marker written only after the write completes; callers swap
directories themselves (same commit-after-write discipline as
state/manifest.py).
"""

from __future__ import annotations

import glob
import os

import ray.data


def compact_dir(
    in_dir: str,
    out_dir: str,
    *,
    target_bytes: int = 64 << 20,
) -> dict:
    """Rewrite ``in_dir``'s parquet files into ``out_dir`` at
    ~``target_bytes`` per file.  Returns {n_rows, files_in, files_out}.
    """
    files = sorted(glob.glob(os.path.join(in_dir, "**", "*.parquet"),
                             recursive=True))
    if not files:
        raise FileNotFoundError(f"no parquet files under {in_dir}")
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, total // target_bytes)
    ds = ray.data.read_parquet(files)
    n_rows = ds.count()
    os.makedirs(out_dir, exist_ok=True)
    ds.repartition(int(n_out)).write_parquet(out_dir)
    with open(os.path.join(out_dir, "_compacted"), "w") as fh:
        fh.write(f"{n_rows}\n")
    files_out = len(glob.glob(os.path.join(out_dir, "*.parquet")))
    return {"n_rows": int(n_rows), "files_in": len(files),
            "files_out": files_out}
