"""Cross-run incremental dedup: a shared mutable hash index.

The one place this engine drops to raw Ray actors (the brief's "shared
mutable index" exception): continuous ingestion wants "have I EVER seen
this content?" across runs, which no pure Dataset op can express --
state must outlive batches and be consulted mid-stream.

Design for 100 TB:

* the index is SHARDED by hash prefix over ``n_shards`` actors -- no
  single-actor bottleneck; each shard holds a numpy-backed set of
  64-bit content hashes (8 bytes/doc; 1B docs = 8 GB across the pool);
* map_batches tasks send each batch's hashes to the owning shards in
  ONE RPC per (batch, shard) -- membership test + insert is a single
  round trip, and only hashes travel, never text;
* persistence is append-only parquet segments per shard with
  atomic-rename commit (the ManifestStore discipline): a new run
  reloads the full index from disk, so dedup is exact ACROSS runs and
  crash-safe up to the last flush.

Within-run semantics under parallelism: the FIRST batch to reach a
shard wins; which concurrent duplicate that is is arbitrary (run
``ops/dedup.exact_dedup`` first when a deterministic within-run winner
matters).  Across runs the contract is exact: content committed by an
earlier flush is never emitted again.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ci_log_processing_ray.ops.dedup import _hash64


@ray.remote(num_cpus=0.25)
class DedupShard:
    """One shard of the content-hash index."""

    def __init__(self, shard_dir: str):
        self.shard_dir = shard_dir
        os.makedirs(shard_dir, exist_ok=True)
        parts = sorted(
            f for f in os.listdir(shard_dir) if f.endswith(".parquet"))
        if parts:
            tables = [pq.read_table(os.path.join(shard_dir, f))
                      for f in parts]
            known = pa.concat_tables(tables)["h"].to_numpy()
            self.known = set(known.tolist())
        else:
            self.known = set()
        self.pending: list[int] = []
        self.n_segments = len(parts)

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """Return a bool mask: True where the hash is NEW (and claim
        it).  Duplicates within the argument keep only their first."""
        out = np.zeros(len(hashes), dtype=bool)
        known = self.known
        pending = self.pending
        for i, h in enumerate(hashes.tolist()):
            if h not in known:
                known.add(h)
                pending.append(h)
                out[i] = True
        return out

    def flush(self) -> int:
        """Commit pending hashes to a new segment (atomic rename).
        Returns the number of hashes committed."""
        if not self.pending:
            return 0
        seg = os.path.join(self.shard_dir,
                           f"seg-{self.n_segments:06d}.parquet")
        tmp = seg + ".tmp"
        pq.write_table(
            pa.table({"h": pa.array(self.pending, type=pa.int64())}), tmp)
        os.replace(tmp, seg)
        self.n_segments += 1
        n = len(self.pending)
        self.pending = []
        return n

    def size(self) -> int:
        return len(self.known)


class DedupIndex:
    """Driver-side handle to the sharded index actor pool."""

    def __init__(self, index_dir: str, n_shards: int = 8):
        self.index_dir = index_dir
        self.n_shards = n_shards
        # anonymous actors: handles reach map_batches tasks by closure,
        # so names would only invite get_if_exists races against a dying
        # predecessor (ray.kill is asynchronous).  One DedupIndex = one
        # actor pool; two handles on the same dir would double-create --
        # share the DedupIndex object instead.
        self.shards = [
            DedupShard.remote(os.path.join(index_dir, f"shard-{i:03d}"))
            for i in range(n_shards)
        ]
        # surface load errors here, not at first use
        ray.get([s.size.remote() for s in self.shards])

    def shutdown(self) -> None:
        """Kill the shard actors (state on disk survives; a new
        DedupIndex reloads it)."""
        for s in self.shards:
            ray.kill(s)

    def flush(self) -> int:
        return sum(ray.get([s.flush.remote() for s in self.shards]))

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))


def incremental_dedup(
    ds: ray.data.Dataset,
    index: DedupIndex,
    text_col: str,
    id_col: str,
) -> ray.data.Dataset:
    """Keep only rows whose content hash has never been seen -- by this
    run so far or any previously-flushed run.  Call ``index.flush()``
    after consuming the result to commit the new hashes."""
    shards = index.shards
    n_shards = index.n_shards

    def keep_new(t: pa.Table) -> pa.Table:
        h = _hash64(t[text_col].combine_chunks()).view(np.int64)
        owner = (h.view(np.uint64) % np.uint64(n_shards)).astype(np.int64)
        keep = np.zeros(len(h), dtype=bool)
        refs, slots = [], []
        for s in range(n_shards):
            idx = np.flatnonzero(owner == s)
            if len(idx):
                refs.append(shards[s].check_and_add.remote(h[idx]))
                slots.append(idx)
        for idx, mask in zip(slots, ray.get(refs)):
            keep[idx] = mask
        return t.filter(pa.array(keep))

    return ds.map_batches(keep_new, batch_format="pyarrow",
                          zero_copy_batch=True)
