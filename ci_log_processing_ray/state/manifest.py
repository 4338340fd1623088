"""Per-partition lineage manifests: the checkpoint/resume layer.

Mirrors the reference's BuildCache semantics (logscraper.py:227-292):

* partition (here: one input parquet file) == the reference's build uid;
* a manifest is committed ONLY after the partition's output is fully
  written ("save only after the pool finishes", logscraper.py:724-729 --
  at-least-once, made effectively exactly-once by deterministic output
  paths that replace on retry);
* resume = anti-join of the input file list against committed manifests
  (get_last_job_results dedup, logscraper.py:457-468 / J4);
* TTL GC of stale manifests mirrors BuildCache.clean's 1-day TTL
  (logscraper.py:279-284); ``now`` is injected for determinism.

A manifest is a small JSON file written atomically (tmp + rename) and
doubles as the metrics record for its partition (row counts, per-sink
counts, token checksum) -- ST5's metrics surface.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from dataclasses import dataclass, field
from typing import Iterable, Optional


def partition_id(input_path: str) -> str:
    """Stable id for one input partition (path basename + content-free hash
    of the absolute path -- collision-safe across directories)."""
    digest = hashlib.sha256(input_path.encode()).hexdigest()[:16]
    return f"{os.path.basename(input_path)}-{digest}"


@dataclass
class Manifest:
    partition_id: str
    input_path: str
    row_count: int
    per_sink_counts: dict[str, int] = field(default_factory=dict)
    token_checksum: Optional[str] = None
    committed_at: Optional[float] = None  # injected clock, not wall time


class ManifestStore:
    def __init__(self, manifest_dir: str):
        self.dir = manifest_dir
        os.makedirs(manifest_dir, exist_ok=True)

    def _path(self, pid: str) -> str:
        return os.path.join(self.dir, pid + ".json")

    def commit(self, manifest: Manifest) -> None:
        """Atomic write: tmp file + rename (commit point)."""
        payload = json.dumps(manifest.__dict__, sort_keys=True)
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(payload)
            os.replace(tmp, self._path(manifest.partition_id))
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def load(self, pid: str) -> Optional[Manifest]:
        try:
            with open(self._path(pid)) as f:
                return Manifest(**json.load(f))
        except FileNotFoundError:
            return None

    def committed_ids(self) -> set[str]:
        return {
            f[: -len(".json")]
            for f in os.listdir(self.dir)
            if f.endswith(".json")
        }

    def all(self) -> list[Manifest]:
        return [m for pid in sorted(self.committed_ids())
                if (m := self.load(pid)) is not None]

    def gc(self, *, now: float, ttl_seconds: float = 86400.0) -> list[str]:
        """Drop manifests older than ttl (BuildCache.clean,
        logscraper.py:279-284).  Returns removed partition ids."""
        removed = []
        for m in self.all():
            if m.committed_at is not None and now - m.committed_at > ttl_seconds:
                os.unlink(self._path(m.partition_id))
                removed.append(m.partition_id)
        return removed


def pending_inputs(
    input_paths: Iterable[str], store: ManifestStore
) -> list[str]:
    """Anti-join: input files without a committed manifest (J4)."""
    done = store.committed_ids()
    return [p for p in input_paths if partition_id(p) not in done]
