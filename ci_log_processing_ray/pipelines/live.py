"""Live-mode end-to-end pipeline: S1 -> S12 with no parquet
pre-tokenization -- the reference's logscraper+logsender loop
(logscraper.py:run_scraping -> logsender.py:send_to_es) as ONE Ray
pipeline tick:

  driver: version gate (M17) -> jobs intersection (S2) -> paginated
          /builds listing with page-drift dedup (S1) -> anti-join
          against committed manifests (S5/J4)
  cluster: per-build file downloads incl. .gz twins (S3, actor pool)
           + inventory fetch -> build_meta (S4/M12)
           -> parse -> enrich -> route -> per-sink fan-out write with
           conformance count partials (S12/A2)
  driver: per-BUILD manifest commit after the partition rename -- the
          exactly-once discipline of the batch pipeline with the build
          uuid as the partition key, so a crashed run re-fetches only
          uncommitted builds and a second identical run is a no-op.

All network access is injected (``get_json`` / ``fetcher_factory``):
tests drive the whole path from dict-backed fakes; a deployment plugs
in urllib.  The engine still never imports an HTTP library.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Callable, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import DEFAULT_FILE_CONFIG, FileConfigEntry, PipelineConfig
from ..state.manifest import Manifest, ManifestStore
from ..stages.enrich import apply_enrich
from ..stages.parse import apply_parse
from ..stages.route import apply_route
from ..sources.zuul import (
    GetBytes,
    GetJson,
    fetch_build_meta,
    filter_available_jobs,
    get_last_job_results,
    read_zuul_builds,
    zuul_complete_param,
)
from .flagship import RunResult, _counts_from_manifests, make_fanout_writer


def _build_pid(uuid: str) -> str:
    """Stable per-build partition id (same shape as the batch
    pipeline's path-keyed ids)."""
    digest = hashlib.sha256(uuid.encode()).hexdigest()[:16]
    return f"build-{uuid}-{digest}"


class _StoreSeen:
    """Anti-join view over the manifest store: committed builds read as
    seen; in-flight adds stay in memory so a crash before the write
    commits leaves the build pending (commit-after-write)."""

    def __init__(self, committed: set[str]):
        self.committed = committed
        self.mem: set = set()

    def contains(self, key) -> bool:
        return key in self.mem or _build_pid(str(key)) in self.committed

    def add(self, key) -> None:
        self.mem.add(key)


def run_live(
    get_json: GetJson,
    fetcher_factory: Callable[[], GetBytes],
    zuul_url: str,
    out_dir: str,
    cfg: PipelineConfig = PipelineConfig(),
    *,
    job_names: Optional[Sequence[str]] = None,
    max_builds: int = 100,
    file_config: tuple[FileConfigEntry, ...] = DEFAULT_FILE_CONFIG,
    clock_now: float = 0.0,
    fetch_concurrency: tuple[int, int] | int = (1, 8),
) -> RunResult:
    """One live tick.  Returns the same RunResult as the batch
    pipeline; ``n_pending`` is the number of builds processed this
    tick (0 on an idle or fully-committed re-run)."""
    store = ManifestStore(os.path.join(out_dir, "manifests"))
    seen = _StoreSeen(store.committed_ids())

    complete = zuul_complete_param(get_json, zuul_url)
    jobs: list[Optional[str]] = [None]
    if job_names:
        jobs = list(filter_available_jobs(get_json, zuul_url, job_names))
    builds: list[dict] = []
    for job in jobs:
        builds.extend(get_last_job_results(
            get_json, zuul_url, max_builds, seen, job,
            complete_param=complete))
    if not builds:
        return RunResult(None, _counts_from_manifests(store), [],
                         0, len(store.committed_ids()))

    uuids = [str(b["uuid"]) for b in builds]
    pid_names = [_build_pid(u) for u in uuids]
    lut = {u: i for i, u in enumerate(uuids)}

    meta = fetch_build_meta(builds, fetcher_factory)
    rows = read_zuul_builds(builds, fetcher_factory,
                            file_config=file_config,
                            concurrency=fetch_concurrency)

    def add_pid(t: pa.Table) -> pa.Table:
        import numpy as np

        pre = pc.struct_field(
            pc.extract_regex(t["doc_id"].combine_chunks(),
                             pattern=r"^(?P<u>[^/]+)/"), "u")
        enc = pre.dictionary_encode()
        mapped = np.array([lut[u] for u in enc.dictionary.to_pylist()],
                          dtype=np.int32)
        pid = pa.array(mapped[enc.indices.to_numpy(zero_copy_only=False)])
        return t.append_column("_partition", pid)

    ds = rows.map_batches(add_pid, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
    ds = apply_parse(ds, cfg)
    ds = apply_enrich(ds, meta, file_config)
    ds = apply_route(ds, cfg)

    routed_root = os.path.join(out_dir, "routed")
    digest = hashlib.sha256("\n".join(sorted(pid_names)).encode()
                            ).hexdigest()[:16]
    staging_dir = os.path.join(out_dir, ".staging", f"live-{digest}")
    shutil.rmtree(staging_dir, ignore_errors=True)
    os.makedirs(staging_dir, exist_ok=True)
    os.makedirs(routed_root, exist_ok=True)
    counts_tbl = ds.map_batches(
        make_fanout_writer(staging_dir, pid_names), batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True).to_pandas()
    counts_tbl = counts_tbl.groupby(
        ["_partition", "sink", "severity"], as_index=False)[
        ["doc_count", "tok_sum"]].sum()

    manifests: list[Manifest] = []
    for i, uuid in enumerate(uuids):
        src = os.path.join(staging_dir, f"part-{pid_names[i]}")
        dst = os.path.join(routed_root, f"part-{pid_names[i]}")
        shutil.rmtree(dst, ignore_errors=True)
        if os.path.isdir(src):
            os.rename(src, dst)
        sub = counts_tbl[counts_tbl["_partition"] == i]
        per_sink = (
            sub.groupby("sink")["doc_count"].sum().astype(int).to_dict())
        checksum = hashlib.sha256(
            json.dumps(sorted(
                (r.sink, r.severity, int(r.doc_count), int(r.tok_sum))
                for r in sub.itertuples()), default=str).encode()
        ).hexdigest()[:16]
        m = Manifest(
            partition_id=pid_names[i],
            input_path=f"zuul://{uuid}",
            row_count=int(sub["doc_count"].sum()),
            per_sink_counts=per_sink,
            token_checksum=checksum,
            committed_at=clock_now,
        )
        store.commit(m)
        manifests.append(m)
    shutil.rmtree(staging_dir, ignore_errors=True)

    agg = (counts_tbl.groupby(["sink", "severity"], as_index=False)[
        ["doc_count", "tok_sum"]].sum())
    counts = pa.Table.from_pandas(
        agg.sort_values(["sink", "severity"]).reset_index(drop=True),
        preserve_index=False)
    return RunResult(routed_root, counts, manifests, len(builds), 0)
