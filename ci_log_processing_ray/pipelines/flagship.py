"""Flagship pipeline: read -> parse -> enrich -> route -> write + aggregate.

The Ray-Data-native equivalent of logscraper+logsender end to end
(SURVEY.md section 3 "Rebuild lifecycle"):

    1. plan: anti-join pending input files vs committed manifests (J4/ST1)
    2. ds = read_parquet(pending, include_paths=True)          [source]
    3. parse (stateless map_batches over whole Arrow blocks)   [M1-M8, 2.9]
    4. enrich (actor pool, broadcast build_meta + file config) [J1/J2]
    5. route (sink column = dated index name)                  [S12/S13]
    6. write per-sink partitioned Parquet into a staged batch
       dir, renamed into place (idempotent commit)
    7. re-read the written columns -> per-(partition, sink, severity)
       counts (A2); commit one lineage manifest per input file
    8. metrics manifest for the batch                          [ST5/A1]

Consuming the pipeline exactly once (the write) keeps it fully
streaming; the conformance aggregate reads back only 4 narrow columns
of the columnar output instead of re-running the pipeline.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from dataclasses import dataclass
from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data
from ray.data.aggregate import Sum

from ..config import DEFAULT_FILE_CONFIG, FileConfigEntry, PipelineConfig
from ..sources.readers import load_build_meta
from ..stages.enrich import apply_enrich
from ..stages.parse import apply_parse
from ..stages.route import apply_route
from ..state.manifest import Manifest, ManifestStore, partition_id, pending_inputs


def _attach_partition_ids(ds: ray.data.Dataset, paths: Sequence[str],
                          num_cpus: float = 1.0) -> ray.data.Dataset:
    """Replace the per-row 'path' string with a compact int32 partition id."""
    lut = {p: i for i, p in enumerate(paths)}

    def to_pid(batch: pa.Table) -> pa.Table:
        import numpy as np

        enc = batch["path"].combine_chunks().dictionary_encode()
        mapped = np.array([lut[p] for p in enc.dictionary.to_pylist()],
                          dtype=np.int32)
        pid = pa.array(mapped[enc.indices.to_numpy(zero_copy_only=False)])
        batch = batch.drop_columns("path")
        return batch.append_column("_partition", pid)

    return ds.map_batches(to_pid, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True, num_cpus=num_cpus)


def build_routed(
    input_paths: Sequence[str],
    meta: pa.Table,
    cfg: PipelineConfig,
    file_config: tuple[FileConfigEntry, ...] = DEFAULT_FILE_CONFIG,
    *,
    enrich_concurrency: int | tuple[int, int] | None = None,
    track_partitions: bool = True,
) -> ray.data.Dataset:
    """Assemble the lazy routed Dataset (no execution happens here).

    One read task per input parquet file (``override_num_blocks``):
    Ray then never splits a file into arbitrary row ranges, so parse
    blocks stay row-group-aligned -- the layout contract of the
    batch-local carry-forward.  At corpus scale the file count (not
    intra-file splitting) supplies the read parallelism.
    """
    from ..runtime import heavy_task_cpus

    # ONE num_cpus for every stage so the whole chain FUSES into a
    # single task operator: read -> parse -> enrich -> route -> (write)
    # streams block-by-block with no inter-operator object-store hop.
    hcpu = heavy_task_cpus()
    paths = list(input_paths)
    # exactly one read task per parquet file: Ray then never splits a
    # file into arbitrary row ranges, which is the layout contract of
    # the batch-local carry-forward (a finer override_num_blocks makes
    # Ray split blocks MID-FILE at row granularity).  Skew is handled
    # at the LAYOUT level instead: the corpus writer spreads a hot
    # build's files across shards, so no single file dominates.
    # the read must request the SAME num_cpus as the map chain or Ray
    # will not fuse it in -- a separate ReadParquet operator ships the
    # whole decoded corpus (~1 GB at sf0.1) through the object store
    # between read and parse.  Fused: one operator, zero hop; measured
    # 2.97 s -> 2.30 s at sf0.1/32 CPUs, identical outputs.
    #
    # LPT order: feed the read LARGEST FILE FIRST so a hot build's
    # 3-4x-mean task starts in wave 1 instead of anchoring the final
    # wave (classic longest-processing-time makespan fix; partition
    # ids key on the PATH, so output layout and manifests are
    # byte-identical).
    read_order = sorted(paths, key=os.path.getsize, reverse=True)
    ds = ray.data.read_parquet(
        read_order,
        include_paths=track_partitions,
        override_num_blocks=len(paths),
        ray_remote_args={"num_cpus": hcpu},
    )
    if track_partitions:
        ds = _attach_partition_ids(ds, list(input_paths), num_cpus=hcpu)
    ds = apply_parse(ds, cfg, num_cpus=hcpu)
    ds = apply_enrich(ds, meta, file_config, concurrency=enrich_concurrency,
                      num_cpus=hcpu)
    ds = apply_route(ds, cfg, num_cpus=hcpu)
    # duplicate the sink as a data column: "sink" becomes the hive
    # partition key at write time (stripped from the files), "sink_name"
    # stays in the data for cheap read-back aggregation.
    ds = ds.map_batches(
        lambda t: t.append_column("sink_name", t["sink"]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
        num_cpus=hcpu)
    return ds


@dataclass
class RunResult:
    routed_dir: Optional[str]
    counts: pa.Table  # (sink, severity, doc_count, tok_sum)
    manifests: list[Manifest]
    n_pending: int
    n_skipped: int


_PARTIAL_SCHEMA = pa.schema([
    ("_partition", pa.int32()),
    ("sink", pa.string()),
    ("severity", pa.string()),
    ("doc_count", pa.int64()),
    ("tok_sum", pa.int64()),
])


def make_fanout_writer(staging_dir: str,
                       pid_names: Sequence[str] | None = None):
    """ONE-PASS per-sink writer + conformance-count combiner.

    The Ray-Data shape of logsender's send_to_es (S12: per-index bulk
    insert returning success counts, logsender.py:467-495): each task
    writes its block's rows into one Parquet file per sink under
    ``part-<partition>/sink=<name>/`` (temp-file + atomic os.replace,
    DETERMINISTIC name derived from the partition id + block content --
    task retries overwrite the same path, so sink counts stay exact),
    and returns only the tiny per-(partition, sink, severity) count
    partials as its output batch.  The downstream aggregate then runs
    over bytes-sized partials instead of re-reading the written corpus:
    the A2 conformance aggregate costs one streaming pass, total.

    ``pid_names`` maps the per-run ``_partition`` index to a STABLE
    partition id: the per-partition directory is then replaceable
    wholesale when that partition is reprocessed after a partial
    failure, so the routed tree never accumulates duplicate rows.
    """

    def write_one_partition(t: pa.Table, part_dir: str) -> None:
        tag = hashlib.sha1(
            f"{t['doc_id'][0].as_py()}|{len(t)}".encode()).hexdigest()[:8]
        sink_enc = t["sink"].combine_chunks().dictionary_encode()
        indices = sink_enc.indices
        for i, sink_val in enumerate(sink_enc.dictionary.to_pylist()):
            sub = t.filter(pc.equal(indices, i)).drop_columns("sink")
            d = os.path.join(part_dir, f"sink={sink_val}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"part-{tag}.parquet")
            tmp = f"{path}.tmp-{os.getpid()}"
            pq.write_table(sub, tmp)
            os.replace(tmp, path)

    def write_and_count(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _PARTIAL_SCHEMA.empty_table()
        # one read task per input file means a batch is normally a
        # single partition; group anyway so mixed batches stay correct
        part_enc = t["_partition"].combine_chunks().dictionary_encode()
        for j, pid in enumerate(part_enc.dictionary.to_pylist()):
            sub = t.filter(pc.equal(part_enc.indices, j))
            name = pid_names[pid] if pid_names is not None else f"{pid:05d}"
            write_one_partition(sub, os.path.join(staging_dir, f"part-{name}"))
        g = pa.table({
            "_partition": t["_partition"],
            "sink": t["sink"],
            "severity": t["severity"],
            "n_tok": pc.cast(t["n_tok"].combine_chunks(), pa.int64()),
        }).group_by(["_partition", "sink", "severity"]).aggregate(
            [("n_tok", "count"), ("n_tok", "sum")])
        return pa.table({
            "_partition": g["_partition"],
            "sink": g["sink"],
            "severity": g["severity"],
            "doc_count": pc.cast(g["n_tok_count"], pa.int64()),
            "tok_sum": g["n_tok_sum"],
        }, schema=_PARTIAL_SCHEMA)

    return write_and_count


def _batch_digest(paths: Sequence[str]) -> str:
    return hashlib.sha256("\n".join(sorted(paths)).encode()).hexdigest()[:16]


def aggregate_counts_from_dir(routed_dir: str) -> ray.data.Dataset:
    """Per-(partition, sink, severity) counts from the written output,
    reading only 4 narrow columns (columnar pruning at the read)."""
    ds = ray.data.read_parquet(
        routed_dir, columns=["_partition", "sink_name", "severity", "n_tok"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["_partition", "sink_name", "severity"]).aggregate(
            [("n_tok", "count"), ("n_tok", "sum")])
        return pa.table({
            "_partition": g["_partition"],
            "sink": g["sink_name"],
            "severity": g["severity"],
            "doc_count": g["n_tok_count"],
            "tok_sum": g["n_tok_sum"],
        })

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return partials.groupby(["_partition", "sink", "severity"]).aggregate(
        Sum("doc_count", alias_name="doc_count"),
        Sum("tok_sum", alias_name="tok_sum"))


def run_pipeline(
    input_paths: Sequence[str],
    meta: pa.Table | str,
    out_dir: str,
    cfg: PipelineConfig = PipelineConfig(),
    file_config: tuple[FileConfigEntry, ...] = DEFAULT_FILE_CONFIG,
    *,
    resume: bool = True,
    clock_now: float = 0.0,
    enrich_concurrency: int | tuple[int, int] | None = None,
) -> RunResult:
    """One pipeline tick: process pending partitions, commit manifests.

    Idempotent AND duplicate-free across partial failures: output is
    keyed by STABLE partition id (``routed/part-<pid>/sink=.../``); a
    reprocessed partition's directory is replaced wholesale before its
    manifest commits, so the routed tree never holds two copies of one
    partition's rows.  Manifests commit only after the partition dir is
    renamed into place -- the reference's commit-after-pool ordering
    (logscraper.py:724-729) made exactly-once by determinism.
    """
    if isinstance(meta, str):
        meta = load_build_meta(meta)
    store = ManifestStore(os.path.join(out_dir, "manifests"))
    paths = sorted(input_paths)
    pending = pending_inputs(paths, store) if resume else paths
    routed_root = os.path.join(out_dir, "routed")
    if not pending:
        return RunResult(None, _counts_from_manifests(store), [], 0, len(paths))

    routed = build_routed(pending, meta, cfg, file_config,
                          enrich_concurrency=enrich_concurrency)
    digest = _batch_digest(pending)
    pid_names = [partition_id(p) for p in pending]
    staging_dir = os.path.join(out_dir, ".staging", f"batch-{digest}")
    shutil.rmtree(staging_dir, ignore_errors=True)
    os.makedirs(staging_dir, exist_ok=True)
    os.makedirs(routed_root, exist_ok=True)
    # single streaming pass: per-sink fan-out write + count partials out
    from ..runtime import heavy_task_cpus

    counts_tbl = routed.map_batches(
        make_fanout_writer(staging_dir, pid_names), batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True,
        num_cpus=heavy_task_cpus()).to_pandas()
    # collapse possible per-block splits of one partition so manifest
    # checksums are independent of physical batching
    counts_tbl = counts_tbl.groupby(
        ["_partition", "sink", "severity"], as_index=False)[
        ["doc_count", "tok_sum"]].sum()

    manifests: list[Manifest] = []
    for i, path in enumerate(pending):
        # replace-then-commit, per partition: remove any prior copy of
        # this partition's output (a re-run after partial failure), move
        # the fresh one into place, THEN commit the manifest.
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
            partition_id=partition_id(path),
            input_path=path,
            row_count=int(sub["doc_count"].sum()),
            per_sink_counts=per_sink,
            token_checksum=checksum,
            committed_at=clock_now,
        )
        store.commit(m)
        manifests.append(m)
    shutil.rmtree(staging_dir, ignore_errors=True)

    agg = (
        counts_tbl.groupby(["sink", "severity"], as_index=False)[
            ["doc_count", "tok_sum"]].sum())
    counts = pa.Table.from_pandas(
        agg.sort_values(["sink", "severity"]).reset_index(drop=True),
        preserve_index=False)

    metrics = {
        "batch": digest,
        "n_partitions": len(pending),
        "total_docs": int(agg["doc_count"].sum()),
        "per_sink": {
            s: int(c) for s, c in
            agg.groupby("sink")["doc_count"].sum().items()},
    }
    if cfg.quarantine_dir is not None:
        # dead-letter accounting: total poison rows currently in the
        # quarantine dir (content-addressed files -> retry-stable)
        qrows = 0
        if os.path.isdir(cfg.quarantine_dir):
            for f in os.listdir(cfg.quarantine_dir):
                if f.endswith(".parquet"):
                    qrows += pq.ParquetFile(
                        os.path.join(cfg.quarantine_dir, f)
                    ).metadata.num_rows
        metrics["quarantined_rows"] = qrows
    metrics_dir = os.path.join(out_dir, "metrics")
    os.makedirs(metrics_dir, exist_ok=True)
    with open(os.path.join(metrics_dir, f"batch-{digest}.json"), "w") as f:
        json.dump(metrics, f, sort_keys=True)

    return RunResult(routed_root, counts, manifests, len(pending),
                     len(paths) - len(pending))


def _counts_from_manifests(store: ManifestStore) -> pa.Table:
    rows: dict[str, int] = {}
    for m in store.all():
        for sink, c in m.per_sink_counts.items():
            rows[sink] = rows.get(sink, 0) + c
    return pa.table({
        "sink": list(rows.keys()),
        "doc_count": list(rows.values()),
    })
