"""End-to-end conformance: Ray pipeline output vs the row-at-a-time
reference oracle on the synthetic corpus (north-rule gates: per-sink
count equality, routed-row set equality, token-array equality)."""

import collections

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ci_log_processing_ray import reference_impl as ref
from ci_log_processing_ray.config import DEFAULT_FILE_CONFIG, PipelineConfig
from ci_log_processing_ray.pipelines.flagship import build_routed, run_pipeline
from ci_log_processing_ray.sources.readers import load_build_meta

CFG = PipelineConfig(skip_debug=True)


@pytest.fixture(scope="module")
def expected(corpus_dir):
    _, info = corpus_dir
    table = pq.read_table(info["paths"]["token_sequences"])
    return table, ref.expected_routed_rows(table, CFG)


def _routed_rows(ray_session, corpus_dir, cfg):
    _, info = corpus_dir
    meta = load_build_meta(info["paths"]["build_meta"])
    ds = build_routed([info["paths"]["token_sequences"]], meta, cfg,
                      track_partitions=False)
    return ds.take_all()


def test_routed_row_set_equality(ray_session, corpus_dir, expected):
    table, want = expected
    got = _routed_rows(ray_session, corpus_dir, CFG)
    got_set = {(r["sink"], r["doc_id"]) for r in got}
    want_set = {(r["sink"], r["doc_id"]) for r in want}
    assert got_set == want_set, (
        f"missing={list(want_set - got_set)[:5]} extra={list(got_set - want_set)[:5]}")


def test_per_sink_severity_counts(ray_session, corpus_dir, expected):
    _, want = expected
    got = _routed_rows(ray_session, corpus_dir, CFG)
    got_counts = collections.Counter((r["sink"], r["severity"]) for r in got)
    want_counts = collections.Counter((r["sink"], r["severity"]) for r in want)
    assert got_counts == want_counts


def test_timestamps_and_messages_match(ray_session, corpus_dir, expected):
    _, want = expected
    got = _routed_rows(ray_session, corpus_dir, CFG)
    got_by_id = {r["doc_id"]: r for r in got}
    for w in want:
        g = got_by_id[w["doc_id"]]
        assert g["ts"] == w["ts"], (w["doc_id"], g["ts"], w["ts"])
        assert g["message"] == w["message"], w["doc_id"]
        assert g["severity"] == w["severity"], w["doc_id"]


def test_token_array_equality(ray_session, corpus_dir, expected):
    table, _ = expected
    got = _routed_rows(ray_session, corpus_dir, CFG)
    orig = dict(zip(table["doc_id"].to_pylist(), table["tokens"].to_pylist()))
    for r in got:
        assert list(r["tokens"]) == orig[r["doc_id"]], r["doc_id"]


def test_batch_fill_equals_grouped_fill(ray_session, corpus_dir):
    batch_rows = _routed_rows(ray_session, corpus_dir, CFG)
    grouped_cfg = PipelineConfig(skip_debug=True, fill_mode="grouped")
    grouped_rows = _routed_rows(ray_session, corpus_dir, grouped_cfg)

    def key(rows):
        return sorted((r["doc_id"], r["sink"], r["ts"], r["severity"],
                       r["message"]) for r in rows)

    assert key(batch_rows) == key(grouped_rows)
    # token arrays survive the grouped path (incl. the pandas hop of
    # the sparse reduce) byte-identically
    btok = {r["doc_id"]: list(r["tokens"]) for r in batch_rows}
    for r in grouped_rows:
        assert list(r["tokens"]) == btok[r["doc_id"]], r["doc_id"]


def test_enrichment_fields(ray_session, corpus_dir):
    _, info = corpus_dir
    meta_tbl = load_build_meta(info["paths"]["build_meta"])
    metas = {m["build_uuid"]: m for m in meta_tbl.to_pylist()}
    got = _routed_rows(ray_session, corpus_dir, CFG)
    assert got, "pipeline produced no rows"
    for r in got[:500]:
        m = metas[r["build_uuid"]]
        assert r["build_name"] == m["build_name"]
        assert r["build_status"] == m["build_status"]
        assert r["project"] == m["project"]
        assert r["tenant"] == m["tenant"]
        assert list(r["hosts_region"] or []) == list(m["hosts_region"] or [])
        # per-file decoration (logsender.py:540-545)
        file_name, file_tags = ref.get_file_info(
            [{"name": e.name, "tags": list(e.tags)} for e in DEFAULT_FILE_CONFIG],
            r["filename"])
        assert list(r["tags"]) == file_tags, r["filename"]
        base = m["log_url"] or ""
        assert r["log_url"] == base + file_name


def test_run_pipeline_and_resume(ray_session, corpus_dir, tmp_path, expected):
    _, info = corpus_dir
    _, want = expected
    out = str(tmp_path / "out")
    res = run_pipeline([info["paths"]["token_sequences"]],
                       info["paths"]["build_meta"], out, CFG, clock_now=100.0)
    assert res.n_pending == 1 and res.n_skipped == 0
    want_counts = collections.Counter((r["sink"], r["severity"]) for r in want)
    got = {(r["sink"], r["severity"]): r["doc_count"]
           for r in res.counts.to_pylist()}
    assert got == dict(want_counts)
    # written parquet preserves the token arrays byte-identically
    routed_tbl = pq.read_table(res.routed_dir)
    table, _ = expected
    orig = dict(zip(table["doc_id"].to_pylist(), table["tokens"].to_pylist()))
    for doc_id, toks in zip(routed_tbl["doc_id"].to_pylist()[:1000],
                            routed_tbl["tokens"].to_pylist()[:1000]):
        assert toks == orig[doc_id]
    # resume: everything committed -> nothing pending
    res2 = run_pipeline([info["paths"]["token_sequences"]],
                        info["paths"]["build_meta"], out, CFG, clock_now=101.0)
    assert res2.n_pending == 0 and res2.n_skipped == 1
    # manifest GC by TTL
    from ci_log_processing_ray.state.manifest import ManifestStore

    store = ManifestStore(f"{out}/manifests")
    assert store.gc(now=100.0 + 90000, ttl_seconds=86400.0)
    res3 = run_pipeline([info["paths"]["token_sequences"]],
                        info["paths"]["build_meta"], out, CFG, clock_now=102.0)
    assert res3.n_pending == 1


def test_follow_mode_ticks(ray_session, corpus_dir, tmp_path):
    """--follow loop: tick 1 processes what exists; tick 2 sees one new
    input and processes ONLY it; a drain tick does nothing."""
    import shutil

    from ci_log_processing_ray.pipelines.follow import run_follow

    _, info = corpus_dir
    src = info["paths"]["token_sequences"]
    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    shutil.copy(src, in_dir / "a.parquet")

    sleeps = []

    def list_inputs():
        return sorted(str(p) for p in in_dir.glob("*.parquet"))

    out = str(tmp_path / "out")
    r1 = run_follow(list_inputs, info["paths"]["build_meta"], out, CFG,
                    ticks=1, clock0=0.0)
    assert r1[0].n_pending == 1

    shutil.copy(src, in_dir / "b.parquet")  # same content, new partition
    r2 = run_follow(list_inputs, info["paths"]["build_meta"], out, CFG,
                    ticks=2, wait_seconds=60.0, sleep_fn=sleeps.append,
                    clock0=100.0, stop_when_idle=True)
    assert r2[0].n_pending == 1 and r2[0].n_skipped == 1
    # second tick: drained (stop_when_idle ends the loop)
    assert r2[1].n_pending == 0
    assert sleeps == [60.0]
    # identical content -> identical per-sink counts in both manifests
    assert r1[0].manifests[0].per_sink_counts == r2[0].manifests[0].per_sink_counts


def test_fanout_writer_idempotent(ray_session, corpus_dir, tmp_path):
    """Task-retry semantics: running the SAME block through the fan-out
    writer twice must produce the same files (overwritten, not
    duplicated) and identical count partials -- exactly-once counts."""
    import os

    import pyarrow.parquet as pq

    from ci_log_processing_ray.pipelines.flagship import make_fanout_writer
    from ci_log_processing_ray.sources.readers import load_build_meta
    from ci_log_processing_ray.pipelines.flagship import build_routed

    _, info = corpus_dir
    meta = load_build_meta(info["paths"]["build_meta"])
    routed = build_routed([info["paths"]["token_sequences"]], meta, CFG)
    block = pa.concat_tables(
        list(routed.iter_batches(batch_format="pyarrow")))

    staging = str(tmp_path / "stage")
    os.makedirs(staging)
    writer = make_fanout_writer(staging)
    p1 = writer(block)

    def listing():
        out = {}
        for root, _, files in os.walk(staging):
            for f in files:
                path = os.path.join(root, f)
                out[os.path.relpath(path, staging)] = pq.read_metadata(
                    path).num_rows
        return out

    l1 = listing()
    p2 = writer(block)  # the "retry"
    l2 = listing()
    assert l1 == l2, "retry must overwrite, not duplicate"
    assert p1.equals(p2)
    assert sum(l1.values()) == int(
        pa.compute.sum(p1["doc_count"]).as_py())


def test_cli_end_to_end(corpus_dir, tmp_path):
    """The console entry point runs the full batch and resumes (the
    reference's logsender CLI surface), in its own Ray session."""
    import json
    import os
    import subprocess
    import sys

    _, info = corpus_dir
    out = str(tmp_path / "cli_out")
    cmd = [sys.executable, "-m", "ci_log_processing_ray",
           "--inputs", info["paths"]["token_sequences"],
           "--build-meta", info["paths"]["build_meta"],
           "--out", out, "--skip-debug", "--num-cpus", "2"]
    env = dict(os.environ, RAY_ADDRESS="local")
    r1 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    d1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert d1["n_pending"] == 1 and sum(
        c["doc_count"] for c in d1["counts"]) > 0
    r2 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        timeout=300)
    d2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert d2["n_pending"] == 0 and d2["n_skipped"] == 1


def test_grouped_fill_exact_on_scrambled_layout(ray_session, corpus_dir,
                                                tmp_path, expected):
    """The whole point of fill_mode='grouped': with rows RANDOMLY
    PERMUTED across shards (files split mid-run, order destroyed), the
    sparse fill must still reproduce the reference scan exactly."""
    import numpy as np
    import pyarrow.parquet as pq

    from ci_log_processing_ray.sources.readers import load_build_meta

    table, want = expected
    rng = np.random.default_rng(31)
    perm = rng.permutation(len(table))
    scrambled = table.take(pa.array(perm))
    shard_paths = []
    for i in range(4):
        sl = scrambled.slice(i * len(table) // 4,
                             (i + 1) * len(table) // 4 - i * len(table) // 4)
        p = str(tmp_path / f"scram-{i}.parquet")
        pq.write_table(sl, p)
        shard_paths.append(p)

    _, info = corpus_dir
    meta = load_build_meta(info["paths"]["build_meta"])
    cfg = PipelineConfig(skip_debug=True, fill_mode="grouped")
    from ci_log_processing_ray.pipelines.flagship import build_routed

    got = build_routed(shard_paths, meta, cfg, track_partitions=False).take_all()
    got_key = sorted((r["doc_id"], r["sink"], r["ts"], r["severity"],
                      r["message"]) for r in got)
    want_key = sorted((r["doc_id"], r["sink"], r["ts"], r["severity"],
                       r["message"]) for r in want)
    assert got_key == want_key


def test_partial_failure_resume(ray_session, corpus_dir, tmp_path):
    """Crash-recovery semantics: if one partition's manifest is missing
    (its task died after writing, before commit), a re-run reprocesses
    ONLY that partition and converges to the same global counts."""
    import glob
    import os

    import pyarrow.parquet as pq

    _, info = corpus_dir
    src = info["paths"]["token_sequences"]
    in_dir = tmp_path / "inputs"
    in_dir.mkdir()
    # 3 input partitions with distinct content slices
    tbl = pq.read_table(src)
    third = len(tbl) // 3
    paths = []
    for i in range(3):
        sl = tbl.slice(i * third, third if i < 2 else len(tbl) - 2 * third)
        p = str(in_dir / f"in-{i}.parquet")
        pq.write_table(sl, p)
        paths.append(p)

    out = str(tmp_path / "out")
    res1 = run_pipeline(paths, info["paths"]["build_meta"], out, CFG,
                        clock_now=1.0)
    assert res1.n_pending == 3
    counts1 = {(r["sink"], r["severity"]): r["doc_count"]
               for r in res1.counts.to_pylist()}

    # simulate the crash: one committed manifest vanishes
    victims = sorted(glob.glob(os.path.join(out, "manifests", "*.json")))
    os.unlink(victims[1])

    res2 = run_pipeline(paths, info["paths"]["build_meta"], out, CFG,
                        clock_now=2.0)
    assert res2.n_pending == 1 and res2.n_skipped == 2
    # the reprocessed partition's counts match its original manifest run
    from ci_log_processing_ray.state.manifest import ManifestStore

    store = ManifestStore(os.path.join(out, "manifests"))
    total = {}
    for m in store.all():
        for sink, c in m.per_sink_counts.items():
            total[sink] = total.get(sink, 0) + c
    want = {}
    for (sink, _), c in counts1.items():
        want[sink] = want.get(sink, 0) + c
    assert total == want
    # and the routed tree on disk holds EXACTLY one copy of every row --
    # the reprocessed partition replaced its directory instead of
    # landing a second copy next to the old one
    ondisk = sum(
        pq.read_metadata(p).num_rows
        for p in glob.glob(os.path.join(out, "routed", "**", "*.parquet"),
                           recursive=True))
    assert ondisk == sum(want.values())


def test_flagship_plan_fuses_read(ray_session, corpus_dir):
    """The read must fuse into the map chain (same num_cpus request on
    every stage): a separate ReadParquet operator re-ships the whole
    decoded corpus through the object store (measured 2.97 -> 2.30 s at
    sf0.1/32 when fusion landed).  Guard the plan shape, not timings."""
    _, info = corpus_dir
    meta = load_build_meta(info["paths"]["build_meta"])
    ds = build_routed([info["paths"]["token_sequences"]], meta, CFG,
                      track_partitions=False).materialize()
    ops = [line.split(":")[0].split(" ", 2)[-1]
           for line in ds.stats().splitlines()
           if line.startswith("Operator")]
    read_ops = [o for o in ops if "ReadParquet" in o]
    assert read_ops and all("->" in o for o in read_ops), ops


def test_compact_routed_layout_and_idempotency(ray_session, tmp_path):
    """Compaction must (a) preserve every row per sink, (b) reduce the
    file count to the FFD bin count, (c) respect target_bytes, and
    (d) skip every finished bin on a re-run with identical stats."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ci_log_processing_ray.pipelines.compact import compact_routed

    routed = tmp_path / "routed"
    rows_per_sink = {}
    for shard in range(6):
        for sink in ["a", "b"]:
            d = routed / f"part-{shard:02d}" / f"sink={sink}"
            d.mkdir(parents=True)
            n = 10 * (shard + 1)
            t = pa.table({"x": list(range(n)),
                          "s": [sink] * n})
            pq.write_table(t, d / "part-0.parquet")
            rows_per_sink[sink] = rows_per_sink.get(sink, 0) + n

    out = tmp_path / "compact"
    s1 = compact_routed(str(routed), str(out),
                        target_bytes=1 << 30).set_index("sink")
    for sink in ["a", "b"]:
        assert int(s1.loc[sink, "n_rows"]) == rows_per_sink[sink]
        assert int(s1.loc[sink, "n_files_in"]) == 6
        assert int(s1.loc[sink, "n_files_out"]) == 1
        assert int(s1.loc[sink, "n_skipped"]) == 0
        files = list((out / f"sink={sink}").glob("*.parquet"))
        assert len(files) == 1
        assert pq.read_metadata(files[0]).num_rows == rows_per_sink[sink]

    # re-run: every bin already exists -> all skipped, stats identical
    s2 = compact_routed(str(routed), str(out),
                        target_bytes=1 << 30).set_index("sink")
    assert (s2["n_skipped"] == s2.index.map(
        lambda s: 1)).all()
    assert s2["n_rows"].equals(s1["n_rows"])

    # tiny target: every input file lands in its own bin
    out2 = tmp_path / "compact2"
    s3 = compact_routed(str(routed), str(out2),
                        target_bytes=1).set_index("sink")
    assert int(s3.loc["a", "n_files_out"]) == 6
    assert int(s3.loc["a", "n_rows"]) == rows_per_sink["a"]


def test_cli_compact_mode(corpus_dir, tmp_path):
    """--compact-dir coalesces a routed tree produced by the batch CLI
    and preserves the routed totals; second invocation skips all."""
    import json
    import os
    import subprocess
    import sys

    _, info = corpus_dir
    routed = str(tmp_path / "cli_routed")
    env = dict(os.environ, RAY_ADDRESS="local")
    base = [sys.executable, "-m", "ci_log_processing_ray",
            "--num-cpus", "2"]
    r = subprocess.run(base + [
        "--inputs", info["paths"]["token_sequences"],
        "--build-meta", info["paths"]["build_meta"],
        "--out", routed, "--skip-debug"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    total = sum(c["doc_count"] for c in json.loads(
        r.stdout.strip().splitlines()[-1])["counts"])

    out = str(tmp_path / "cli_compacted")
    cmd = base + ["--compact-dir", os.path.join(routed, "routed"),
                  "--out", out]
    c1 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        timeout=300)
    assert c1.returncode == 0, c1.stderr[-2000:]
    d1 = json.loads(c1.stdout.strip().splitlines()[-1])
    assert d1["n_rows"] == total
    # the fixture corpus is a single input shard, so each sink already
    # holds one file; reduction on fragmented trees is pinned by
    # test_compact_routed_layout_and_idempotency
    assert d1["n_files_out"] <= d1["n_files_in"]
    assert d1["n_skipped"] == 0
    c2 = subprocess.run(cmd, capture_output=True, text=True, env=env,
                        timeout=300)
    d2 = json.loads(c2.stdout.strip().splitlines()[-1])
    assert d2["n_rows"] == total
    assert d2["n_skipped"] == d2["n_files_out"]


def test_sorted_export_global_order_and_resume(ray_session, tmp_path):
    """sorted_export writes range files globally ordered on the sort
    column, commits per-range manifests, skips everything on re-run,
    and redoes ONLY a damaged range."""
    import glob as _glob
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from ci_log_processing_ray.pipelines.export import sorted_export

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 1_000_000, size=20_000)
    rows = [{"k": int(v), "payload": int(i)} for i, v in enumerate(vals)]
    ds = ray.data.from_items(rows)
    out = str(tmp_path / "sorted")

    r1 = sorted_export(ds, "k", out, n_ranges=8)
    assert r1["written"] == 8 and r1["rows_written"] == 20_000

    files = sorted(_glob.glob(out + "/range-*.parquet"))
    assert files
    last = None
    total = 0
    for f in files:
        t = pq.read_table(f)
        k = t["k"].to_numpy()
        assert (np.diff(k) >= 0).all(), f  # sorted within file
        if last is not None:
            assert k[0] >= last  # ordered across files
        last = k[-1]
        total += len(k)
    assert total == 20_000

    r2 = sorted_export(ds, "k", out, n_ranges=8)
    assert r2 == {"written": 0, "skipped": 8, "rows_written": 0}

    # damage one range: its manifest + file vanish; only it is redone
    victim = files[3]
    os.unlink(victim)
    mdir = os.path.join(out, "_manifests")
    os.unlink(os.path.join(mdir, "sorted-range-00003.json"))
    r3 = sorted_export(ds, "k", out, n_ranges=8)
    assert r3["written"] == 1 and r3["skipped"] == 7
    t = pq.read_table(victim)
    assert (np.diff(t["k"].to_numpy()) >= 0).all()
    assert sum(pq.ParquetFile(f).metadata.num_rows
               for f in sorted(_glob.glob(out + "/range-*.parquet"))) \
        == 20_000


def test_sorted_export_persisted_cuts_and_input_guard(ray_session,
                                                      tmp_path):
    """Resume must reuse the FIRST run's persisted cut points and fail
    loudly when the input rows changed (ADVICE: recomputed cuts could
    silently drop rows into already-committed ranges); piece names are
    deterministic content digests so retries overwrite, not accumulate."""
    import json
    import os

    import numpy as np
    import pytest
    import ray

    from ci_log_processing_ray.pipelines.export import sorted_export

    rng = np.random.default_rng(11)
    rows = [{"k": int(v), "p": int(i)}
            for i, v in enumerate(rng.integers(0, 10_000, size=4_000))]
    ds = ray.data.from_items(rows)
    out = str(tmp_path / "sorted")

    r1 = sorted_export(ds, "k", out, n_ranges=4)
    assert r1["rows_written"] == 4_000
    cuts_path = os.path.join(out, "_cuts.json")
    meta = json.load(open(cuts_path))
    assert meta["n_ranges"] == 4 and meta["rows"] == 4_000

    # damage one range, resume with CHANGED input -> loud failure, no
    # silent row loss
    os.unlink(os.path.join(out, "range-00001.parquet"))
    os.unlink(os.path.join(out, "_manifests", "sorted-range-00001.json"))
    changed = ray.data.from_items(rows[:-1])
    with pytest.raises(AssertionError, match="input changed"):
        sorted_export(changed, "k", out, n_ranges=4)

    # resume with the SAME input heals the range using persisted cuts
    r2 = sorted_export(ds, "k", out, n_ranges=4)
    assert r2["written"] == 1 and r2["skipped"] == 3

    # n_ranges mismatch on resume is refused
    os.unlink(os.path.join(out, "range-00002.parquet"))
    os.unlink(os.path.join(out, "_manifests", "sorted-range-00002.json"))
    with pytest.raises(AssertionError, match="n_ranges"):
        sorted_export(ds, "k", out, n_ranges=8)


def test_flagship_quarantine_e2e(ray_session, tmp_path):
    """A poison row in a real flagship partition (a performance.json
    row whose payload is NOT valid JSON, so json.loads raises inside
    the parse UDF) must land in quarantine Parquet with its exception
    string while every other row of the partition flows through to the
    routed output; the metrics manifest records the quarantined row
    count (round-3 verdict task #7)."""
    import glob as _glob
    import json as _json
    import os

    import pyarrow.compute as pc

    from ci_log_processing_ray.sources.synth import (CorpusSpec,
                                                     generate_corpus)

    corpus = str(tmp_path / "corpus")
    info = generate_corpus(corpus,
                           CorpusSpec(n_builds=4, lines_per_file=20,
                                      seed=11))
    seq_path = info["paths"]["token_sequences"]
    t = pq.read_table(seq_path)
    # poison one performance row: swap its tokens for a console line's
    # (detokenizes to a log line, not JSON -> json.loads raises)
    src = t["source"].to_pylist()
    perf_idx = src.index("performance")
    log_idx = src.index("console")
    toks = t["tokens"].to_pylist()
    ntok = t["n_tok"].to_pylist()
    toks[perf_idx] = toks[log_idx]
    ntok[perf_idx] = ntok[log_idx]
    poisoned = pa.table({
        "doc_id": t["doc_id"],
        "tokens": pa.array(toks, type=t.schema.field("tokens").type),
        "n_tok": pa.array(ntok, type=t.schema.field("n_tok").type),
        "source": t["source"]})
    pq.write_table(poisoned, seq_path)
    poison_doc_id = t["doc_id"][perf_idx].as_py()

    qdir = str(tmp_path / "quarantine")
    out = str(tmp_path / "out")
    cfg = PipelineConfig(skip_debug=True, quarantine_dir=qdir)
    meta = load_build_meta(info["paths"]["build_meta"])
    res = run_pipeline([seq_path], meta, out, cfg)
    assert res.n_pending == 1

    # the poison row is in quarantine with its exception attached
    qfiles = _glob.glob(os.path.join(qdir, "poison-*.parquet"))
    assert qfiles
    qt = pa.concat_tables([pq.read_table(f) for f in qfiles])
    assert qt.num_rows == 1
    assert qt["doc_id"][0].as_py() == poison_doc_id
    assert "JSONDecodeError" in qt["_error"][0].as_py()

    # the partition still committed, minus only the poison row, and
    # the routed tree contains the rest of the partition
    routed = pq.ParquetDataset(res.routed_dir).read()
    assert poison_doc_id not in set(routed["doc_id"].to_pylist())
    assert routed.num_rows > 0
    # the OTHER performance row still made it through
    assert routed.filter(
        pc.match_substring(routed["sink_name"].combine_chunks(),
                           "performance")).num_rows > 0

    # metrics manifest records the quarantined row count
    mfiles = _glob.glob(os.path.join(out, "metrics", "batch-*.json"))
    assert mfiles
    metrics = _json.load(open(mfiles[0]))
    assert metrics["quarantined_rows"] == 1
