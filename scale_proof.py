#!/usr/bin/env python
"""LLM-ops scale proof: the dedup/curation operators at 100x documents.

Builds a deterministic 500k-doc corpus (sf0.1's 5,000 documents x 100
replicas, written once to /tmp as 32 parquet shards) with PLANTED
duplication -- every 10th replica is an exact copy, the rest get a
replica-unique marker word appended -- so exact-dup results have a
closed-form truth to verify against while the corpus is 100x anything
the per-round bench touches.  Runs the headline LLM-data operators at
full parallelism and prints ONE JSON line of per-op wall time +
docs/sec, verifying the planted counts where closed-form truth exists.

Usage: python scale_proof.py   (owns its Ray session; ~2 GiB of text)
"""
from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("GRAFT_SCALE_REPLICAS", "100"))
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_SHARDS = 32
CORPUS = f"/tmp/llm_scale_corpus_r{REPLICAS}_v1"


def build_corpus() -> tuple[int, int]:
    """Replicate documents REPLICAS x with planted duplication.

    Replica r of doc d keeps doc_id = d * REPLICAS + r.  r % 10 == 0 ->
    exact text copy (10 exact copies per original at REPLICAS=100);
    otherwise ' v<r>' is appended, making the text replica-unique.
    Deterministic, shard-parallel, written once (marker-file cached).
    """
    marker = os.path.join(CORPUS, ".done")
    base = pq.read_table(os.path.join(SRC, "documents.parquet"),
                         columns=["doc_id", "source", "text"])
    n_base = base.num_rows
    if os.path.exists(marker):
        with open(marker) as f:
            return json.load(f)["n_rows"], n_base
    os.makedirs(CORPUS, exist_ok=True)
    ids = base["doc_id"].to_numpy()
    texts = base["text"].to_pandas().to_numpy()
    srcs = base["source"].to_pandas().to_numpy()
    total = 0
    per_shard = (REPLICAS + N_SHARDS - 1) // N_SHARDS
    for shard in range(N_SHARDS):
        lo, hi = shard * per_shard, min((shard + 1) * per_shard, REPLICAS)
        if lo >= hi:
            continue
        parts = []
        for r in range(lo, hi):
            t = texts if r % 10 == 0 else np.char.add(
                texts.astype(str), f" v{r}")
            parts.append(pa.table({
                "doc_id": pa.array(ids * REPLICAS + r, pa.int64()),
                "source": pa.array(srcs, pa.string()),
                "text": pa.array(t, pa.string()),
            }))
        out = pa.concat_tables(parts)
        total += out.num_rows
        tmp = os.path.join(CORPUS, f".tmp-{shard:04d}.parquet")
        pq.write_table(out, tmp)
        os.replace(tmp, os.path.join(CORPUS, f"part-{shard:04d}.parquet"))
    with open(marker, "w") as f:
        json.dump({"n_rows": total}, f)
    return total, n_base


def main() -> None:
    import ray
    from ray.data import DataContext

    n_rows, n_base = build_corpus()
    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    try:
        from ci_log_processing_ray.ops.curation import dsir_select
        from ci_log_processing_ray.ops.dedup import (
            exact_dedup, minhash_lsh_dedup, simhash_clusters)
        from ci_log_processing_ray.ops.textstats import (
            gopher_rules, token_count_bpe)

        def read():
            return ray.data.read_parquet(CORPUS)

        # untimed warmup: start worker processes and pre-import the hot
        # modules so op timings measure compute, not interpreter startup
        def _warm_worker(b):
            import ci_log_processing_ray.ops.dedup  # noqa: F401
            import ci_log_processing_ray.ops.textstats  # noqa: F401

            return b

        ray.data.range(NCPU * 4, override_num_blocks=NCPU * 4).map_batches(
            _warm_worker).count()

        results: dict[str, dict] = {}

        def run(name, fn, check=None):
            t0 = time.perf_counter()
            out = fn()
            if hasattr(out, "to_pandas"):
                out = out.to_pandas()
            sec = time.perf_counter() - t0
            results[name] = {"sec": round(sec, 2),
                             "docs_per_sec": round(n_rows / sec),
                             "out_rows": len(out)}
            if check is not None:
                check(out)

        # exact dedup: each original text occurs REPLICAS//10 times as an
        # exact copy (plus each marked replica is unique).  sf0.1 has a
        # handful of cross-doc duplicate texts of its own, so assert
        # bounds from the planted structure, not strict equality.
        n_copies = REPLICAS // 10

        def check_exact(out):
            assert len(out) <= n_base * (REPLICAS - n_copies + 1), len(out)
            assert (out["dup_count"] >= 1).all()
            if n_copies >= 2:
                dup_groups = out[out["dup_count"] >= n_copies]
                assert len(dup_groups) <= n_base, len(dup_groups)

        run("exact_dedup",
            lambda: exact_dedup(read(), "text", "doc_id"), check_exact)

        # minhash must catch the planted exact-copy groups (jaccard 1.0
        # pairs are always banded together) -- clusters >= the planted
        # group count signals recall, not a hard truth (near-dups from
        # the marker-word perturbation may legitimately join).
        def check_minhash(out):
            assert len(out) >= n_base, len(out)

        run("minhash_dedup",
            lambda: minhash_lsh_dedup(read(), "text", "doc_id",
                                      jaccard_threshold=0.9),
            check_minhash)

        run("simhash", lambda: simhash_clusters(read(), "text", "doc_id"))
        run("gopher_rules",
            lambda: gopher_rules(read(), "text", "doc_id"),
            lambda out: (_ for _ in ()).throw(AssertionError(len(out)))
            if len(out) != n_rows else None)
        run("dsir_select",
            lambda: dsir_select(read(), "text", "doc_id", "source",
                                "src3", k=100),
            lambda out: None if len(out) == 100 else (_ for _ in ()).throw(
                AssertionError(len(out))))
        run("token_count_bpe",
            lambda: token_count_bpe(read(), "text", "source"))

        print(json.dumps({
            "corpus_docs": n_rows,
            "replicas": REPLICAS,
            "num_cpus": NCPU,
            "ops": results,
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
