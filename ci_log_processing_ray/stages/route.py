"""Route stage: assign each row its output sink (OpenSearch-index analogue).

Re-expresses send_to_es's endswith routing (logsender.py:467-490):
``performance.json`` -> performance index, ``*.subunit`` -> subunit index,
everything else -> the main logstash index; plus the hard skips:
``testrepository.subunit.gz`` is broken and always dropped
(logsender.py:527-530).  Index names are ``prefix + YYYY.MM.DD``
(get_index, logsender.py:563-589) with the date pinned in PipelineConfig.

The sink is a plain string column -- the downstream writer partitions on
it (write_parquet(partition_cols=["sink"])), which is the Parquet
equivalent of per-index bulk inserts (S12/S13).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import PipelineConfig


def make_route_fn(cfg: PipelineConfig):
    index = cfg.index_name()
    perf_index = cfg.perf_index_name()
    subunit_index = cfg.subunit_index_name()

    def route(batch: pa.Table) -> pa.Table:
        fname = batch["filename"].combine_chunks()
        broken = pc.ends_with(fname, "testrepository.subunit.gz")
        batch = batch.filter(pc.invert(broken))
        fname = batch["filename"].combine_chunks()
        is_perf = pc.ends_with(fname, "performance.json")
        is_sub = pc.ends_with(fname, ".subunit")
        sink = pc.if_else(
            is_perf, pa.scalar(perf_index),
            pc.if_else(is_sub, pa.scalar(subunit_index), pa.scalar(index)),
        )
        return batch.append_column("sink", sink)

    return route


def apply_route(ds: ray.data.Dataset, cfg: PipelineConfig,
                num_cpus: float = 1.0) -> ray.data.Dataset:
    return ds.map_batches(
        make_route_fn(cfg), batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True, num_cpus=num_cpus)
