"""Enrich stage: broadcast hash join of parsed rows with build metadata.

Re-expresses the per-build es_fields attachment (J1: every log line of a
build gets the same ~20 metadata fields -- makeFields + the deepcopy per
line at logsender.py:418,540) and the per-file decoration
(filename/log_url/tags, logsender.py:540-545; get_file_info
logsender.py:375-381) as a STATEFUL ACTOR POOL:

* the build_meta table (small side -- one row per build) is ``ray.put``
  once on the driver; each actor fetches it ONCE in ``__init__`` and
  dictionary-encodes the join key (ST2/ST6 semantics: per-worker state,
  never re-shipped per batch, never shuffled);
* per batch, the row's ``build_uuid`` is mapped to an index into the
  metadata table via a dict lookup over the batch's *unique* uuids
  (typically a handful per block), then every metadata column is attached
  with one vectorized ``take`` -- no per-row Python, no deep copies.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..config import FileConfigEntry


# Columns attached from build_meta (everything but the join key).
def _meta_columns(meta: pa.Table) -> list[str]:
    return [c for c in meta.column_names if c != "build_uuid"]


class EnrichStage:
    """Callable actor class for ``map_batches(EnrichStage, concurrency=N)``."""

    def __init__(
        self,
        meta_ref,  # ray.ObjectRef of the build_meta pa.Table (broadcast)
        file_config: tuple[FileConfigEntry, ...],
    ):
        from ..runtime import tune_worker_threads

        tune_worker_threads()
        meta = ray.get(meta_ref) if isinstance(meta_ref, ray.ObjectRef) else meta_ref
        self.meta: pa.Table = meta.combine_chunks()
        uuids = self.meta["build_uuid"].to_pylist()
        self.uuid_to_idx = {u: i for i, u in enumerate(uuids)}
        self.meta_cols = _meta_columns(self.meta)
        # file config lookup (get_file_info, logsender.py:375-381) --
        # ordered endswith match on basenames; compiled once per actor.
        self.file_entries = [
            (os.path.basename(e.name), e.name, list(e.tags)) for e in file_config
        ]
        self._file_cache: dict[str, tuple[str, list[str]]] = {}

    def _file_info(self, build_file: str) -> tuple[str, list[str]]:
        hit = self._file_cache.get(build_file)
        if hit is None:
            hit = None
            for base, name, tags in self.file_entries:
                if build_file.endswith(base):
                    hit = (name, tags + [base])
                    break
            if hit is None:
                base = os.path.basename(build_file)
                hit = (base, [base])
            self._file_cache[build_file] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return batch
        # ---- build_uuid -> meta row index, via unique values ------------
        uuid_col = batch["build_uuid"].combine_chunks()
        enc = uuid_col.dictionary_encode()
        dict_vals = enc.dictionary.to_pylist()
        lut = np.array(
            [self.uuid_to_idx.get(u, -1) for u in dict_vals], dtype=np.int64
        )
        row_idx = lut[enc.indices.to_numpy(zero_copy_only=False)]
        missing = row_idx < 0
        # null indices -> null output rows (unknown build gets null metadata)
        take_idx = pa.array(np.where(missing, 0, row_idx), mask=missing)
        for col in self.meta_cols:
            batch = batch.append_column(col, self.meta[col].take(take_idx))

        # ---- per-file decoration (logsender.py:540-545) -----------------
        fname_col = batch["filename"].combine_chunks()
        fenc = fname_col.dictionary_encode()
        infos = [self._file_info(f) for f in fenc.dictionary.to_pylist()]
        cfg_names = pa.array([i[0] for i in infos], type=pa.string())
        tag_lists = pa.array([i[1] for i in infos], type=pa.list_(pa.string()))
        fidx = fenc.indices
        file_cfg_name = cfg_names.take(fidx)
        tags = tag_lists.take(fidx)
        # log_url = base log_url + config file name (or just the name)
        base_url = pc.fill_null(batch["log_url"].combine_chunks(), "")
        full_url = pc.binary_join_element_wise(base_url, file_cfg_name, "")
        batch = batch.set_column(
            batch.schema.get_field_index("log_url"), "log_url", full_url)
        batch = batch.append_column("tags", tags)
        return batch


# per-worker-process cache of built EnrichStage state, keyed by the
# broadcast object ref: tasks get actor-like amortization (the dict and
# file-config compile happen once per worker, not once per batch)
# without paying actor-pool startup (fresh processes + imports) per run.
_TASK_STATE: dict[str, EnrichStage] = {}


def make_enrich_fn(meta_ref, file_config: tuple[FileConfigEntry, ...]):
    def enrich(batch: pa.Table) -> pa.Table:
        key = meta_ref.hex()
        state = _TASK_STATE.get(key)
        if state is None:
            if len(_TASK_STATE) > 4:  # old broadcasts: let plasma GC them
                _TASK_STATE.clear()
            state = EnrichStage(meta_ref, file_config)
            _TASK_STATE[key] = state
        return state(batch)

    return enrich


def apply_enrich(
    ds: ray.data.Dataset,
    meta: pa.Table,
    file_config: tuple[FileConfigEntry, ...],
    *,
    concurrency: int | tuple[int, int] | None = None,
    num_cpus: float = 1.0,
    batch_size: int | None = None,
) -> ray.data.Dataset:
    """Attach the enrich stage.

    Default (``concurrency=None``): STATELESS TASKS over the broadcast
    metadata ref with per-worker state caching -- fuses with read+parse
    into one task operator at full cluster width and reuses Ray's warm
    worker pool (an actor pool must cold-start its processes per run,
    and upstream task stages fuse INTO it, capping read parallelism at
    pool size).  Pass an int/tuple to force the actor-pool form -- the
    right shape when per-worker init is heavy relative to the job (a
    huge metadata dict, a model load) and you want gang-scheduled,
    resource-isolated workers.
    """
    meta_ref = ray.put(meta)
    if concurrency is None:
        return ds.map_batches(
            make_enrich_fn(meta_ref, file_config),
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
            num_cpus=num_cpus,
        )
    return ds.map_batches(
        EnrichStage,
        fn_constructor_args=(meta_ref, file_config),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
