"""Corpus readers.

``read_token_sequences`` replaces the reference's network source + build-dir
scan (get_builds logscraper.py:414-440; get_ready_directories
logsender.py:175-198): the pre-tokenized Parquet table *is* the staged
corpus.  Column pruning happens at the read; resume filtering (the
BuildCache anti-join, logscraper.py:457-468) happens on the file list
before the read via state/manifest.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow.parquet as pq
import ray.data


def read_token_sequences(
    paths: str | Sequence[str],
    *,
    columns: Optional[list[str]] = None,
    override_num_blocks: Optional[int] = None,
) -> ray.data.Dataset:
    """Read the (doc_id, tokens, n_tok, source) table, pruned to `columns`."""
    return ray.data.read_parquet(
        paths,
        columns=columns,
        override_num_blocks=override_num_blocks,
    )


def load_build_meta(path: str) -> "pyarrow.Table":  # noqa: F821
    """Load the small build_meta lookup side eagerly on the driver.

    This is the broadcast side of the enrichment join (J1, SURVEY.md 2.4):
    one row per build, O(builds) rows total -- orders of magnitude smaller
    than the log-line table, so it is ray.put() once and read inside each
    enrich actor, never shuffled.
    """
    return pq.read_table(path)
