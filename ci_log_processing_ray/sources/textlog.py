"""Raw build-directory source: text logs, ``.gz`` variants, binary
subunit streams and performance.json files -> parse-ready rows.

The Ray-Data shape of the reference's download+open path: logscraper
fetches every configured file AND its ``.gz`` twin
(logscraper.py:515-527) and lets the HTTP layer decode the
content-encoding; logsender then opens the file as plain text
(logline_iter, logsender.py:394-413), parses ``testrepository.subunit``
binary streams through ReadSubunit (subunit_iter, logsender.py:431-464)
and reads performance.json whole (json_iter).  Here:

* ``ray.data.read_binary_files(include_paths=True)`` is the file scan;
* gzip decode happens vectorized in the same map_batches task
  (the recorded filename is the DECODED name -- ``.gz`` stripped --
  matching makeEvent's ``file_object.replace(".gz", "")`` tag lookup,
  logscraper.py:328-331);
* ``testrepository.subunit.gz`` is skipped outright, the reference's
  broken-file rule (logsender.py:527-530);
* binary subunit decodes at the source into the same per-test JSON rows
  the parse stage's subunit branch consumes, one row per test;
* output rows carry the ``{build_uuid}/{filename}/{line:06d}`` doc_id
  convention of the token-sequence corpus, so every downstream stage
  (parse, enrich, route, write) is unchanged.

Layout convention: ``<root>/<build_uuid>/<relative/file/path>``.
"""

from __future__ import annotations

import gzip
import json
import os
import posixpath

import pyarrow as pa

import ray.data

from ..config import (
    BROKEN_FILES,
    DEFAULT_FILE_CONFIG,
    FileConfigEntry,
    SOURCE_TAGS,
)

_TAG_TO_SOURCE: dict[str, str] = {
    tag: src for src, tags in SOURCE_TAGS.items() for tag in tags
}


def strip_gz(name: str) -> str:
    return name[:-3] if name.endswith(".gz") else name


def classify_source(
    rel_name: str,
    file_config: tuple[FileConfigEntry, ...] = DEFAULT_FILE_CONFIG,
) -> str:
    """Map a build-relative file name to its parse family (the `source`
    column).  Tag matching strips ``.gz`` exactly like makeEvent
    (logscraper.py:328-331); unmatched text files fall into the neutral
    ``text`` family (no grok branch claims them in
    openstack-filters.conf either)."""
    base = strip_gz(rel_name)
    if base.endswith(".subunit"):
        return "subunit"
    if base.endswith("performance.json"):
        return "performance"
    for entry in file_config:
        if base.endswith(entry.name) or base.endswith(
                os.path.basename(entry.name)):
            for tag in entry.tags:
                src = _TAG_TO_SOURCE.get(tag)
                if src is not None:
                    return src
            break
    return "text"


ROW_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("line", pa.string()),
    ("source", pa.string()),
    ("n_tok", pa.int32()),
])


def decode_file(fname: str, data: bytes,
                file_config: tuple[FileConfigEntry, ...] = DEFAULT_FILE_CONFIG,
                ) -> tuple[list[str], str, str]:
    """One fetched file body -> (rows, decoded_fname, source).

    Shared by the build-dir scan and the live HTTP source: broken-file
    skip, transparent gzip (magic-byte guarded -- both the Arrow
    filesystem layer and requests may have decoded already), binary
    subunit -> per-test JSON rows, performance.json whole-body row,
    plain text -> one row per line."""
    if posixpath.basename(fname) in BROKEN_FILES:
        return [], fname, ""
    if fname.endswith(".gz"):
        if data[:2] == b"\x1f\x8b":
            data = gzip.decompress(data)
        fname = strip_gz(fname)
    source = classify_source(fname, file_config)
    if source == "subunit":
        from ..functions.subunit import SubunitError, subunit_results

        rows = []
        try:
            results = subunit_results(data)
        except SubunitError:
            # reference semantics (logsender.py:438-441): a subunit file
            # whose body is not a subunit stream (HTML error page,
            # truncated download) is skipped, not fatal
            return [], fname, source
        for name, r in results.items():
            # FLAG_TIMESTAMP is optional in the wire format: a terminal
            # packet without it leaves start/end as None
            rows.append(json.dumps({
                "test_name": name,
                "status": r["status"],
                "start": (r["start_time"].isoformat()
                          if r["start_time"] is not None else None),
                "end": (r["end_time"].isoformat()
                        if r["end_time"] is not None else None),
            }, sort_keys=True))
        return rows, fname, source
    text = data.decode("utf-8", errors="replace")
    if source == "performance":
        return [text], fname, source
    return text.splitlines(), fname, source


def _decode_one(path: str, data: bytes, root: str,
                file_config: tuple[FileConfigEntry, ...]):
    """One downloaded file -> parse-ready rows (doc_id, line, source)."""
    rel = os.path.relpath(path, root).replace(os.sep, "/")
    build_uuid, _, fname = rel.partition("/")
    if not fname:
        build_uuid, fname = "unknown", rel
    rows, fname, source = decode_file(fname, data, file_config)
    return rows, build_uuid, fname, source


def make_decode_fn(root: str,
                   file_config: tuple[FileConfigEntry, ...]):
    def decode(batch: pa.Table) -> pa.Table:
        doc_ids, lines, sources = [], [], []
        for path, data in zip(batch["path"].to_pylist(),
                              batch["bytes"].to_pylist()):
            rows, build_uuid, fname, source = _decode_one(
                path, data, root, file_config)
            for i, row in enumerate(rows):
                doc_ids.append(f"{build_uuid}/{fname}/{i:06d}")
                lines.append(row)
            sources.extend([source] * len(rows))
        return pa.table({
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "line": pa.array(lines, type=pa.string()),
            "source": pa.array(sources, type=pa.string()),
            # raw text has no token ids; 0 keeps downstream int sums defined
            "n_tok": pa.array([0] * len(doc_ids), type=pa.int32()),
        }, schema=ROW_SCHEMA)

    return decode


def read_log_files(
    root: str,
    *,
    file_config: tuple[FileConfigEntry, ...] = DEFAULT_FILE_CONFIG,
    num_cpus: float = 1.0,
) -> ray.data.Dataset:
    """Read every file under ``root`` (one build dir per subdirectory)
    into parse-ready rows.  One read task per file keeps a file's rows
    contiguous within a block -- the carry-forward layout contract."""
    paths = []
    for dirpath, _, files in os.walk(root):
        for f in sorted(files):
            paths.append(os.path.join(dirpath, f))
    paths.sort()
    ds = ray.data.read_binary_files(
        paths, include_paths=True, override_num_blocks=max(1, len(paths)))
    return ds.map_batches(
        make_decode_fn(root, file_config), batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True, num_cpus=num_cpus)
