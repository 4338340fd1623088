"""Web-crawl curation: URL parsing, canonicalization, host blocklists.

The first stage of any crawl-derived corpus pipeline: split a URL into
(host, path), canonicalize (lowercase host, strip port / query /
fragment), and drop documents from blocked hosts.  Everything is one
RE2 pass per batch (``pyarrow.compute.extract_regex`` -- the same
engine DuckDB's ``regexp_extract`` uses, so an oracle matches
bit-for-bit) plus one broadcast set-membership filter; no shuffle, no
Python rows.

The blocklist ships once via ``ray.put`` and each task reads it
zero-copy from the object store -- the broadcast-small-side pattern,
never re-shipped per batch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

# host: after the scheme, up to the first ':', '/', '?' or '#'
# path: after the authority, up to the first '?' or '#' (may be empty)
_URL_RE = r"^https?://(?P<host>[^/:?#]+)[^/?#]*(?P<path>[^?#]*)"


def parse_and_filter_urls(
    ds: ray.data.Dataset,
    url_col: str,
    *,
    blocked_hosts: set[str] | frozenset[str] = frozenset(),
    keep_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Adds ``host``, ``path`` and ``canonical_url`` (lowercased host +
    path, port/query/fragment stripped) and drops rows whose lowercased
    host is in ``blocked_hosts`` or whose URL does not parse."""
    blocked_ref = ray.put(pa.array(sorted(blocked_hosts), type=pa.string()))

    def fn(t: pa.Table) -> pa.Table:
        urls = t[url_col].combine_chunks()
        parts = pc.extract_regex(urls, _URL_RE)
        ok = pc.is_valid(parts)
        host = pc.utf8_lower(pc.struct_field(parts, "host"))
        path = pc.struct_field(parts, "path")
        canonical = pc.binary_join_element_wise(host, path, "")
        cols = {c: t[c] for c in (keep_cols or t.column_names)}
        cols.update({"host": host, "path": path,
                     "canonical_url": canonical})
        out = pa.table(cols)
        blocked = ray.get(blocked_ref)
        keep = pc.and_(ok, pc.invert(
            pc.is_in(host, value_set=blocked)))
        return out.filter(keep)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
