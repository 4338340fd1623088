"""Vectorized message extraction and severity extraction.

* ``extract_messages`` -- the split-once-on-'|' of get_message
  (logsender.py:368-372): pipe present -> remainder, newline-stripped,
  lstripped; no pipe -> whole line newline-stripped (NOT lstripped --
  the reference's asymmetry is preserved).
* ``extract_severity`` -- the grok loglevel capture
  (openstack-filters.conf:48) modeled as first occurrence of the
  loglevel vocabulary anywhere in the line, default NONE.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import SEVERITIES, SEVERITY_NONE

_SEVERITY_PATTERN = r"\b(?P<severity>%s)\b" % "|".join(SEVERITIES)


def extract_messages(
    lines: pa.Array | pa.ChunkedArray, keep_newlines: bool = False
) -> pa.Array | pa.ChunkedArray:
    """get_message (logsender.py:368-372), vectorized with Arrow kernels.

    ``keep_newlines=True`` is the multiline-joined form: the logstash
    chain joins first (newlines INSIDE the event are real, grok runs
    ``(?m)`` over them, openstack-filters.conf:19-21) and the per-line
    newline strip has already happened before the join.
    """
    has_pipe = pc.greater_equal(pc.find_substring(lines, "|"), 0)
    # drop everything through the first '|' (no-op when '|' absent)
    after = pc.replace_substring_regex(
        lines, pattern=r"^[^|]*\|", replacement="", max_replacements=1
    )
    whole = lines
    if not keep_newlines:
        after = pc.replace_substring(after, "\n", "")
        whole = pc.replace_substring(lines, "\n", "")
    return pc.if_else(has_pipe, pc.utf8_ltrim_whitespace(after), whole)


def extract_severity(
    lines: pa.Array | pa.ChunkedArray,
    vocabulary: tuple[str, ...] | None = None,
    default: str = SEVERITY_NONE,
) -> pa.Array | pa.ChunkedArray:
    """First keyword of ``vocabulary`` found in the line, else ``default``
    (the grok loglevel capture generalized to any keyword set)."""
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    pattern = (
        _SEVERITY_PATTERN if vocabulary is None
        else r"\b(?P<severity>%s)\b" % "|".join(vocabulary)
    )
    hit = pc.extract_regex(lines, pattern=pattern)
    sev = pc.struct_field(hit, "severity")
    return pc.fill_null(sev, default)
