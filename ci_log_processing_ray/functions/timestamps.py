"""Vectorized first-match-wins timestamp extraction.

Re-expresses the reference's 6-pattern table scan
(timestamp_patterns + try_timestamp + get_timestamp,
logsender.py:332-365) as progressive narrowing over a string column:

  for each (regex, fmt) in priority order:
      rows still unresolved -> anchored RE2 capture (pc.extract_regex)
      -> whitespace-run collapse (CPython strptime treats format
         whitespace as \\s+) -> vectorized strptime (pd.to_datetime,
         exact full-string match) -> resolved rows leave the pending set

Pattern order is semantic (the greedy syslog fallback at
logsender.py:341 matches almost anything); most real lines resolve at
pattern 1 or 2, so later (slower, %A/%B named) patterns only ever see
the residue.  The year-1900 patch (logsender.py:354-356) is applied
vectorized via component reassembly, exactly mirroring
``datetime.replace(year=...)`` (including rejecting Feb 29, which 1900
already rejects at parse time).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# (anchored RE2 capture, strptime format, has_explicit_year)
# The pairs are the parse spec of logsender.py:332-346.
PATTERNS: list[tuple[str, str, bool]] = [
    (r"^(?P<g>\S+)", "%Y-%m-%dT%H:%M:%S.%fZ", True),
    (r"^(?P<g>\S+ \S+)", "%Y-%m-%d %H:%M:%S.%f", True),
    (r"^(?P<g>\S+ [0-9]{2}\s[0-9:.]{14})", "%b %d %H:%M:%S.%f", False),
    (r"^(?P<g>\S+ \S+ \S+)", "%b %d %H:%M:%S", False),
    (r"^(?P<g>[0-9-T:]{19})", "%Y-%m-%dT%H:%M:%S", True),
    (r"^(?P<g>\S+ [0-9]{2} \S+ [0-9: ]{14})", "%A %d %B %Y %H:%M:%S", False),
]


def _replace_year(parsed: pd.Series, year: int) -> pd.Series:
    """Vectorized datetime.replace(year=...) for rows parsed as 1900."""
    mask = parsed.notna() & (parsed.dt.year == 1900)
    if not mask.any():
        return parsed
    sub = parsed[mask]
    rebuilt = pd.to_datetime(
        {
            "year": np.full(len(sub), year),
            "month": sub.dt.month,
            "day": sub.dt.day,
            "hour": sub.dt.hour,
            "minute": sub.dt.minute,
            "second": sub.dt.second,
            "microsecond": sub.dt.microsecond,
        },
        errors="coerce",
    )
    rebuilt.index = sub.index
    out = parsed.copy()
    out[mask] = rebuilt
    return out


def extract_timestamps(lines: pa.Array | pa.ChunkedArray, today_year: int) -> pa.Array:
    """Extract per-line timestamps; null where no pattern matches.

    Returns timestamp[us] (naive UTC, matching the reference's naive
    datetimes and DuckDB's default).
    """
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    n = len(lines)
    out = np.full(n, np.datetime64("NaT"), dtype="datetime64[ns]")
    pending_idx = np.arange(n)
    cur = lines
    for regex, fmt, has_year in PATTERNS:
        if len(pending_idx) == 0:
            break
        hit = pc.extract_regex(cur, pattern=regex)  # RE2, vectorized
        cap = pc.struct_field(hit, "g")
        # CPython strptime compiles format whitespace to \s+; collapse
        # runs so e.g. the double-space ansible lines still parse.
        cap = pc.replace_substring_regex(cap, pattern=r"\s+", replacement=" ")
        cap_pd = cap.to_pandas().astype(object)
        parsed = pd.to_datetime(cap_pd, format=fmt, errors="coerce", exact=True)
        if not has_year:
            parsed = _replace_year(parsed, today_year)
        hitmask = parsed.notna().to_numpy()
        if hitmask.any():
            out[pending_idx[hitmask]] = parsed.to_numpy()[hitmask]
            keep = ~hitmask
            pending_idx = pending_idx[keep]
            cur = cur.filter(pa.array(keep))
    return pa.Array.from_pandas(
        pd.Series(out), type=pa.timestamp("us"))
