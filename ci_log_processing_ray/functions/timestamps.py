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

# CPython-TimeRE-equivalent component regexes: pandas' strptime is
# LENIENT where CPython's is not (e.g. '%f' accepts an EMPTY fraction
# after the dot), so each capture is validated with the exact grammar
# datetime.strptime would accept before pandas parses it.  Seconds cap
# at 59 because datetime.strptime (unlike time.strptime) rejects 60/61.
_Y = r"\d{4}"
_MO = r"(?:1[0-2]|0[1-9]|[1-9])"
_D = r"(?:3[01]|[12]\d|0[1-9]|[1-9])"
_H = r"(?:2[0-3]|[01]\d|\d)"
_MS = r"(?:[0-5]\d|\d)"
_F = r"[0-9]{1,6}"
_B3 = r"(?i:jan|feb|mar|apr|may|jun|jul|aug|sep|oct|nov|dec)"
_BFULL = (r"(?i:january|february|march|april|may|june|july|august|"
          r"september|october|november|december)")
_AFULL = (r"(?i:monday|tuesday|wednesday|thursday|friday|saturday|sunday)")

# (anchored RE2 capture, strptime format, has_explicit_year, validator)
# The pairs are the parse spec of logsender.py:332-346; validators run
# AFTER whitespace-run collapse, so single spaces stand for \s+.
PATTERNS: list[tuple[str, str, bool, str]] = [
    (r"^(?P<g>\S+)", "%Y-%m-%dT%H:%M:%S.%fZ", True,
     rf"^{_Y}-{_MO}-{_D}T{_H}:{_MS}:{_MS}\.{_F}Z$"),
    (r"^(?P<g>\S+ \S+)", "%Y-%m-%d %H:%M:%S.%f", True,
     rf"^{_Y}-{_MO}-{_D} {_H}:{_MS}:{_MS}\.{_F}$"),
    (r"^(?P<g>\S+ [0-9]{2}\s[0-9:.]{14})", "%b %d %H:%M:%S.%f", False,
     rf"^{_B3} {_D} {_H}:{_MS}:{_MS}\.{_F}$"),
    (r"^(?P<g>\S+ \S+ \S+)", "%b %d %H:%M:%S", False,
     rf"^{_B3} {_D} {_H}:{_MS}:{_MS}$"),
    (r"^(?P<g>[0-9-T:]{19})", "%Y-%m-%dT%H:%M:%S", True,
     rf"^{_Y}-{_MO}-{_D}T{_H}:{_MS}:{_MS}$"),
    (r"^(?P<g>\S+ [0-9]{2} \S+ [0-9: ]{14})", "%A %d %B %Y %H:%M:%S", False,
     rf"^{_AFULL} {_D} {_BFULL} {_Y} {_H}:{_MS}:{_MS}$"),
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


_A3 = r"(?i:mon|tue|wed|thu|fri|sat|sun)"

# The logstash date block (openstack-filters.conf:86-102) accepts 13
# Joda formats on the grok-extracted ``logdate``; re-expressed as
# (strptime fmt | "ISO8601", full-string validator AFTER whitespace-run
# collapse, has_tz).  Order preserved from the conf; "MMM  d" and
# "MMM dd" collapse to one row post-collapse (same fmt, same result).
# Joda parses-but-ignores the E day-of-week token, matching CPython %a
# (no cross-validation against the date).
LOGSTASH_DATE_FORMATS: list[tuple[str, str | None, bool]] = [
    ("%Y-%m-%d %H:%M:%S.%f",                                # .SSS
     rf"^{_Y}-{_MO}-{_D} {_H}:{_MS}:{_MS}\.\d{{3}}$", False),
    ("%Y-%m-%d %H:%M:%S.%f",                                # .SSSSSS
     rf"^{_Y}-{_MO}-{_D} {_H}:{_MS}:{_MS}\.\d{{6}}$", False),
    ("%Y-%m-%d %H:%M:%S,%f",                                # ,SSS
     rf"^{_Y}-{_MO}-{_D} {_H}:{_MS}:{_MS},\d{{3}}$", False),
    ("%Y-%m-%d %H:%M:%S",
     rf"^{_Y}-{_MO}-{_D} {_H}:{_MS}:{_MS}$", False),
    ("%b %d %H:%M:%S",                                      # MMM [ d|dd]
     rf"^{_B3} {_D} {_H}:{_MS}:{_MS}$", False),
    ("%b %d %H:%M:%S.%f",                                   # MMM dd ... .SSSSSS
     rf"^{_B3} {_D} {_H}:{_MS}:{_MS}\.\d{{6}}$", False),
    ("%d/%b/%Y:%H:%M:%S %z",                                # dd/MMM/yyyy:HH:mm:ss Z
     rf"^{_D}/{_B3}/{_Y}:{_H}:{_MS}:{_MS} [+-]\d{{4}}$", True),
    ("%Y-%m-%d %H:%M:%S.%f%z",                              # .SSSZ
     rf"^{_Y}-{_MO}-{_D} {_H}:{_MS}:{_MS}\.\d{{3}}[+-]\d{{4}}$", True),
    ("%a %b %d %H:%M:%S %Y %z",                             # E MMM dd ... yyyy Z
     rf"^{_A3} {_B3} {_D} {_H}:{_MS}:{_MS} {_Y} [+-]\d{{4}}$", True),
    ("%a %b %d %H:%M:%S %Y",                                # E MMM dd ... yyyy
     rf"^{_A3} {_B3} {_D} {_H}:{_MS}:{_MS} {_Y}$", False),
    ("ISO8601", None, True),                                # catch-all
]


def normalize_logdate(
    logdate: pa.Array | pa.ChunkedArray, today_year: int
) -> pa.Array:
    """Logstash ``date``-filter normalization of grok ``logdate`` values
    (openstack-filters.conf:86-102): first matching format wins, zoned
    formats convert to UTC, zoneless ones are taken AS UTC
    (``timezone => "UTC"``), and yearless formats get ``today_year``
    (the same year-patch convention as the logsender table).  Returns
    timestamp[us] naive UTC; null where no format matches (logstash
    would tag _dateparsefailure and keep @timestamp).

    Same progressive-narrowing shape as :func:`extract_timestamps`:
    each format only ever sees the rows every earlier format rejected,
    with anchored RE2 validators standing in for Joda's exact-width
    tokens (pandas' strptime is more lenient than Joda; the validator
    enforces e.g. SSS = exactly three digits)."""
    if isinstance(logdate, pa.ChunkedArray):
        logdate = logdate.combine_chunks()
    n = len(logdate)
    out = np.full(n, np.datetime64("NaT"), dtype="datetime64[us]")
    pending_idx = np.arange(n)
    cur = pc.replace_substring_regex(
        logdate, pattern=r"\s+", replacement=" ")
    for fmt, validator, has_tz in LOGSTASH_DATE_FORMATS:
        if len(pending_idx) == 0:
            break
        if fmt == "ISO8601":
            cap_pd = cur.to_pandas().astype(object)
            parsed = pd.to_datetime(cap_pd, format="ISO8601",
                                    errors="coerce", utc=True)
            parsed = parsed.dt.tz_localize(None)
        else:
            valid = pc.fill_null(
                pc.match_substring_regex(cur, pattern=validator), False)
            cap = pc.if_else(valid, cur, pa.nulls(len(cur), pa.string()))
            cap_pd = cap.to_pandas().astype(object)
            parsed = pd.to_datetime(cap_pd, format=fmt, errors="coerce",
                                    exact=True, utc=has_tz)
            if has_tz:
                parsed = parsed.dt.tz_localize(None)
            else:
                parsed = _replace_year(parsed, today_year)
        hitmask = parsed.notna().to_numpy()
        if hitmask.any():
            out[pending_idx[hitmask]] = parsed.to_numpy()[hitmask]
            keep = ~hitmask
            pending_idx = pending_idx[keep]
            cur = cur.filter(pa.array(keep))
    return pa.Array.from_pandas(pd.Series(out), type=pa.timestamp("us"))


def extract_timestamps(lines: pa.Array | pa.ChunkedArray, today_year: int) -> pa.Array:
    """Extract per-line timestamps; null where no pattern matches.

    Returns timestamp[us] (naive UTC, matching the reference's naive
    datetimes and DuckDB's default).
    """
    import datetime as _dt

    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    n = len(lines)
    # us resolution: datetime.strptime parses years the ns range cannot
    # represent (outside ~[1677, 2262]); the slow-path residue below
    # needs them storable, and the output type is timestamp[us] anyway.
    out = np.full(n, np.datetime64("NaT"), dtype="datetime64[us]")
    pending_idx = np.arange(n)
    cur = lines
    for regex, fmt, _has_year, validator in PATTERNS:
        if len(pending_idx) == 0:
            break
        hit = pc.extract_regex(cur, pattern=regex)  # RE2, vectorized
        cap = pc.struct_field(hit, "g")
        # CPython strptime compiles format whitespace to \s+; collapse
        # runs so e.g. the double-space ansible lines still parse.
        cap = pc.replace_substring_regex(cap, pattern=r"\s+", replacement=" ")
        # null out captures CPython's strptime grammar would reject
        # (pandas is more lenient -- empty %f fractions etc.)
        valid = pc.match_substring_regex(cap, pattern=validator)
        valid_np = pc.fill_null(valid, False).to_numpy(zero_copy_only=False)
        cap = pc.if_else(pc.fill_null(valid, False), cap,
                         pa.nulls(len(cap), pa.string()))
        cap_pd = cap.to_pandas().astype(object)
        parsed = pd.to_datetime(cap_pd, format=fmt, errors="coerce", exact=True)
        # try_timestamp (logsender.py:354-356) replaces year==1900
        # UNCONDITIONALLY -- even a literal 1900 date from an explicit-%Y
        # pattern is bumped to the current year.
        parsed = _replace_year(parsed, today_year)
        hitmask = parsed.notna().to_numpy()
        if hitmask.any():
            out[pending_idx[hitmask]] = parsed.to_numpy()[hitmask]
        # slow-path residue: grammar-valid captures that pandas coerced
        # to NaT (datetime64[ns] year range) -- parse them exactly as
        # the reference does, row-wise datetime.strptime.  A handful of
        # rows per corpus at most.
        residue = valid_np & ~hitmask
        if residue.any():
            for i in np.nonzero(residue)[0]:
                try:
                    d = _dt.datetime.strptime(cap_pd.iloc[i], fmt)
                except ValueError:
                    continue
                if d.year == 1900:
                    try:
                        d = d.replace(year=today_year)
                    except ValueError:
                        continue
                out[pending_idx[i]] = np.datetime64(d.isoformat(), "us")
                hitmask[i] = True
        if hitmask.any():
            keep = ~hitmask
            pending_idx = pending_idx[keep]
            cur = cur.filter(pa.array(keep))
    return pa.Array.from_pandas(
        pd.Series(out), type=pa.timestamp("us"))
