"""Grok-side semantics of the reference's logstash/opensearch filter
chain (openstack-filters.conf): multiline event joining and structured
field extraction.

The reference splits responsibilities: logsender ships one doc per
line; the logstash filter config then (a) JOINS continuation lines
into their anchor event (multiline, openstack-filters.conf:12-43) and
(b) extracts ``logdate / loglevel / module / pid / syslog_program /
syslog_pid / logmessage`` via grok (conf:44-77).  Both are re-expressed
here as vectorized Arrow kernels:

* ``anchor_mask`` -- which lines START a new event, per family:
  - console (conf:12-23): an event starts at ``^TIMESTAMP_ISO8601 |``
    (negate=true, what=previous -- every non-matching line joins the
    previous event);
  - oslofmt (conf:24-43): two stacked multiline filters; the row-level
    equivalent is "starts with a timestamp AND is not a
    ``TS  PID (TRACE|ERROR)`` continuation" (the NUMBER requirement is
    what keeps plain ERROR messages from folding -- conf:35-39).
* ``multiline_join_*`` -- segment-local vectorized join (same
  contiguity contract as the timestamp carry-forward) and a
  bucketed-shuffle variant for arbitrary layouts.
* ``extract_grok_fields`` -- per-family RE2 re-expressions of the grok
  patterns (the regexes are the parse SPEC restated, not copied code;
  grok's Oniguruma ``(?m)`` means dot-matches-newline, hence ``(?s)``
  here so logmessage spans joined lines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# --- grok pattern building blocks, RE2 form ------------------------------
_TS_ISO = r"\d{4}-\d{2}-\d{2}[T ]\d{2}:?\d{2}(?::?\d{2}(?:[.,]\d+)?)?(?:Z|[+-]\d{2}:?\d{2})?"
_MONTH = (r"(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|"
          r"Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|"
          r"Nov(?:ember)?|Dec(?:ember)?)")
_TS_SYSLOG = rf"{_MONTH} +\d{{1,2}} \d{{2}}:\d{{2}}:\d{{2}}"
_NUMBER = r"[+-]?\d+(?:\.\d+)?"
_LOGLEVEL = (r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|"
             r"NOTICE|[Ii]nfo|INFO|[Ww]arn?(?:ing)?|WARN?(?:ING)?|"
             r"[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|"
             r"[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|"
             r"[Ee]merg(?:ency)?)")
_DAY = r"(?:Mon|Tue|Wed|Thu|Fri|Sat|Sun)(?:day|sday|nesday|rsday|urday)?"

# multiline anchor patterns (conf:15, :27, :40)
CONSOLE_ANCHOR = rf"^{_TS_ISO} \|"
OSLOFMT_TS = rf"^(?:{_TS_ISO}|{_TS_SYSLOG}) "
OSLOFMT_TRACE_CONT = (rf"^(?:{_TS_ISO}|{_TS_SYSLOG})\s+{_NUMBER}"
                      rf"\s+(?:TRACE|ERROR)")

# per-family grok field patterns (conf:21, :47, :60, :66, :73)
GROK_PATTERNS: dict[str, str] = {
    "console": rf"(?s)^(?P<logdate>{_TS_ISO}) \| (?P<logmessage>.*)$",
    "oslofmt": (
        rf"(?s)^(?P<logdate>{_TS_ISO}|{_TS_SYSLOG})\s*"
        rf"(?:(?P<syslog_program>.*?)(?:\[(?P<syslog_pid>[1-9]\d*)\])?:|"
        rf"(?P<pid>{_NUMBER}))?\s?"
        rf"(?P<loglevel>AUDIT|CRITICAL|DEBUG|INFO|TRACE|WARNING|ERROR) "
        rf"\[?\b(?P<module>\S+?)\]?(?:\s(?P<logmessage>.*))?$"),
    "apacheerror": (
        rf"(?s)\[(?P<logdate>{_DAY} {_MONTH} \d{{1,2}} "
        rf"\d{{2}}:\d{{2}}:\d{{2}}(?:\.\d+)? \d{{4}}\s*"
        rf"(?:[A-Z]{{1,4}}|[+-]\d{{4}})?)\]\s*"
        rf"\[(?P<loglevel>{_LOGLEVEL})\]\s*(?P<logmessage>.*)$"),
    "libvirt": (
        rf"(?s)^(?P<logdate>{_TS_ISO}):\s*(?P<pid>{_NUMBER}):\s*"
        rf"(?P<loglevel>{_LOGLEVEL})\s*:\s*(?P<logmessage>.*)$"),
    "syslog": (
        rf"(?s)^(?P<logdate>{_TS_SYSLOG})\s*"
        rf"(?P<syslog_host>[\w.:-]+)?\s*"
        rf"(?P<syslog_program>.*?)(?:\[(?P<syslog_pid>[1-9]\d*)\])?:? "
        rf"(?P<logmessage>.*)$"),
    # %{COMBINEDAPACHELOG} (openstack-filters.conf:51-56): the conf maps
    # logdate = %{timestamp} (HTTPDATE) and composes
    # logmessage = "%{verb} %{request} %{response}" via add_field --
    # the composition happens in extract_grok_fields below.  A quoted
    # request without the "VERB path [HTTP/v]" shape falls to the
    # rawrequest branch (verb/request stay null, exactly like grok).
    "apachecombined": (
        rf"^(?P<clientip>\S+) (?P<ident>\S+) (?P<auth>\S+) "
        rf"\[(?P<logdate>\d{{1,2}}/{_MONTH}/\d{{4}}:"
        rf"\d{{2}}:\d{{2}}:\d{{2}}(?:\.\d+)? [+-]?\d+)\] "
        rf"\"(?:(?P<verb>\w+) (?P<request>\S+)"
        rf"(?: HTTP/(?P<httpversion>[\d.]+))?|(?P<rawrequest>[^\"]*))\" "
        rf"(?P<response>\d+) (?:(?P<bytes>\d+)|-) "
        rf"\"(?P<referrer>[^\"]*)\" \"(?P<agent>[^\"]*)\"\s*$"),
}

GROK_FIELDS = ("logdate", "syslog_program", "syslog_pid", "pid",
               "loglevel", "module", "logmessage", "syslog_host")

# extra columns only the apachecombined family produces
APACHE_FIELDS = ("clientip", "ident", "auth", "verb", "request",
                 "httpversion", "rawrequest", "response", "bytes",
                 "referrer", "agent")


def anchor_mask(lines: pa.Array | pa.ChunkedArray, family: str) -> np.ndarray:
    """True where a line STARTS a new event under the family's multiline
    rules; families without a multiline filter anchor every line."""
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    if family in ("console", "console.html"):
        m = pc.match_substring_regex(lines, CONSOLE_ANCHOR)
        return pc.fill_null(m, False).to_numpy(zero_copy_only=False)
    if family == "oslofmt":
        has_ts = pc.fill_null(
            pc.match_substring_regex(lines, OSLOFMT_TS), False)
        cont = pc.fill_null(
            pc.match_substring_regex(lines, OSLOFMT_TRACE_CONT), False)
        return pc.and_(has_ts, pc.invert(cont)).to_numpy(
            zero_copy_only=False)
    return np.ones(len(lines), dtype=bool)


def join_runs(file_ids: np.ndarray, anchors: np.ndarray,
              lines: list[str]) -> pd.DataFrame:
    """Segment-local multiline join over rows already in (file, line)
    order with files contiguous.  Event starts at an anchor OR at the
    first row of its file (logstash's what=previous: a leading
    continuation run becomes its own event)."""
    n = len(lines)
    if n == 0:
        return pd.DataFrame({"file_id": pd.Series([], dtype=object),
                             "line_idx": pd.Series([], dtype=np.int64),
                             "n_lines": pd.Series([], dtype=np.int64),
                             "message": pd.Series([], dtype=object)})
    new_file = np.empty(n, dtype=bool)
    new_file[0] = True
    new_file[1:] = file_ids[1:] != file_ids[:-1]
    start = anchors | new_file
    event = np.cumsum(start) - 1
    df = pd.DataFrame({"e": event, "file_id": file_ids, "line": lines})
    g = df.groupby("e", sort=True)
    starts = np.nonzero(start)[0]
    return pd.DataFrame({
        "file_id": file_ids[starts],
        "line_idx": starts.astype(np.int64),
        "n_lines": g["line"].size().to_numpy(dtype=np.int64),
        "message": g["line"].agg("\n".join).to_numpy(),
    })


_JOIN_BUCKETS = 64


def multiline_join(
    ds: ray.data.Dataset,
    *,
    file_col: str,
    order_col: str,
    line_col: str,
    family: str = "console",
) -> ray.data.Dataset:
    """Distributed multiline join for ARBITRARY layouts: one coarse
    bucketed shuffle on hash(file), per-bucket sort by (file, order),
    then the segment-local vectorized join.  Partitioning assumption:
    one file's lines fit in one bucket group (same contract as the
    grouped carry-forward).  Returns (file_id, anchor_ord, n_lines,
    message)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        fid = t[file_col].combine_chunks().to_numpy(zero_copy_only=False)
        b = (pd.util.hash_array(fid.astype(object))
             % _JOIN_BUCKETS).astype(np.int32)
        return t.append_column("_jb", pa.array(b))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([file_col, order_col], kind="mergesort")
        lines = g[line_col].tolist()
        fids = g[file_col].to_numpy()
        anchors = anchor_mask(pa.array(lines, type=pa.string()), family)
        out = join_runs(fids, anchors, lines)
        ords = g[order_col].to_numpy()
        return pd.DataFrame({
            "file_id": out["file_id"],
            "anchor_ord": ords[out["line_idx"].to_numpy()],
            "n_lines": out["n_lines"],
            "message": out["message"],
        })

    return ds.map_batches(
        add_bucket, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    ).groupby("_jb").map_groups(per_bucket, batch_format="pandas")


def extract_grok_fields(
    lines: pa.Array | pa.ChunkedArray, family: str
) -> dict[str, pa.Array]:
    """Vectorized grok field extraction for one family; returns the
    GROK_FIELDS columns (null where the line does not match -- logstash
    tags those docs _grokparsefailure and leaves fields unset)."""
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    n = len(lines)
    pattern = GROK_PATTERNS.get(family)
    fields = GROK_FIELDS + (APACHE_FIELDS if family == "apachecombined"
                            else ())
    out = {f: pa.nulls(n, pa.string()) for f in fields}
    if pattern is None or n == 0:
        return out
    hit = pc.extract_regex(lines, pattern=pattern)
    present = {f.name for f in hit.type} if n else set()
    for f in fields:
        if f in present:
            out[f] = pc.struct_field(hit, f)
    if family == "apachecombined":
        # conf:55 add_field: logmessage = "%{verb} %{request} %{response}"
        # (null when the rawrequest branch matched -- logstash would
        # leave the sprintf unresolved there; we surface null instead.
        # Non-participating groups extract as EMPTY STRING, the
        # established convention of the other families' oracles.)
        joined = pc.binary_join_element_wise(
            out["verb"], out["request"], out["response"], " ")
        out["logmessage"] = pc.if_else(
            pc.equal(out["verb"], ""), pa.nulls(n, pa.string()), joined)
    return out


def grok_parse_failure(lines: pa.Array | pa.ChunkedArray,
                       family: str) -> pa.Array:
    """True where grok would tag _grokparsefailure (no match)."""
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    pattern = GROK_PATTERNS.get(family)
    if pattern is None:
        return pa.array(np.zeros(len(lines), dtype=bool))
    return pc.invert(pc.fill_null(
        pc.match_substring_regex(lines, pattern), False))
