"""Row-at-a-time reference semantics (conformance oracle for tests ONLY).

A fresh, deterministic re-statement of the reference pipeline's per-record
behavior, used by the test suite to golden-check the vectorized Ray Data
stages.  Never imported by the engine itself.  Citations are into
/root/reference/logscraper/.

Determinism deviations from the reference (both injected as parameters):
  * ``today_year`` replaces ``datetime.date.today().year`` (logsender.py:354-356)
  * ``fallback_now`` replaces ``datetime.datetime.utcnow()`` (logsender.py:408)
"""

from __future__ import annotations

import datetime
import json
import re
from typing import Iterable, Iterator, Optional

from .config import SEVERITIES, SEVERITY_NONE, SOURCE_TAGS

# ---------------------------------------------------------------------------
# Timestamp extraction: the 6 (regex, strptime-format) pairs, first match
# wins, whole-capture strptime, year-1900 patch.  Spec: logsender.py:332-365.
# The pairs themselves are data (the parse spec), not code.
# ---------------------------------------------------------------------------
TIMESTAMP_PATTERNS: list[tuple[re.Pattern, str]] = [
    # 2022-03-25T17:40:37.220547Z
    (re.compile(r"(\S+)"), "%Y-%m-%dT%H:%M:%S.%fZ"),
    # 2022-02-28 09:44:58.839036
    (re.compile(r"(\S+ \S+)"), "%Y-%m-%d %H:%M:%S.%f"),
    # Mar 31 04:50:23.795709 (capture truncated at 14 chars of [0-9:.])
    (re.compile(r"(\S+ [0-9]{2}\s[0-9:.]{14})"), "%b %d %H:%M:%S.%f"),
    # Mar 25 17:40:37  (year-less syslog)
    (re.compile(r"(\S+ \S+ \S+)"), "%b %d %H:%M:%S"),
    # 2022-03-23T11:46:49+0000 -> first 19 chars
    (re.compile(r"([0-9-T:]{19})"), "%Y-%m-%dT%H:%M:%S"),
    # Friday 25 February 2022 09:27:51 +0000 (ansible)
    (re.compile(r"(\S+ [0-9]{2} \S+ [0-9: ]{14})"), "%A %d %B %Y %H:%M:%S"),
]


def get_timestamp(line: str, today_year: int) -> Optional[datetime.datetime]:
    """First-match-wins timestamp extraction (logsender.py:349-365)."""
    for regex, fmt in TIMESTAMP_PATTERNS:
        try:
            match = regex.match(line)
            if not match:
                continue
            date = datetime.datetime.strptime(match.groups()[0], fmt)
            if date.year == 1900:
                date = date.replace(year=today_year)
            return date
        except ValueError:
            continue
    return None


def get_message(line: str) -> str:
    """Split-once-on-pipe message extraction (logsender.py:368-372).

    Note the asymmetry: the pipe branch lstrips, the fallback does not.
    """
    parts = line.split("|", 1)
    if len(parts) == 2:
        return parts[1].replace("\n", "").lstrip()
    return line.replace("\n", "")


_SEVERITY_RE = re.compile(r"\b(%s)\b" % "|".join(SEVERITIES))


def get_severity(line: str) -> str:
    """First severity keyword in the line, else NONE.

    Models the grok loglevel capture (openstack-filters.conf:48) as a
    line-wide first-occurrence search over the loglevel vocabulary.
    """
    m = _SEVERITY_RE.search(line)
    return m.group(1) if m else SEVERITY_NONE


# ---------------------------------------------------------------------------
# Per-file log-line processing: banner skip, DEBUG skip, carry-forward,
# empty-message drop.  Spec: logline_iter (logsender.py:394-413) +
# doc_iter (logsender.py:416-428) + grok drop rules
# (openstack-filters.conf:5-11, 81-83).
# ---------------------------------------------------------------------------
def process_logfile(
    lines: Iterable[str],
    source: str,
    *,
    skip_debug: bool,
    drop_debug_severity: bool,
    fallback_now: datetime.datetime,
    today_year: int,
) -> Iterator[tuple[int, datetime.datetime, str, str]]:
    """Yield (line_index, timestamp, severity, message) for kept lines."""
    tags = SOURCE_TAGS.get(source, [])
    is_screen = "screen" in tags
    is_console = "console" in tags or "console.html" in tags
    last_known: Optional[datetime.datetime] = None
    for i, line in enumerate(lines):
        # journald banner skipped only before any known timestamp
        # (logsender.py:399-400)
        if last_known is None and line.startswith("-- Logs begin at "):
            continue
        # substring DEBUG skip (logsender.py:400-402)
        if skip_debug and "DEBUG" in line:
            continue
        # grok drops (openstack-filters.conf:5-11)
        if is_screen and line.startswith("+ "):
            continue
        if is_console and line.rstrip("\n") in ("<pre>", "</pre>"):
            continue
        ts = get_timestamp(line, today_year)
        if ts is not None:
            last_known = ts
        elif last_known is None:
            ts = fallback_now
        else:
            ts = last_known
        severity = get_severity(line)
        if drop_debug_severity and severity == "DEBUG":
            continue
        message = get_message(line)
        if not message:  # empty-message drop (logsender.py:421-424)
            continue
        yield i, ts, severity, message


# ---------------------------------------------------------------------------
# performance.json flattening.  Spec: makeJsonFields (logsender.py:288-329)
# and json_iter's report-timestamp extraction (logsender.py:384-391).
# ---------------------------------------------------------------------------
INT64_MAX = 9223372036854775807


def flatten_perf_json(content: str) -> dict[str, object]:
    data = json.loads(content)
    fields: dict[str, object] = {"hostname": data["report"]["hostname"]}
    for service in data.get("services", []):
        mem = service.get("MemoryCurrent", 0)
        # bools are ints in Python; the reference's isinstance check admits
        # them -- mirror by using the same check (logsender.py:297-298)
        if not isinstance(mem, int) or mem > INT64_MAX:
            mem = 0
        fields["service_%s_memorycurrent" % service.get("service")] = mem
    for db in data.get("db", []):
        count = db.get("count", 0)
        if not isinstance(count, int):
            continue  # key skipped entirely (logsender.py:308-311)
        fields["db_%s_%s" % (db.get("db"), db.get("op").lower())] = count
    for api_call in data.get("api", []):
        name = api_call.get("service")
        for api_type, count in api_call.items():
            if api_type in ("service", "log"):
                continue
            if not isinstance(count, int):
                continue
            fields["api_%s_%s" % (name, api_type.lower())] = count
    return fields


def perf_timestamp(
    content: str, today_year: int, fallback_now: datetime.datetime
) -> datetime.datetime:
    """Report timestamp of a performance.json payload (logsender.py:384-391)."""
    data = json.loads(content)
    ts = None
    if "report" in data and "timestamp" in data["report"]:
        ts = get_timestamp(data["report"]["timestamp"], today_year)
    return ts if ts is not None else fallback_now


# ---------------------------------------------------------------------------
# Subunit per-test normalization.  Spec: subunit_iter (logsender.py:447-464).
# Input here is the pre-parsed test-case record (binary subunit parsing
# needs subunit2sql -- out of scope; rows arrive pre-split).
# ---------------------------------------------------------------------------
def subunit_duration(
    start: datetime.datetime, end: datetime.datetime
) -> float:
    """The reference's quirky seconds.microseconds string-concat float
    (logsender.py:453-455): 1 s + 50 us -> float("1.50") == 1.5."""
    delta = end - start
    return float("%d.%d" % (delta.seconds, delta.microseconds))


def subunit_timestamp_str(start: datetime.datetime) -> str:
    return start.strftime("%Y-%m-%dT%H:%M:%SZ")


# ---------------------------------------------------------------------------
# Routing.  Spec: send_to_es (logsender.py:467-490) + broken-file and
# empty-file skips (logsender.py:527-538).
# ---------------------------------------------------------------------------
def route_sink(
    filename: str, index: str, perf_index: Optional[str], subunit_index: Optional[str]
) -> Optional[str]:
    if filename.endswith("testrepository.subunit.gz"):
        return None  # broken-file skip (logsender.py:527-530)
    if filename.endswith("performance.json") and perf_index:
        return perf_index
    if filename.endswith(".subunit"):
        return subunit_index
    return index


# ---------------------------------------------------------------------------
# Enrichment-record building.  Spec: makeZuulCapability + makeFields +
# get_hosts_id (logsender.py:201-285).
# ---------------------------------------------------------------------------
def get_hosts_id(build_inventory: dict) -> tuple[list, list]:
    hosts_id: list = []
    hosts_region: list = []
    if "all" not in build_inventory:
        return hosts_id, hosts_region
    for _, host_info in build_inventory["all"]["hosts"].items():
        nodepool = host_info.get("nodepool", {})
        if "host_id" in nodepool:
            hosts_id.append(nodepool["host_id"])
            hosts_region.append("%s-%s" % (nodepool["cloud"], nodepool["region"]))
    return hosts_id, sorted(set(hosts_region))


def make_fields(build_inventory: dict, buildinfo: dict) -> dict:
    """Build the ~20 enrichment fields for one build (logsender.py:252-285),
    normalizing old/new Zuul schema drift (logsender.py:220-249).

    Deviation: hosts_region is sorted (the reference's ``list(set(...))``
    order is hash-dependent -- logsender.py:212).
    """
    build_details = dict(
        build_inventory["all"]["vars"]["zuul"] if "all" in build_inventory else {}
    )
    buildinfo = dict(buildinfo)

    # --- makeZuulCapability (logsender.py:220-249)
    if isinstance(build_details.get("project"), dict):
        project = build_details["project"].get("name")
    else:
        project = buildinfo.get("project")
    build_details["project"] = project
    ref = buildinfo.get("ref")
    if isinstance(ref, dict):
        ref = ref.get("ref")
    buildinfo["ref"] = ref
    for key in ("branch", "change", "patchset"):
        if not build_details.get(key):
            build_details[key] = buildinfo.get(key)
    if isinstance(buildinfo.get("buildset"), dict):
        build_details["buildset"] = buildinfo["buildset"].get("uuid")
    if not build_details.get("change_url"):
        build_details["change_url"] = buildinfo.get("ref_url")

    # --- makeFields (logsender.py:264-285)
    fields: dict = {}
    fields["build_node"] = "zuul-executor"
    fields["build_name"] = buildinfo.get("job_name")
    fields["build_status"] = buildinfo["result"]
    fields["project"] = build_details.get("project")
    fields["voting"] = int(build_details.get("voting", 2))
    fields["build_set"] = str(build_details.get("buildset", "NONE"))
    fields["build_queue"] = build_details.get("pipeline", "NONE")
    fields["build_ref"] = buildinfo.get("ref")
    fields["build_branch"] = build_details.get("branch")
    change = build_details.get("change")
    fields["build_change"] = int(change) if change else ""
    fields["build_patchset"] = build_details.get("patchset")
    fields["build_newrev"] = build_details.get("newrev", "")
    fields["build_uuid"] = str(buildinfo.get("uuid"))
    fields["node_provider"] = "local"
    fields["log_url"] = buildinfo.get("log_url")
    fields["tenant"] = buildinfo.get("tenant")
    fields["hosts_id"], fields["hosts_region"] = get_hosts_id(build_inventory)
    executor = build_details.get("executor")
    if isinstance(executor, dict) and "hostname" in executor:
        fields["zuul_executor"] = executor["hostname"]
    fields["change_url"] = build_details.get("change_url", "")
    return fields


def expected_routed_rows(token_table, cfg) -> list[dict]:
    """Run the WHOLE reference pipeline row-at-a-time over a
    (doc_id, tokens, n_tok, source) Arrow table: the end-to-end oracle
    for routed-row set equality and per-sink count equality.

    Returns one dict per surviving document:
    {doc_id, sink, severity, ts, message}.
    """
    from .config import LOGLINE_SOURCES

    # group rows per (build, file) preserving line order
    files: dict[tuple[str, str], list[tuple[int, str, str]]] = {}
    order: list[tuple[str, str]] = []
    doc_ids = token_table["doc_id"].to_pylist()
    sources = token_table["source"].to_pylist()
    tokens = token_table["tokens"].to_pylist()
    for doc_id, source, toks in zip(doc_ids, sources, tokens):
        build, rest = doc_id.split("/", 1)
        fname, line_no = rest.rsplit("/", 1)
        key = (build, fname)
        if key not in files:
            files[key] = []
            order.append(key)
        files[key].append((int(line_no), source, bytes(toks).decode("utf-8")))

    index = cfg.index_name()
    perf_index = cfg.perf_index_name()
    subunit_index = cfg.subunit_index_name()
    out: list[dict] = []
    for build, fname in order:
        rows = sorted(files[(build, fname)])
        source = rows[0][1]
        sink = route_sink(fname, index, perf_index, subunit_index)
        if sink is None:
            continue
        if source in LOGLINE_SOURCES:
            lines = [line for _, _, line in rows]
            for i, ts, severity, message in process_logfile(
                lines, source,
                skip_debug=cfg.skip_debug,
                drop_debug_severity=cfg.drop_debug_severity,
                fallback_now=cfg.fallback_now,
                today_year=cfg.today_year,
            ):
                out.append({
                    "doc_id": f"{build}/{fname}/{rows[i][0]:06d}",
                    "sink": sink, "severity": severity,
                    "ts": ts, "message": message})
        elif source == "performance":
            for line_no, _, line in rows:
                ts = perf_timestamp(line, cfg.today_year, cfg.fallback_now)
                message = get_message(line)
                if not message:
                    continue
                out.append({
                    "doc_id": f"{build}/{fname}/{line_no:06d}",
                    "sink": sink, "severity": "NONE",
                    "ts": ts, "message": message})
        elif source == "subunit":
            import json as _json

            for line_no, _, line in rows:
                rec = _json.loads(line)
                start = datetime.datetime.fromisoformat(rec["start"])
                out.append({
                    "doc_id": f"{build}/{fname}/{line_no:06d}",
                    "sink": sink, "severity": "NONE",
                    "ts": start.replace(microsecond=0),
                    "message": None})
    return out


def get_file_info(
    file_config: list[dict], build_file: str
) -> tuple[str, list[str]]:
    """filename -> (config name, tags + [basename]) endswith lookup
    (logsender.py:375-381)."""
    import os

    for entry in file_config:
        base = os.path.basename(entry["name"])
        if build_file.endswith(base):
            return entry["name"], list(entry.get("tags", [])) + [base]
    base = os.path.basename(build_file)
    return base, [base]


# ---------------------------------------------------------------------------
# Logstash multiline filter simulator (openstack-filters.conf:12-43):
# sequential, buffer-per-stream, what=previous.  Used to golden-check the
# vectorized segment-local join in stages/grok.py.
# ---------------------------------------------------------------------------
_ML_ISO = (r"\d{4}-\d{2}-\d{2}[T ]\d{2}:?\d{2}"
           r"(?::?\d{2}(?:[.,]\d+)?)?(?:Z|[+-]\d{2}:?\d{2})?")
_ML_SYSLOG = (r"(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|"
              r"Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|"
              r"Nov(?:ember)?|Dec(?:ember)?) +\d{1,2} \d{2}:\d{2}:\d{2}")
_ML_CONSOLE_RE = re.compile(rf"(?:{_ML_ISO}) \|")
_ML_OSLO_TS_RE = re.compile(rf"(?:{_ML_ISO}|{_ML_SYSLOG}) ")
_ML_OSLO_CONT_RE = re.compile(
    rf"(?:{_ML_ISO}|{_ML_SYSLOG})\s+[+-]?\d+(?:\.\d+)?\s+(?:TRACE|ERROR)")


def multiline_events(lines: list[str], family: str) -> list[tuple[int, str]]:
    """One file's lines -> [(anchor_line_index, joined_message)].

    Restates the conf's filters sequentially:
      * console (conf:12-23): negate=true what=previous on
        ``^TIMESTAMP_ISO8601 \\|`` -- a non-matching line joins the
        previous event;
      * oslofmt (conf:24-43): two stacked filters; composed row rule is
        "starts a new event iff it begins with a timestamp AND is not a
        ``TS  PID (TRACE|ERROR)`` trace continuation";
      * any other family: no multiline filter, every line is its own event.
    A leading continuation run (no previous event in the stream) becomes
    its own event, like logstash's first buffered flush.
    """
    events: list[tuple[int, str]] = []
    buf_start: Optional[int] = None
    buf: list[str] = []
    for i, line in enumerate(lines):
        if family in ("console", "console.html"):
            starts = _ML_CONSOLE_RE.match(line) is not None
        elif family == "oslofmt":
            starts = (_ML_OSLO_TS_RE.match(line) is not None
                      and _ML_OSLO_CONT_RE.match(line) is None)
        else:
            starts = True
        if starts or buf_start is None:
            if buf:
                events.append((buf_start, "\n".join(buf)))
            buf_start, buf = i, [line]
        else:
            buf.append(line)
    if buf:
        events.append((buf_start, "\n".join(buf)))
    return events
