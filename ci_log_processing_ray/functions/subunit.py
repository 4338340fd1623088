"""Subunit v2 binary stream parser (pure Python, no deps).

Implements the public subunit v2 wire format (python-subunit README,
"Version 2" packet spec) so the pipeline can ingest real
``testrepository.subunit`` files without subunit2sql -- the reference
feeds these through ``ReadSubunit(f).get_results()``
(logsender.py:431-437) and emits one doc per test
(logsender.py:447-464).

Packet layout (all multi-byte numbers big-endian)::

    PACKET := SIGNATURE(0xB3) FLAGS(2) LENGTH
              TIMESTAMP? TESTID? TAGS? MIME? FILECONTENT? ROUTECODE?
              CRC32(4)

* FLAGS: bits 12-15 version (0x2); 0x0800 test-id present; 0x0400
  route code; 0x0200 timestamp; 0x0100 runnable; 0x0080 tags; 0x0040
  file content; 0x0020 mime type; 0x0010 eof; bits 0-2 test status.
* LENGTH and every other number use the variable-length encoding:
  the top two bits of the first byte give the total byte count
  (00 -> 1, 01 -> 2, 10 -> 3, 11 -> 4); remaining bits are the value.
* TIMESTAMP := 4-byte unsigned seconds-since-epoch + number of
  nanoseconds; strings are ``number of bytes + utf-8 bytes``.

The per-test aggregation mirrors what subunit2sql's ReadSubunit gets
from testtools' StreamToDict: grouped by test id, ``start_time`` is
the first event's timestamp, ``end_time`` the last event's, ``status``
the last definitive status, and tests whose only event is
``exists`` (enumeration) are dropped; bracketed attr tags are stripped
from the id (subunit2sql cleanup_test_name with strip_tags=True).
"""

from __future__ import annotations

import datetime
import re
import zlib

STATUS_NAMES = [
    "undefined", "exists", "inprogress", "success",
    "uxsuccess", "skip", "fail", "xfail",
]
_TERMINAL = {"success", "uxsuccess", "skip", "fail", "xfail"}
_ATTR_RE = re.compile(r"\[.*\]$")

SIGNATURE = 0xB3

FLAG_TEST_ID = 0x0800
FLAG_ROUTE_CODE = 0x0400
FLAG_TIMESTAMP = 0x0200
FLAG_RUNNABLE = 0x0100
FLAG_TAGS = 0x0080
FLAG_FILE_CONTENT = 0x0040
FLAG_MIME_TYPE = 0x0020
FLAG_EOF = 0x0010


class SubunitError(ValueError):
    pass


def _read_number(buf: bytes, pos: int) -> tuple[int, int]:
    if pos >= len(buf):
        raise SubunitError("truncated subunit packet")
    first = buf[pos]
    n_bytes = (first >> 6) + 1
    if pos + n_bytes > len(buf):
        raise SubunitError("truncated subunit packet")
    value = first & 0x3F
    for i in range(1, n_bytes):
        value = (value << 8) | buf[pos + i]
    return value, pos + n_bytes


def _read_utf8(buf: bytes, pos: int) -> tuple[str, int]:
    length, pos = _read_number(buf, pos)
    return buf[pos:pos + length].decode("utf-8"), pos + length


def iter_packets(buf: bytes):
    """Yield one event dict per well-formed packet.

    Raises SubunitError("Non subunit content") on a stream that does
    not start with the signature byte -- the sentinel string the
    reference's subunit_iter looks for (logsender.py:438-441).
    """
    pos = 0
    n = len(buf)
    if n and buf[0] != SIGNATURE:
        raise SubunitError("Non subunit content")
    while pos < n:
        start = pos
        if buf[pos] != SIGNATURE:
            raise SubunitError("Non subunit content")
        if pos + 3 > n:
            raise SubunitError("truncated subunit packet")
        flags = int.from_bytes(buf[pos + 1:pos + 3], "big")
        version = flags >> 12
        if version != 0x2:
            raise SubunitError(f"unknown subunit packet version {version}")
        length, pos = _read_number(buf, pos + 3)
        if length > 4 * 1024 * 1024 or start + length > n:
            raise SubunitError("truncated subunit packet")
        event: dict = {"status": STATUS_NAMES[flags & 0x7],
                       "timestamp": None, "test_id": None, "tags": None,
                       "mime_type": None, "file_name": None,
                       "file_bytes": None, "route_code": None,
                       "eof": bool(flags & FLAG_EOF),
                       "runnable": bool(flags & FLAG_RUNNABLE)}
        if flags & FLAG_TIMESTAMP:
            seconds = int.from_bytes(buf[pos:pos + 4], "big")
            nanos, pos2 = _read_number(buf, pos + 4)
            pos = pos2
            event["timestamp"] = datetime.datetime.fromtimestamp(
                seconds, tz=datetime.timezone.utc
            ).replace(tzinfo=None) + datetime.timedelta(
                microseconds=nanos // 1000)
        if flags & FLAG_TEST_ID:
            event["test_id"], pos = _read_utf8(buf, pos)
        if flags & FLAG_TAGS:
            n_tags, pos = _read_number(buf, pos)
            tags = []
            for _ in range(n_tags):
                tag, pos = _read_utf8(buf, pos)
                tags.append(tag)
            event["tags"] = tags
        if flags & FLAG_MIME_TYPE:
            event["mime_type"], pos = _read_utf8(buf, pos)
        if flags & FLAG_FILE_CONTENT:
            event["file_name"], pos = _read_utf8(buf, pos)
            blen, pos = _read_number(buf, pos)
            event["file_bytes"] = buf[pos:pos + blen]
            pos += blen
        if flags & FLAG_ROUTE_CODE:
            event["route_code"], pos = _read_utf8(buf, pos)
        crc_expected = int.from_bytes(buf[pos:pos + 4], "big")
        crc_actual = zlib.crc32(buf[start:pos]) & 0xFFFFFFFF
        pos += 4
        if pos - start != length:
            raise SubunitError("packet length mismatch")
        if crc_expected != crc_actual:
            raise SubunitError("packet CRC mismatch")
        yield event


def cleanup_test_name(name: str) -> str:
    """subunit2sql's default id cleanup: strip trailing [attr,...] tags,
    keep scenario parentheses."""
    return _ATTR_RE.sub("", name)


def subunit_results(buf: bytes) -> dict:
    """Per-test {status, start_time, end_time}, completion-ordered --
    the shape subunit_iter consumes from ReadSubunit.get_results()
    (minus the 'run_time' key, which the reference skips anyway)."""
    first_ts: dict[str, datetime.datetime] = {}
    last_ts: dict[str, datetime.datetime] = {}
    status: dict[str, str] = {}
    results: dict[str, dict] = {}
    for ev in iter_packets(buf):
        tid = ev["test_id"]
        if tid is None:
            continue
        if ev["timestamp"] is not None:
            first_ts.setdefault(tid, ev["timestamp"])
            last_ts[tid] = ev["timestamp"]
        st = ev["status"]
        if st in _TERMINAL:
            status[tid] = st
            name = cleanup_test_name(tid)
            results[name] = {
                "status": st,
                "start_time": first_ts.get(tid),
                "end_time": last_ts.get(tid),
            }
    return results
