"""Property-based parity: for ARBITRARY lines, the vectorized Arrow
kernels must agree with the row-at-a-time reference semantics
(reference_impl mirrors logsender.py exactly).  Catches regex-ordering
and edge-case drift that golden fixtures cannot."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ci_log_processing_ray import reference_impl as ref
from ci_log_processing_ray.functions.messages import (
    extract_messages,
    extract_severity,
)
from ci_log_processing_ray.functions.timestamps import extract_timestamps

# printable-ish lines, biased toward timestamp-like and pipe-y shapes
line_st = st.one_of(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=120),
    st.builds(
        lambda date, sep, frac, tail: f"{date}{sep}{frac} | {tail}",
        st.sampled_from(["2022-03-25T17:40:37", "2022-03-25 17:40:37",
                         "Mar 25 17:40:37", "Friday 25 March 2022 17:40:37",
                         "Mar 25 17:40:37.123", "not a date"]),
        st.sampled_from([".", " ", ""]),
        st.sampled_from(["123456", "999999", "0", ""]),
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                max_size=40),
    ),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(line_st, min_size=1, max_size=20))
def test_timestamps_match_reference(lines):
    got = extract_timestamps(pa.array(lines, type=pa.string()), 2022)
    for line, g in zip(lines, got.to_pylist()):
        want = ref.get_timestamp(line, 2022)
        assert g == want, (line, g, want)


@settings(max_examples=300, deadline=None)
@given(st.lists(line_st, min_size=1, max_size=20))
def test_messages_match_reference(lines):
    got = extract_messages(pa.array(lines, type=pa.string()))
    for line, g in zip(lines, got.to_pylist()):
        assert g == ref.get_message(line), line


@settings(max_examples=300, deadline=None)
@given(st.lists(line_st, min_size=1, max_size=20))
def test_severity_match_reference(lines):
    got = extract_severity(pa.array(lines, type=pa.string()))
    for line, g in zip(lines, got.to_pylist()):
        assert g == ref.get_severity(line), line
