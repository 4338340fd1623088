"""Property-based parity: for ARBITRARY lines, the vectorized Arrow
kernels must agree with the row-at-a-time reference semantics
(reference_impl mirrors logsender.py exactly).  Catches regex-ordering
and edge-case drift that golden fixtures cannot."""

import numpy as np
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


# --------------------------------------------------------------------------
# SQL-reproducible hash kernels (r5): the vectorized implementations must
# match the scalar textbook definitions on arbitrary inputs, because the
# DuckDB oracles re-derive them independently from the same specs.
# --------------------------------------------------------------------------
def _fnv_ref(word: str, seed: int) -> int:
    h = 0xCBF29CE484222325 ^ seed
    for b in word.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) % (1 << 64)
    return h


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(min_codepoint=1,
                                               max_codepoint=0x2FF),
                        min_size=0, max_size=24),
                min_size=1, max_size=30),
       st.integers(min_value=0, max_value=63))
def test_fnv1a_word_hashes_property(words, seed):
    from ci_log_processing_ray.ops.dedup import _fnv1a_word_hashes

    got = _fnv1a_word_hashes(pa.array(words, pa.string()), seed)
    want = np.array([_fnv_ref(w, seed) for w in words], dtype=np.uint64)
    assert (got == want).all(), (words, seed)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=1, max_size=50))
def test_fmix64_property(xs):
    from ci_log_processing_ray.ops.sketch import _fmix64

    def ref(x):
        m = (1 << 64) - 1
        x ^= x >> 33
        x = (x * 0xFF51AFD7ED558CCD) & m
        x ^= x >> 33
        x = (x * 0xC4CEB9FE1A85EC53) & m
        x ^= x >> 33
        return x

    arr = np.array(xs, dtype=np.uint64)
    got = _fmix64(arr)
    want = np.array([ref(x) for x in xs], dtype=np.uint64)
    assert (got == want).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=60),
                min_size=1, max_size=12),
       st.integers(min_value=0, max_value=20))
def test_simhash_batch_property(texts, seed):
    """Vectorized simhash == scalar definition on arbitrary whitespace
    splits (incl. empty docs and repeated words)."""
    from ci_log_processing_ray.ops.dedup import _simhash_batch

    def rowwise(text):
        words = text.split()
        if not words:
            return np.uint64(0)
        h = np.array([_fnv_ref(w, seed) for w in words], dtype=np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64))
                & np.uint64(1)).astype(np.int64)
        votes = bits.sum(axis=0) * 2 - len(h)
        return np.uint64(sum(1 << i for i, v in enumerate(votes) if v > 0))

    got = _simhash_batch(texts, seed)
    want = np.array([rowwise(t) for t in texts], dtype=np.uint64)
    assert (got == want).all(), texts
