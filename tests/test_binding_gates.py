"""Negative tests for the binding in-query certificates.

Each rows-only query that claims a BINDING gate must prove the gate
actually FIRES on corrupted output -- otherwise "binding" is an empty
word.  The certificate helpers in __ray_entry__ are pure functions over
plain pandas/numpy inputs, so these tests need no Ray session.
"""
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod


# ---------------------------------------------------------------- isotonic
def _iso_fixture():
    """A tiny exact PAV instance: scores 1..4 with (pos, n) chosen so
    the optimal fit pools {1,2} (rate 1/4) then {3} (1/2) then {4}
    (3/4)."""
    per_score = pd.DataFrame({
        "score": [1, 2, 3, 4],
        "pos": [1, 1, 2, 3],
        "n": [4, 4, 4, 4]})
    fit = pd.DataFrame({
        "block_id": [0, 1, 2],
        "score_lo": [1, 3, 4],
        "score_hi": [2, 3, 4],
        "pos": [2, 2, 3],
        "n": [8, 4, 4],
        "rate_permille": [250, 500, 750]})
    return fit, per_score


def test_isotonic_cert_accepts_optimal():
    fit, ps = _iso_fixture()
    entrymod._cert_isotonic(fit, ps)


def test_isotonic_cert_rejects_non_monotone():
    fit, ps = _iso_fixture()
    bad = fit.copy()
    bad.loc[0, "pos"] = 6          # rate 6/8 > next block's 2/4
    with pytest.raises(AssertionError, match="isotonic"):
        entrymod._cert_isotonic(bad, ps)


def test_isotonic_cert_rejects_mass_loss():
    fit, ps = _iso_fixture()
    bad = fit.copy()
    bad.loc[2, "n"] = 3
    with pytest.raises(AssertionError, match="isotonic"):
        entrymod._cert_isotonic(bad, ps)


def test_isotonic_cert_rejects_suboptimal_pooling():
    # Pooling ALL four scores keeps (pos, n) conserved and trivially
    # monotone, but prefix {1,2} has mean 2/8 < block mean 7/16 --
    # splitting there would reduce L2 error, so the cert must fire.
    _, ps = _iso_fixture()
    bad = pd.DataFrame({
        "block_id": [0], "score_lo": [1], "score_hi": [4],
        "pos": [7], "n": [16], "rate_permille": [437]})
    with pytest.raises(AssertionError, match="prefix"):
        entrymod._cert_isotonic(bad, ps)


def test_isotonic_cert_rejects_overmerge_of_increasing_blocks():
    # Merging blocks {3} and {4} (rates 1/2 < 3/4) is feasible but not
    # maximally split; prefix {3} mean 2/4 < merged mean 5/8 fires the
    # prefix condition.
    _, ps = _iso_fixture()
    bad = pd.DataFrame({
        "block_id": [0, 1],
        "score_lo": [1, 3], "score_hi": [2, 4],
        "pos": [2, 5], "n": [8, 8],
        "rate_permille": [250, 625]})
    with pytest.raises(AssertionError, match="prefix"):
        entrymod._cert_isotonic(bad, ps)


# ----------------------------------------------------------- heavy hitters
def test_heavy_hitters_cert_accepts_within_bound():
    out = pd.DataFrame({"item": ["a", "b"], "est_count": [90, 50]})
    entrymod._cert_heavy_hitters(out, {"a": 100, "b": 55}, 1000, k=32)


def test_heavy_hitters_cert_rejects_overestimate():
    out = pd.DataFrame({"item": ["a"], "est_count": [120]})
    with pytest.raises(AssertionError, match="overestimated"):
        entrymod._cert_heavy_hitters(out, {"a": 100}, 1000, k=32)


def test_heavy_hitters_cert_rejects_blown_bound():
    out = pd.DataFrame({"item": ["a"], "est_count": [10]})
    with pytest.raises(AssertionError, match="MG bound"):
        entrymod._cert_heavy_hitters(out, {"a": 100}, 1000, k=32)


# ---------------------------------------------------------------- quantile
def test_quantile_cert_accepts_close():
    v = np.arange(1.0, 1001.0)
    entrymod._cert_quantile(500.0, v, 0.5, 0.01, "t")


def test_quantile_cert_rejects_far():
    v = np.arange(1.0, 1001.0)
    with pytest.raises(AssertionError, match="relative"):
        entrymod._cert_quantile(560.0, v, 0.5, 0.01, "t")


# --------------------------------------------------------------- pack bins
def _pack_fixture():
    lens = {1: 300, 2: 200, 3: 600, 4: 0}
    out = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "bin_id": [0, 0, 1, 2],
        "offset_in_bin": [0, 300, 0, 0],
        "truncated": [0, 0, 1, 0]})
    return out, lens


def test_pack_cert_accepts_feasible():
    out, lens = _pack_fixture()
    entrymod._cert_pack_bins(out, lens, 512)


def test_pack_cert_rejects_double_place():
    out, lens = _pack_fixture()
    bad = pd.concat([out, out.iloc[[0]]], ignore_index=True)
    with pytest.raises(AssertionError, match="twice"):
        entrymod._cert_pack_bins(bad, lens, 512)


def test_pack_cert_rejects_overlap():
    out, lens = _pack_fixture()
    bad = out.copy()
    bad.loc[1, "offset_in_bin"] = 100   # overlaps doc 1's [0, 300)
    with pytest.raises(AssertionError, match="overlap"):
        entrymod._cert_pack_bins(bad, lens, 512)


def test_pack_cert_rejects_wrong_truncation_flag():
    out, lens = _pack_fixture()
    bad = out.copy()
    bad.loc[2, "truncated"] = 0
    with pytest.raises(AssertionError, match="truncated"):
        entrymod._cert_pack_bins(bad, lens, 512)


def test_pack_cert_rejects_lost_doc():
    out, lens = _pack_fixture()
    with pytest.raises(AssertionError, match="lost"):
        entrymod._cert_pack_bins(out.iloc[:-1], lens, 512)
