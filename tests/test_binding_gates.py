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


# ------------------------------------------------- planted-pair recovery
def test_planted_clusters_cert_accepts():
    df = pd.DataFrame({"doc_id": [0, entrymod._PLANT_OFF],
                       "cluster_rep": [0, 0]})
    entrymod._cert_planted_clusters(df, "doc_id", "cluster_rep", [0], "t")


def test_planted_clusters_cert_rejects_missing():
    df = pd.DataFrame({"doc_id": [0], "cluster_rep": [0]})
    with pytest.raises(AssertionError, match="missing"):
        entrymod._cert_planted_clusters(df, "doc_id", "cluster_rep",
                                        [0], "t")


def test_planted_clusters_cert_rejects_split():
    df = pd.DataFrame({"doc_id": [0, entrymod._PLANT_OFF],
                       "cluster_rep": [0, entrymod._PLANT_OFF]})
    with pytest.raises(AssertionError, match="split"):
        entrymod._cert_planted_clusters(df, "doc_id", "cluster_rep",
                                        [0], "t")


SF0 = "/root/testdata/sf0.001"


def test_simhash_gate_fires_without_planting(ray_session, monkeypatch):
    # A regression that silently drops the planted copies must raise.
    monkeypatch.setattr(entrymod, "_plant_dup_texts", lambda ds: ds)
    with pytest.raises(AssertionError, match="simhash"):
        entrymod.q_simhash(SF0)


def test_winnow_gate_fires_without_planting(ray_session, monkeypatch):
    monkeypatch.setattr(entrymod, "_plant_dup_texts", lambda ds: ds)
    with pytest.raises(AssertionError, match="winnow"):
        entrymod.q_winnow_fingerprints(SF0)


def test_minhash_gate_fires_without_planting(ray_session, monkeypatch):
    monkeypatch.setattr(entrymod, "_plant_dup_texts", lambda ds: ds)
    with pytest.raises(AssertionError, match="minhash"):
        entrymod.q_minhash_dedup(SF0)


def test_phash_gate_fires_when_pairs_dropped(ray_session, monkeypatch):
    from ci_log_processing_ray.ops import multimodal as mm
    real = mm.phash_clusters

    def dropped(ds, **kw):
        return real(ds, **kw).filter(expr="media_id < 1000000")

    monkeypatch.setattr(mm, "phash_clusters", dropped)
    with pytest.raises(AssertionError, match="phash"):
        entrymod.q_phash_dedup(SF0)


def test_compression_gate_fires_on_flat_scores(ray_session, monkeypatch):
    from ci_log_processing_ray.ops import textstats as ts
    real = ts.compression_ratio

    def flat(ds, text_col, id_col):
        out = real(ds, text_col, id_col)

        def clamp(t):
            import pyarrow as pa
            r = t["ratio_milli"].combine_chunks().to_numpy().copy()
            ids = t[id_col].combine_chunks().to_numpy()
            r[ids < 0] = 500          # controls lose their separation
            return pa.table({id_col: t[id_col],
                             "ratio_milli": pa.array(r)})

        return out.map_batches(clamp, batch_format="pyarrow")

    monkeypatch.setattr(ts, "compression_ratio", flat)
    with pytest.raises(AssertionError, match="compression_ratio"):
        entrymod.q_compression_ratio(SF0)


def test_cdc_gate_fires_when_growth_wrong(ray_session, monkeypatch):
    from ci_log_processing_ray.ops import dedup as dd
    real = dd.cdc_chunk_stats
    calls = {"n": 0}

    def stuck(ds, text_col, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            first = real(ds, text_col, **kw)
            stuck.first = first
            return first
        return stuck.first            # augmented run reports no growth

    monkeypatch.setattr(dd, "cdc_chunk_stats", stuck)
    with pytest.raises(AssertionError, match="cdc_chunks"):
        entrymod.q_cdc_chunks(SF0)
