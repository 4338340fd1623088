"""Property-based parity for the window/relational operators: on
ARBITRARY random inputs, the distributed bucketed kernels must agree
with simple row-at-a-time brute-force references.  Catches segment-
boundary and tie-handling drift that fixed fixtures cannot.

Hypothesis drives the input shapes; each case round-trips through a
real (local) Ray Dataset with a random repartition so partitioning
invariance is exercised too.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import ray
import ray.data

events_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),      # group key
        st.integers(min_value=0, max_value=3_600),  # ts seconds
    ),
    min_size=1, max_size=60,
)

SET = settings(max_examples=25, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


def _ds(df: pd.DataFrame, parts: int) -> "ray.data.Dataset":
    return ray.data.from_pandas(df).repartition(parts)


@given(data=events_st, parts=st.integers(min_value=1, max_value=4))
@SET
def test_rolling_count_matches_bruteforce(ray_session, data, parts):
    from ci_log_processing_ray.ops.window import rolling_count_by_group

    df = pd.DataFrame({
        "k": [d[0] for d in data],
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta([d[1] for d in data], unit="s"),
        "id": np.arange(len(data), dtype=np.int64),
    })
    out = rolling_count_by_group(
        _ds(df, parts), "k", "ts", "id",
        window=pd.Timedelta("600s")).to_pandas().set_index("id")
    for _, row in df.iterrows():
        same = df[df.k == row.k]
        want = int(((same.ts >= row.ts - pd.Timedelta("600s"))
                    & (same.ts <= row.ts)).sum())
        assert out.loc[row.id, "n_in_window"] == want


@given(data=events_st, parts=st.integers(min_value=1, max_value=4),
       n_tiles=st.integers(min_value=1, max_value=5))
@SET
def test_ntile_matches_bruteforce(ray_session, data, parts, n_tiles):
    from ci_log_processing_ray.ops.window import ntile_by_group

    df = pd.DataFrame({
        "k": [d[0] for d in data],
        "v": [d[1] for d in data],
        "id": np.arange(len(data), dtype=np.int64),
    })
    out = ntile_by_group(_ds(df, parts), "k", ["v", "id"], "id",
                         n_tiles).to_pandas().set_index("id")
    for key, grp in df.groupby("k"):
        grp = grp.sort_values(["v", "id"])
        n = len(grp)
        q, r = divmod(n, n_tiles)
        want_tiles = []
        for tile in range(1, n_tiles + 1):
            want_tiles.extend([tile] * (q + (1 if tile <= r else 0)))
        got = [out.loc[i, "tile"] for i in grp.id]
        assert got == want_tiles[:n], (key, got, want_tiles)


@given(data=events_st, parts=st.integers(min_value=1, max_value=4))
@SET
def test_hopping_window_matches_bruteforce(ray_session, data, parts):
    from ci_log_processing_ray.ops.window import hopping_window_agg

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "ts": base + pd.to_timedelta([d[1] for d in data], unit="s"),
        "value": [float(d[0]) for d in data],
    })
    out = hopping_window_agg(_ds(df, parts), "ts", "value",
                             window_s=600, hop_s=300).to_pandas()
    got = dict(zip(out.window_start_s, out.n_events))
    # brute force: every event lands in window_s/hop_s hop windows
    want: dict = {}
    for _, row in df.iterrows():
        sec = int(row.ts.timestamp())
        hb = sec // 300
        for i in range(2):
            want[(hb - i) * 300] = want.get((hb - i) * 300, 0) + 1
    assert got == want


@given(
    left=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 100)),
                  min_size=1, max_size=30),
    right=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 100)),
                   min_size=1, max_size=30),
    parts=st.integers(min_value=1, max_value=3),
)
@SET
def test_asof_join_matches_bruteforce(ray_session, left, right, parts):
    from ci_log_processing_ray.ops.relational import asof_join_grouped

    base = pd.Timestamp("2024-01-01")
    ldf = pd.DataFrame({
        "k": [x[0] for x in left],
        "lts": base + pd.to_timedelta([x[1] for x in left], unit="s"),
        "lid": np.arange(len(left), dtype=np.int64),
    })
    rdf = pd.DataFrame({
        "k": [x[0] for x in right],
        "rts": base + pd.to_timedelta([x[1] for x in right], unit="s"),
    })
    out = asof_join_grouped(
        _ds(ldf, parts), _ds(rdf, parts), key="k", left_on="lts",
        right_on="rts", left_cols=["lid"],
        right_cols=[]).to_pandas().set_index("lid")
    for _, row in ldf.iterrows():
        cand = rdf[(rdf.k == row.k) & (rdf.rts <= row.lts)]
        got = out.loc[row.lid, "rts_matched"]
        if len(cand) == 0:
            assert pd.isna(got)
        else:
            assert got == cand.rts.max()


@given(data=events_st, parts=st.integers(min_value=1, max_value=4))
@SET
def test_rank_matches_pandas(ray_session, data, parts):
    from ci_log_processing_ray.ops.window import rank_by_group

    df = pd.DataFrame({
        "k": [d[0] for d in data],
        "v": [d[1] for d in data],
        "id": np.arange(len(data), dtype=np.int64),
    })
    out = rank_by_group(_ds(df, parts), "k", "v",
                        "id").to_pandas().set_index("id")
    want_rank = df.groupby("k")["v"].rank(method="min", ascending=False)
    want_dense = df.groupby("k")["v"].rank(method="dense", ascending=False)
    for i in df.id:
        assert out.loc[i, "rank"] == int(want_rank[i])
        assert out.loc[i, "dense_rank"] == int(want_dense[i])


@given(data=events_st, parts=st.integers(min_value=1, max_value=4))
@SET
def test_running_total_matches_bruteforce(ray_session, data, parts):
    from ci_log_processing_ray.ops.window import running_total_by_group

    df = pd.DataFrame({
        "k": [d[0] for d in data],
        "v": [d[1] for d in data],
        "id": np.arange(len(data), dtype=np.int64),
    })
    out = running_total_by_group(
        _ds(df, parts), "k", ["id"], "v", "id").to_pandas().set_index("id")
    want = df.sort_values("id").groupby("k")["v"].cumsum()
    for i in df.id:
        assert out.loc[i, "running_total"] == want[i]


@given(data=events_st, parts=st.integers(min_value=1, max_value=4))
@SET
def test_lag_diff_matches_bruteforce(ray_session, data, parts):
    from ci_log_processing_ray.ops.window import lag_diff_by_group

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "k": [d[0] for d in data],
        "ts": base + pd.to_timedelta([d[1] for d in data], unit="s"),
        "id": np.arange(len(data), dtype=np.int64),
    })
    out = lag_diff_by_group(
        _ds(df, parts), "k", "ts", "id",
        tiebreak_col="id").to_pandas().set_index("id")
    srt = df.sort_values(["k", "ts", "id"])
    prev = srt.groupby("k")["ts"].shift()
    for i, p in zip(srt.id, prev):
        if pd.isna(p):
            assert out.loc[i, "gap_us"] == -1
        else:
            want = int((srt.set_index("id").loc[i, "ts"] - p).value // 1000)
            assert out.loc[i, "gap_us"] == want


@given(data=st.lists(st.integers(min_value=-1000, max_value=1000),
                     min_size=1, max_size=60),
       parts=st.integers(min_value=1, max_value=4))
@SET
def test_row_number_global_matches_sorted_enumeration(ray_session, data,
                                                      parts):
    from ci_log_processing_ray.ops.window import row_number_global

    df = pd.DataFrame({"k": np.array(data, np.int64),
                       "id": np.arange(len(data), dtype=np.int64)})
    out = (row_number_global(_ds(df, parts), "k", tie_cols=["id"],
                             n_buckets=8)
           .to_pandas().sort_values("row_num").reset_index(drop=True))
    want = df.sort_values(["k", "id"]).reset_index(drop=True)
    assert list(out.row_num) == list(range(1, len(df) + 1))
    assert list(out.k) == list(want.k)
    assert list(out.id) == list(want.id)


@given(data=st.lists(st.integers(min_value=-50, max_value=50),
                     min_size=1, max_size=60),
       parts=st.integers(min_value=1, max_value=4))
@SET
def test_rank_global_matches_pandas_min_rank(ray_session, data, parts):
    from ci_log_processing_ray.ops.window import rank_global

    df = pd.DataFrame({"v": np.array(data, np.int64),
                       "id": np.arange(len(data), dtype=np.int64)})
    out = rank_global(_ds(df, parts), "v",
                      n_buckets=8).to_pandas().set_index("id")
    want = df.set_index("id")["v"].rank(method="min").astype(int)
    for i in df.id:
        assert out.loc[i, "rank"] == want[i]


@given(data=st.lists(st.tuples(st.integers(min_value=0, max_value=3),
                               st.integers(min_value=-100, max_value=100)),
                     min_size=1, max_size=60),
       parts=st.integers(min_value=1, max_value=4))
@SET
def test_minmax_scale_matches_bruteforce(ray_session, data, parts):
    from ci_log_processing_ray.ops.groupagg import minmax_scale_by_group

    df = pd.DataFrame({"g": [str(d[0]) for d in data],
                       "x": np.array([d[1] for d in data], np.int64)})
    out = minmax_scale_by_group(_ds(df, parts), "g", "x",
                                out_col="s").to_pandas()
    for _, row in out.iterrows():
        grp = df[df.g == row.g]["x"]
        lo, hi = grp.min(), grp.max()
        want = 0 if hi == lo else (row.x - lo) * 1000 // (hi - lo)
        assert row.s == want


@given(data=st.lists(st.tuples(st.integers(min_value=0, max_value=3),
                               st.integers(min_value=0, max_value=10),
                               st.integers(min_value=0, max_value=10)),
                     min_size=1, max_size=60),
       parts=st.integers(min_value=1, max_value=4))
@SET
def test_skyline_matches_bruteforce(ray_session, data, parts):
    from ci_log_processing_ray.ops.relational import skyline_2d

    df = pd.DataFrame({"g": [f"B{d[0]}" for d in data],
                       "c": np.array([d[1] for d in data], np.int64),
                       "s": np.array([d[2] for d in data], np.int64),
                       "rid": np.arange(len(data), dtype=np.int64)})
    out = skyline_2d(_ds(df, parts), "g", "c", "s").to_pandas()
    kept = set(out["rid"])
    for i, (gk, c, s) in enumerate(data):
        dominated = any(
            data[j][0] == gk and data[j][1] <= c and data[j][2] >= s
            and (data[j][1] < c or data[j][2] > s)
            for j in range(len(data)))
        assert (i in kept) == (not dominated), (i, dominated)


def test_skyline_overflow_fallback_path():
    from ci_log_processing_ray.ops.relational import _skyline_keep_mask

    g = np.zeros(4, np.int64)
    c = np.arange(4, dtype=np.int64)
    s = np.array([1 << 61, 5, 1 << 60, 7], np.int64)
    keep = _skyline_keep_mask(g, c, s)
    assert keep.tolist() == [True, False, False, False]


@given(data=st.lists(st.tuples(st.integers(min_value=0, max_value=3),
                               st.integers(min_value=0, max_value=8),
                               st.integers(min_value=0, max_value=8)),
                     min_size=1, max_size=50),
       parts=st.integers(min_value=1, max_value=4))
@SET
def test_dominance_count_matches_bruteforce(ray_session, data, parts):
    from ci_log_processing_ray.ops.relational import dominance_count_2d

    df = pd.DataFrame({"g": [f"B{d[0]}" for d in data],
                       "c": np.array([d[1] for d in data], np.int64),
                       "s": np.array([d[2] for d in data], np.int64),
                       "rid": np.arange(len(data), dtype=np.int64)})
    out = dominance_count_2d(_ds(df, parts), "g", "c", "s").to_pandas()
    got = dict(zip(out["rid"], out["n_dominators"]))
    for i, (gk, c, s) in enumerate(data):
        want = sum(1 for j in range(len(data))
                   if data[j][0] == gk and data[j][1] <= c
                   and data[j][2] >= s and (data[j][1] < c
                                            or data[j][2] > s))
        assert got[i] == want
        # consistency: zero dominators <=> on the skyline


auc_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # group
        st.integers(min_value=0, max_value=1),   # label
        st.integers(min_value=0, max_value=6),   # score (heavy ties)
    ),
    min_size=1, max_size=80,
)


@given(data=auc_st, parts=st.integers(min_value=1, max_value=4))
@SET
def test_grouped_auc_matches_pair_count(ray_session, data, parts):
    """2U must equal the brute-force pair count (2*win + tie) on any
    random tied input, at any partitioning."""
    from ci_log_processing_ray.ops.groupagg import grouped_auc

    df = pd.DataFrame(data, columns=["g", "lab", "score"]).astype(
        {"g": np.int64, "lab": np.int64, "score": np.int64})
    out = grouped_auc(_ds(df, parts), "g", "lab", "score").to_pandas()
    assert len(out) == df["g"].nunique()
    for _, row in out.iterrows():
        sub = df[df["g"] == row["g"]]
        pos = sub.loc[sub["lab"] == 1, "score"].to_numpy()
        neg = sub.loc[sub["lab"] == 0, "score"].to_numpy()
        two_u = int(2 * (pos[:, None] > neg[None, :]).sum()
                    + (pos[:, None] == neg[None, :]).sum())
        assert int(row["auc_num"]) == two_u
        assert int(row["auc_den"]) == 2 * len(pos) * len(neg)


wau_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),    # user
        st.integers(min_value=0, max_value=25),   # day offset
    ),
    min_size=1, max_size=60,
)


@given(data=wau_st, window=st.integers(min_value=1, max_value=9),
       parts=st.integers(min_value=1, max_value=4))
@SET
def test_rolling_active_matches_bruteforce(ray_session, data, window,
                                           parts):
    """Interval-delta WAU must equal the per-day distinct recount on
    any random sparse activity pattern and window size."""
    from ci_log_processing_ray.ops.window import rolling_active_users

    df = pd.DataFrame(data, columns=["user_id", "off"])
    df["ts"] = (pd.to_datetime("2024-01-01")
                + pd.to_timedelta(df["off"], unit="D"))
    out = rolling_active_users(
        _ds(df[["user_id", "ts"]], parts), "user_id", "ts",
        window_days=window).set_index("day")
    day0 = (pd.Timestamp("2024-01-01")
            - pd.Timestamp("1970-01-01")).days
    days = day0 + df["off"].to_numpy()
    lo, hi = int(days.min()), int(days.max())
    assert list(out.index) == list(range(lo, hi + 1))
    for d in range(lo, hi + 1):
        active = df.loc[(days <= d) & (days > d - window),
                        "user_id"].nunique()
        assert int(out.loc[d, "wau"]) == active, d


docs_st = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
             min_size=0, max_size=24),
    min_size=1, max_size=20,
)


@given(docs=docs_st, parts=st.integers(min_value=1, max_value=4))
@SET
def test_gopher_repetition_matches_bruteforce(ray_session, docs, parts):
    """gopher_repetition's base-V integer gram codes must agree with a
    row-at-a-time Counter reference on arbitrary word lists (incl.
    empty docs, single-word docs, all-same-word docs), regardless of
    partitioning."""
    from collections import Counter

    from ci_log_processing_ray.ops.textstats import gopher_repetition

    df = pd.DataFrame({
        "doc_id": np.arange(len(docs), dtype=np.int64),
        "text": [" ".join(ws) for ws in docs]})
    ds = ray.data.from_pandas(df).repartition(parts)
    got = gopher_repetition(ds, "text", "doc_id").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    want = []
    for i, ws in enumerate(docs):
        bigrams = Counter(zip(ws, ws[1:]))
        top2 = (1000 * max(bigrams.values()) // sum(bigrams.values())
                if bigrams else 0)
        tri = list(zip(ws, ws[1:], ws[2:]))
        dup3 = (1000 * (len(tri) - len(set(tri))) // len(tri)
                if tri else 0)
        want.append((i, len(ws), top2, dup3))
    want_df = pd.DataFrame(want, columns=["doc_id", "n_words",
                                          "top2_pm", "dup3_pm"])
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want_df.astype("int64"))
