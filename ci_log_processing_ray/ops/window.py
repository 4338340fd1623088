"""Stream-shaped operators over an ordered, partitioned event log.

Ray Data has no event-time windows; these express the reference's
order-dependent semantics (ST3 carry-forward) and classic sessionization
as ``groupby(key).map_groups`` over groups sorted by their order column
-- the documented partitioning assumption is "one group fits in memory",
which holds for per-user / per-file groups.
"""

from __future__ import annotations

import datetime

import pandas as pd

import ray.data


def forward_fill_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    order_col: str,
    value_col: str,
    *,
    fill_leading,
    out_col: str | None = None,
) -> ray.data.Dataset:
    """Per-group ordered forward fill (the generalized M2 carry-forward):
    nulls inherit the last non-null value earlier in the group; leading
    nulls get ``fill_leading``."""
    out_col = out_col or value_col

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col).copy()
        g[out_col] = g[value_col].ffill().fillna(fill_leading)
        return g

    return ds.groupby(group_col).map_groups(fill, batch_format="pandas")


def sessionize(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    *,
    gap: datetime.timedelta,
    tiebreak_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Assign session ids per key: a new session starts when the gap to
    the previous event exceeds ``gap``.  Adds ``session_id`` (0-based
    per key, in (ts, *tiebreak) order -- pass tiebreaks for determinism
    when timestamps can tie)."""
    order = [ts_col] + list(tiebreak_cols or [])

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="stable").copy()
        new = g[ts_col].diff() > gap
        g["session_id"] = new.cumsum().astype("int64")
        return g

    return ds.groupby(key_col).map_groups(assign, batch_format="pandas")


def rolling_count_by_group(
    ds: "ray.data.Dataset",
    group_col: str,
    ts_col: str,
    id_col: str,
    window,
) -> "ray.data.Dataset":
    """SQL RANGE-frame rolling count: for each row, the number of rows
    of the same group with ts in [row.ts - window, row.ts] (peers with
    EQUAL timestamps all count, exactly like ``RANGE BETWEEN <window>
    PRECEDING AND CURRENT ROW``).  One groupby shuffle; per-group
    kernel is two vectorized searchsorted passes -- deliberately NOT
    pandas ``rolling`` whose ROW-based tie handling diverges from SQL.
    """
    import numpy as np
    import pandas as pd

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g[ts_col].to_numpy())
        cur = g[ts_col].to_numpy()
        hi = np.searchsorted(ts, cur, side="right")
        lo = np.searchsorted(ts, cur - window, side="left")
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             "n_in_window": (hi - lo).astype(np.int64)})

    return ds.groupby(group_col).map_groups(roll, batch_format="pandas")
