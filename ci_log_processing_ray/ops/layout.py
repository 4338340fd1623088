"""Multidimensional data layout: Z-order (Morton) clustering.

Lakehouse engines cluster files on a space-filling curve (Delta /
Iceberg ``OPTIMIZE ZORDER``) so that range predicates on EITHER of two
dimensions prune whole blocks: sorting by the interleaved-bit Morton
code makes every output block a small rectangle in (x, y) space, so
per-block min/max statistics are tight for both columns at once --
something a lexicographic (x, y) sort only gives for the leading
column.

Ray-Data-first shape:

* the Morton key is a pure vectorized ``map_batches`` (five
  shift-and-mask passes per dimension -- the classic bit-twiddling
  spread, no Python per row);
* the clustering itself is ``Dataset.sort`` on the key -- Ray Data's
  sample-based range-partitioned distributed sort, which at 100 TB is
  ONE boundary-sampled exchange, no driver materialization;
* ``zorder_cell_counts`` proves key correctness cheaply: per-block
  ``np.bincount`` partials (cells are vocabulary-shaped, <= 2^(2*bits))
  plus one small groupby-sum -- the exchange carries at most
  #blocks x #cells counter rows, never the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ray.data.aggregate import Sum


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each int to the even bit positions
    (Morton bit-twiddle; int64 throughout so the SQL oracle's BIGINT
    math matches exactly)."""
    x = x.astype(np.int64)
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def morton2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave two <=16-bit non-negative int vectors into the 2-D
    Morton (Z-order) code: bit i of x lands at position 2i, bit i of y
    at 2i+1.  Out-of-range values raise instead of silently aliasing a
    wrong curve cell (one vectorized range check -- cheap next to the
    five spread passes)."""
    for name, v in (("x", x), ("y", y)):
        if len(v) and (int(v.min()) < 0 or int(v.max()) >= (1 << 16)):
            raise ValueError(
                f"morton2 {name} values must be in [0, 65536); got "
                f"[{v.min()}, {v.max()}] -- bucket/scale wider domains")
    return _part1by1(x) | (_part1by1(y) << 1)


def zorder_sort(
    ds: ray.data.Dataset,
    x_col: str,
    y_col: str,
    *,
    key_col: str = "zkey",
) -> ray.data.Dataset:
    """Cluster ``ds`` on the Z-order curve of two int columns: append
    the Morton key and range-sort on it.  Output blocks are contiguous
    z-ranges, i.e. near-square (x, y) rectangles -- the layout that
    makes BOTH columns' block min/max stats selective.  Values must be
    non-negative and < 2^16 (bucket/scale wider domains first)."""

    def add_key(t: pa.Table) -> pa.Table:
        x = t[x_col].combine_chunks().to_numpy(zero_copy_only=False)
        y = t[y_col].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column(key_col, pa.array(morton2(x, y)))

    return ds.map_batches(add_key, batch_format="pyarrow",
                          zero_copy_batch=True).sort(key_col)


def zorder_cell_counts(
    ds: ray.data.Dataset,
    x_col: str,
    y_col: str,
    *,
    bits: int = 8,
) -> ray.data.Dataset:
    """Exact row count per Z-order cell of two pre-bucketed int columns
    (each < 2^bits): per-block ``np.bincount`` combiner collapses every
    block to at most 2^(2*bits) (zcell, n) partials BEFORE the one
    vocabulary-sized groupby-sum exchange."""
    if bits > 16:
        raise ValueError("morton2 interleaves at most 16 bits per dim")
    n_cells = 1 << (2 * bits)

    def partial(t: pa.Table) -> pa.Table:
        x = t[x_col].combine_chunks().to_numpy(zero_copy_only=False)
        y = t[y_col].combine_chunks().to_numpy(zero_copy_only=False)
        z = morton2(x, y)
        counts = np.bincount(z, minlength=n_cells)
        nz = np.flatnonzero(counts)
        return pa.table({"zcell": pa.array(nz.astype(np.int64)),
                         "n": pa.array(counts[nz].astype(np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("zcell").aggregate(Sum("n", alias_name="n")))
