"""Zero-copy-ish detokenization: list<int32> UTF-8 byte tokens -> string.

The token-sequence table stores each log line as its UTF-8 bytes widened
to int32 (BASELINE.json input_hint).  Decoding re-uses the list offsets
buffer directly as the string offsets buffer; the only data movement is
the vectorized int32 -> uint8 narrowing cast of the values child.  The
original ``tokens`` column is carried through untouched (per-row
token-array equality is the end-to-end invariant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def tokens_to_text(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Decode a list<int32> byte-token column to a string array.

    Handles sliced/offset list arrays by rebasing the offsets buffer; the
    fast path (whole-block arrays, offset 0) shares buffers outright.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr: pa.ListArray = col
    if arr.null_count:
        raise ValueError("tokens column must not contain nulls")

    offs = arr.offsets  # len(arr)+1 int32 values indexing into arr.values
    off0 = offs[0].as_py()
    if offs.offset != 0 or off0 != 0:
        off_np = offs.to_numpy().astype(np.int32, copy=True)
        values = arr.values.slice(off0, int(off_np[-1]) - off0)
        off_np -= off0
        offs = pa.array(off_np, type=pa.int32())
    else:
        values = arr.values

    data_u8 = pc.cast(values, pa.uint8())  # checked: raises if token > 255
    return pa.Array.from_buffers(
        pa.string(),
        len(arr),
        [None, offs.buffers()[1], data_u8.buffers()[1]],
    )
