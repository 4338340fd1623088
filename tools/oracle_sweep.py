"""Full-registry driver-equivalent sweep: every queries() entry with an
oracle_sql() entry is run at the given sf dir and compared against DuckDB
with the driver's own normalization (columns sorted by name, ints ->
int64, timestamps -> us, object -> str, rows sorted, frame-equal);
rows-only entries are run for their binding in-query gates.

Usage:
    python tools/oracle_sweep.py [SF_DIR] [--only name1,name2] [--cpus N]

The per-round CORRECTNESS gate runs at sf0.01; the pytest suite pins
sf0.001 -- this tool is the sf0.01 dress rehearsal on demand.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _dtype_kind(s):
    """Coarse dtype class matching the driver hash's sensitivity: an
    int64-vs-float64 mismatch (the r4 embedding_dedup bug) must FAIL
    here even though _norm would coerce it away."""
    import pandas as pd

    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def _assert_dtypes_match(got, want, name):
    """Pre-normalization dtype-class check on raw frames (columns
    matched by name): the driver's value hash is dtype-sensitive, so
    the sweep must be too (VERDICT r4 item 8)."""
    for c in sorted(set(got.columns) & set(want.columns)):
        gk, wk = _dtype_kind(got[c]), _dtype_kind(want[c])
        if gk != wk:
            raise AssertionError(
                f"{name}: column {c!r} dtype class mismatch "
                f"(engine={got[c].dtype} [{gk}] vs "
                f"oracle={want[c].dtype} [{wk}])")


def _norm(df):
    import pandas as pd

    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR")

    import duckdb
    import pandas as pd

    import __ray_entry__ as m

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{args.sf_dir}/{t}.parquet'")

    queries = m.queries()
    oracles = m.oracle_sql()
    names = sorted(queries)
    if args.only:
        names = [n for n in args.only.split(",") if n in queries]

    n_ok = n_fail = 0
    failures = []
    for name in names:
        t0 = time.time()
        try:
            got = queries[name](args.sf_dir)
            got = got.to_pandas() if hasattr(got, "to_pandas") else got
            if name in oracles:
                want_raw = con.sql(oracles[name]).df()
                _assert_dtypes_match(got, want_raw, name)
                want = _norm(want_raw)
                gotn = _norm(got)
                assert list(gotn.columns) == list(want.columns), \
                    (list(gotn.columns), list(want.columns))
                assert len(gotn) == len(want), (len(gotn), len(want))
                pd.testing.assert_frame_equal(gotn, want,
                                              check_dtype=False)
                status = "oracle-identical"
            else:
                status = f"rows-only ({len(got)} rows, gates green)"
            n_ok += 1
            print(f"OK   {name}: {status} [{time.time() - t0:.2f}s]",
                  flush=True)
        except Exception as e:  # noqa: BLE001 -- sweep must not stop
            n_fail += 1
            failures.append(name)
            msg = str(e).replace("\n", " ")[:200]
            print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "n_ok": n_ok,
                      "n_fail": n_fail, "failures": failures}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
