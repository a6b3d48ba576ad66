#!/usr/bin/env python3
"""Local correctness gate approximating the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads <verify_out_dir>/<name>/ (parquet written by graft.Verify) and
<verify_out_dir>/oracle_sql.json, runs each oracle SQL in DuckDB with views
over the same parquet tables, and compares: column names (sorted), row
count, and per-row values in result order (columns sorted by name, like the
driver's hash).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def frame_rows(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            # NaN must normalize to the "NaN" sentinel, NOT None — pd.isna
            # treats NaN as na, which would make a Spark-NaN vs oracle-NULL
            # disagreement falsely PASS.
            if isinstance(v, float) and math.isnan(v):
                row.append("NaN")
            elif pd.isna(v) if not isinstance(v, (list, tuple)) else False:
                row.append(None)
            elif isinstance(v, pd.Timestamp):
                row.append(v.to_pydatetime().replace(tzinfo=None).isoformat(timespec="microseconds"))
            elif isinstance(v, float):
                row.append(norm_cell(v))
            else:
                row.append(v)
        rows.append(tuple(row))
    return rows


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = out_dir / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetch_df()
            exp = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
            continue
        # Dtype KIND must match too: the driver's hash is type-sensitive,
        # so DuckDB HUGEINT (sum of BIGINT, widened; pandas float64) vs
        # Spark long (int64) fails its hash even when every VALUE is equal
        # — the round-11 lesson (10 oracles leaked un-cast sums). Kinds:
        # i=int, f=float, b=bool, O=object, M=datetime.
        kind_bad = [
            (c, got[c].dtype.kind, exp[c].dtype.kind)
            for c in gc if got[c].dtype.kind != exp[c].dtype.kind
        ]
        if kind_bad:
            print(f"FAIL {name}: dtype kind mismatch (spark vs duck): "
                  f"{kind_bad} — un-cast HUGEINT in the oracle?")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        g_rows, e_rows = frame_rows(got), frame_rows(exp)
        bad = None
        for i, (g, e) in enumerate(zip(g_rows, e_rows)):
            if g != e:
                bad = (i, g, e)
                break
        if bad:
            i, g, e = bad
            print(f"FAIL {name}: row {i} differs\n  spark={g}\n  duck ={e}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
