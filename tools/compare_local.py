#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare_local.py <verify_out_dir> <sf_dir> [query ...]

Reads each <verify_out_dir>/<name> parquet result, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf parquet tables,
and compares rows / schema / values (sorted by column name, exact).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            results[name] = f"no_oracle rows={len(spark_df)}"
            continue
        try:
            ora_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_ERR {e}"
            continue
        s, o = norm(spark_df), norm(ora_df)
        if len(s) != len(o):
            results[name] = f"ROWS {len(s)} vs {len(o)}"
        elif list(s.columns) != list(o.columns):
            results[name] = f"SCHEMA {list(s.columns)} vs {list(o.columns)}"
        else:
            try:
                pd.testing.assert_frame_equal(s, o, check_dtype=False,
                                              check_exact=True)
                results[name] = "OK"
            except AssertionError as e:
                results[name] = "HASH " + str(e).split("\n")[0]
                # show first mismatching cells
                for c in s.columns:
                    if not s[c].equals(o[c]):
                        neq = s[c] != o[c]
                        i = neq[neq].index[0] if neq.any() else None
                        if i is not None:
                            results[name] += f" | col={c} spark={s[c][i]!r} oracle={o[c][i]!r}"
                        break
    bad = 0
    for k, v in sorted(results.items()):
        flag = "PASS" if v == "OK" else "FAIL"
        if v != "OK":
            bad += 1
        print(f"{flag} {k}: {v}")
    print(f"\n{len(results)-bad}/{len(results)} OK")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
