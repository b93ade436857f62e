#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB over the
sf parquet tables, and compares: column names (sorted), row count, and
a hash over the sorted values. Mirrors what CORRECTNESS_r{N}.json checks
so we can iterate locally before the driver runs.
"""
import json
import sys
import hashlib
import duckdb
import glob
import os

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    """Sort columns by name, stringify values, sort rows, hash."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(str(r[i]) for i in order))
    out.sort()
    h = hashlib.sha256()
    for r in out:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest(), out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    results = {}
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        rel = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        scols = [c[0] for c in rel.description]
        srows = rel.fetchall()
        # The driver canonicalizes Spark-parquet decimals and DuckDB
        # decimals differently (r9 q_lenient_cast lesson) — but this
        # mirror fetches BOTH sides through DuckDB, which masks it.
        # Enforce the house policy instead: a bare DECIMAL output column
        # is a failure here even when values compare equal.
        desc = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{d}/*.parquet')").fetchall()
        dec_cols = [c for c, t, *_ in desc if t.upper().startswith("DECIMAL")]
        if dec_cols:
            results[name] = f"BARE_DECIMAL_OUTPUT cols={dec_cols} (stringify per q_various_types_dec)"
            continue
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(srows)}" + (" EMPTY!" if not srows else "")
            continue
        try:
            orel = con.execute(oracles[name])
            ocols = [c[0] for c in orel.description]
            orows = orel.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        if sorted(scols) != sorted(ocols):
            results[name] = f"SCHEMA_MISMATCH spark={sorted(scols)} oracle={sorted(ocols)}"
            continue
        sh, sv = canon(srows, scols)
        oh, ov = canon(orows, ocols)
        if len(srows) != len(orows):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(srows)} oracle={len(orows)}"
        elif sh != oh:
            diff = next((i for i, (a, b) in enumerate(zip(sv, ov)) if a != b), None)
            detail = ""
            if diff is not None:
                detail = f" first_diff_row={diff} spark={sv[diff]} oracle={ov[diff]}"
            results[name] = "HASH_MISMATCH" + detail
        else:
            results[name] = "MATCH"

    for k in sorted(oracles):
        if k not in results:
            results[k] = "ORACLE_WITHOUT_OUTPUT"
    bad = 0
    for k in sorted(results):
        v = results[k]
        ok = v == "MATCH" or v.startswith("ROWS_ONLY rows=") and "EMPTY" not in v
        if not ok:
            bad += 1
        print(("PASS " if ok else "FAIL ") + k + ": " + v)
    print(f"\n{len(results) - bad}/{len(results)} pass")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
