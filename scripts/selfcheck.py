#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir> [artifactJson]

Assumes `graft.Verify <sfDir> <verifyOutDir>` already ran (it wrote one
parquet dir per query plus oracle_sql.json). Registers each testdata
table as a DuckDB view, runs every oracle SQL, and compares against the
Spark result: columns sorted by name, rows sorted by all columns,
exact value equality (NaN==NaN).

With [artifactJson] (e.g. CORRECTNESS_self.json), also writes a
self-struck artifact: per-query status + oracle wall seconds + row
count, plus totals — so a round whose driver-side correctness artifact
comes back empty (r13: a wall cap on the driver's gate while the
clean_serve oracle cost 765 s pre-MATERIALIZED) still carries a
committed, timestamped correctness signal in the repo.
"""
import json
import sys
import time

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str, artifact: str = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Per-query parquet provenance (r14 ADVICE #5): a filtered Verify
    # run refreshes every oracle entry but re-strikes only its subset's
    # parquet; struck_at.json says when each parquet was last struck so
    # a mismatch on a stale result is labeled as such, not misread as a
    # live regression. Missing file (pre-r15 outDir) = no labels.
    try:
        struck_at = json.load(open(f"{out_dir}/struck_at.json"))
    except Exception:
        struck_at = {}
    newest = max(struck_at.values()) if struck_at else None
    failures = 0
    rows = {}
    t_all = time.time()
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        status, nrows = "ok", 0
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failures += 1
            rows[name] = {"status": "spark_unreadable", "oracle_sec": 0.0, "rows": 0}
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql errored: {e}")
            failures += 1
            rows[name] = {"status": "oracle_error",
                          "oracle_sec": round(time.time() - t0, 3), "rows": 0}
            continue
        oracle_sec = time.time() - t0
        g, w = canon(got), canon(want)
        nrows = len(g)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            status = "column_mismatch"
        elif len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            status = "row_mismatch"
        else:
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
                print(f"OK   {name} ({len(g)} rows, {oracle_sec:.2f}s oracle)")
            except AssertionError as e:
                print(f"FAIL {name}: value mismatch\n{str(e)[:2000]}")
                neq = (g.astype(str) != w.astype(str)).any(axis=1)
                print(pd.concat([g[neq].head(3), w[neq].head(3)], keys=["spark", "duckdb"]))
                failures += 1
                status = "value_mismatch"
        if status != "ok" and newest is not None and struck_at.get(name, newest) < newest:
            print(f"     NOTE {name}: parquet is STALE (struck {struck_at.get(name)} "
                  f"< newest {newest}) — rerun an unfiltered Verify before "
                  f"diagnosing this as a live regression")
            status += "_stale_parquet"
        rows[name] = {"status": status, "oracle_sec": round(oracle_sec, 3), "rows": nrows}
    total_sec = time.time() - t_all
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match "
          f"({total_sec:.1f}s total oracle replay)")
    if artifact:
        with open(artifact, "w") as f:
            json.dump({
                "sf_dir": sf_dir,
                "struck_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "queries_total": len(oracle),
                "queries_match": len(oracle) - failures,
                "oracle_replay_sec": round(total_sec, 1),
                "queries": rows,
            }, f, indent=1, sort_keys=True)
        print(f"wrote {artifact}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:4]))
