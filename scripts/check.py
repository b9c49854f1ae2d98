#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (FIXTURES.md §3).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over views named after the fixture
tables, canonicalizes both (sort columns by name, sort rows, round doubles
to 1e-9, timestamps → UTC strings), and reports match/mismatch per query.
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.round(9)
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif s.dtype == object:
            out[c] = s.astype(str)
        else:
            out[c] = s
    df = pd.DataFrame(out)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


# DuckDB result types that the driver's pandas bridge materializes as
# float64 (or object) while Spark returns int64 — the canonicalized
# frames then hash differently even when every value is identical.
# sum(BIGINT) -> HUGEINT is the canonical offender (bit us in r04 and
# again in r05's x_smp8_length_buckets). Lint the oracle's *declared*
# result schema via DESCRIBE so the drift fails loudly at verify time,
# with the fix named, instead of as an opaque hash mismatch at the
# driver.
_DRIFTY_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL(38,0)", "UBIGINT")


def lint_oracle_types(con, sql: str):
    """Return [(column, duck_type), ...] for result columns whose DuckDB
    type is known to drift through pandas. Empty list = clean."""
    try:
        desc = con.execute("DESCRIBE " + sql).fetchall()
    except Exception:
        return []  # the main path will surface the SQL error itself
    return [(row[0], row[1]) for row in desc
            if any(row[1].upper().startswith(t) for t in _DRIFTY_TYPES)]


def _lint_demo(con):
    """--lint-demo: seed a violating oracle (un-cast sum over BIGINT) and
    show the guard catches it."""
    con.execute("CREATE OR REPLACE VIEW _demo AS SELECT CAST(i AS BIGINT) x "
                "FROM range(10) t(i)")
    bad = "SELECT sum(x) AS tokens FROM _demo"
    good = "SELECT CAST(sum(x) AS BIGINT) AS tokens FROM _demo"
    hits = lint_oracle_types(con, bad)
    assert hits == [("tokens", "HUGEINT")], hits
    assert lint_oracle_types(con, good) == []
    print(f"LINT-DEMO seeded violation caught: {bad!r} -> {hits}")
    print(f"LINT-DEMO cast form passes clean:  {good!r}")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--lint-demo":
        _lint_demo(duckdb.connect())
        return
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        spark_df = pd.read_parquet(os.path.join(out_dir, name))
        if name not in oracle:
            ok = len(spark_df) > 0
            n_noracle += 1
            print(f"{'ROWS-OK ' if ok else 'EMPTY!! '}{name} (no oracle, {len(spark_df)} rows)")
            continue
        drifty = lint_oracle_types(con, oracle[name])
        if drifty:
            n_fail += 1
            for col, typ in drifty:
                print(f"FAIL    {name}: oracle column {col!r} is {typ} — "
                      f"pandas will widen it to float64 while Spark returns "
                      f"int64; wrap it in CAST(... AS BIGINT) in the oracle SQL")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"FAIL    {name}: oracle SQL error: {e}")
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            n_fail += 1
            print(f"FAIL    {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            n_fail += 1
            print(f"FAIL    {name}: rows {len(a)} vs {len(b)}")
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=False, rtol=0, atol=1e-9)
            n_pass += 1
            print(f"PASS    {name} ({len(a)} rows)")
        except AssertionError as e:
            n_fail += 1
            msg = str(e).splitlines()
            print(f"FAIL    {name}: {msg[0] if msg else e}")
            # show first diff
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if neq[c].any()]
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                print(f"        col {c} row {idx}: spark={a[c][idx]!r} duck={b[c][idx]!r}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
