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


def _is_list_type(duck_type: str) -> bool:
    """DuckDB spells list results as `T[]` (or `LIST(...)` / `T[n]` for
    fixed arrays). The driver's pandas canonicalizer materializes them as
    numpy arrays and then dies at sort_values with `unhashable type:
    'numpy.ndarray'` (this killed b_sql45 in r08) — a LIST-typed result
    column is gate-incompatible by construction."""
    t = duck_type.upper().strip()
    return t.endswith("]") or t.startswith("LIST") or t.startswith("ARRAY")


def lint_oracle_types(con, sql: str):
    """Return [(column, duck_type, fix), ...] for result columns whose
    DuckDB type is known to break the driver's gate. Empty list = clean."""
    try:
        desc = con.execute("DESCRIBE " + sql).fetchall()
    except Exception:
        return []  # the main path will surface the SQL error itself
    hits = []
    for row in desc:
        col, typ = row[0], row[1]
        if any(typ.upper().startswith(t) for t in _DRIFTY_TYPES):
            hits.append((col, typ,
                         "pandas will widen it to float64 while Spark returns "
                         "int64; wrap it in CAST(... AS BIGINT) in the oracle SQL"))
        elif _is_list_type(typ):
            hits.append((col, typ,
                         "raw-array result columns cannot be sorted by the "
                         "driver's pandas gate (unhashable numpy.ndarray); "
                         "serialize with array_to_string(..., ',') in the oracle "
                         "and array_join(transform(..., x -> CAST(x AS STRING)), "
                         "',') on the Spark side"))
    return hits


def _lint_demo(con):
    """--lint-demo: seed violating oracles (un-cast sum over BIGINT; a raw
    LIST result column) and show the guard catches both, then exit 1 so the
    demo proves the gate actually fails a run."""
    con.execute("CREATE OR REPLACE VIEW _demo AS SELECT CAST(i AS BIGINT) x "
                "FROM range(10) t(i)")
    bad = "SELECT sum(x) AS tokens FROM _demo"
    good = "SELECT CAST(sum(x) AS BIGINT) AS tokens FROM _demo"
    hits = lint_oracle_types(con, bad)
    assert [h[:2] for h in hits] == [("tokens", "HUGEINT")], hits
    assert lint_oracle_types(con, good) == []
    print(f"LINT-DEMO seeded violation caught: {bad!r} -> {hits[0][:2]}")
    print(f"LINT-DEMO cast form passes clean:  {good!r}")
    # the b_sql45 class: raw-array result column
    bad_list = "SELECT [x, x + 1] AS pair FROM _demo"
    good_list = "SELECT array_to_string([x, x + 1], ',') AS pair FROM _demo"
    hits = lint_oracle_types(con, bad_list)
    assert hits and _is_list_type(hits[0][1]), hits
    assert lint_oracle_types(con, good_list) == []
    print(f"LINT-DEMO seeded LIST violation caught: {bad_list!r} -> {hits[0][:2]}")
    print(f"LINT-DEMO array_to_string form passes clean: {good_list!r}")
    print("LINT-DEMO exiting 1 (a violating corpus must fail the gate)")
    sys.exit(1)


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
            for col, typ, fix in drifty:
                print(f"FAIL    {name}: oracle column {col!r} is {typ} — {fix}")
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
