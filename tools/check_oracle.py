#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, registers each <sfDir>/*.parquet as a
DuckDB view named after the file, runs every oracle SQL, and compares the
result with the Spark-written parquet at <verifyOutDir>/<name>/ —
column-name-sorted, exact values (floats must be bit-identical, which the
query design guarantees via decimal-exact aggregation).

Dev tool only — the engine itself never calls this.
"""
import json, math, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return pq.read_table(os.path.join(outdir, name)).to_pandas()

def norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

def cmp_cell(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # bit-exact by design
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sfdir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    failures = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"MISSING  {name}: no spark output")
            failures += 1
            continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"SQLERR   {name}: {e}")
            failures += 1
            continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"COLS     {name}: spark={list(s.columns)} duck={list(d.columns)}")
            failures += 1
            continue
        # Type gate: the driver's hash is type-KIND-sensitive — a DuckDB
        # HUGEINT result (pandas object/float64) vs Spark BIGINT (int64) is a
        # real failure even when every value compares equal under Python ==
        # (the r8 lesson: 5 red rows from exactly this). Integer WIDTH is
        # normalized (int8..int64 all hash alike on the driver — 17 queries
        # with int32-vs-int64 columns passed r8), so only kind mismatches
        # (int vs float vs object vs bool vs datetime) fail here. Oracles
        # must CAST aggregate outputs (SUM → HUGEINT!) back to BIGINT.
        def kind(t):
            t = str(t)
            if t in ("int8", "int16", "int32", "int64",
                     "uint8", "uint16", "uint32", "uint64"):
                return "int"
            return t
        sd, dd = [kind(t) for t in s.dtypes], [kind(t) for t in d.dtypes]
        if sd != dd:
            diffs = [(c, a, b) for c, a, b in zip(s.columns, sd, dd) if a != b]
            print(f"DTYPE    {name}: {diffs}")
            failures += 1
            continue
        if len(s) != len(d):
            print(f"ROWS     {name}: spark={len(s)} duck={len(d)}")
            failures += 1
            continue
        bad = None
        for col in s.columns:
            sv, dv = s[col].tolist(), d[col].tolist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                if not cmp_cell(a, b):
                    bad = (col, i, a, b)
                    break
            if bad:
                break
        if bad:
            col, i, a, b = bad
            print(f"VALUE    {name}: col={col} row={i} spark={a!r} duck={b!r}")
            failures += 1
        else:
            print(f"OK       {name}: {len(s)} rows x {len(s.columns)} cols")
    print(f"\n{'PASS' if failures == 0 else 'FAIL'} ({failures} failures)")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
