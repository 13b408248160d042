#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: load the Spark parquet result,
run the matching SQL from oracle_sql.json in DuckDB (with views over the
<sfDir> testdata tables), sort columns by name, sort rows, compare values.
Exit 1 if any registered-oracle query mismatches.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None or (isinstance(v, float) and v != v):
        return "\x00NULL"
    if isinstance(v, float):
        return str(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures, checked, rows_only = 0, 0, 0
    # an oracle entry whose query never wrote output is a FAILURE, not a
    # skip — a query that throws in Verify must not look green here
    dumped = {os.path.basename(q.rstrip("/"))
              for q in glob.glob(f"{out_dir}/*/")}
    for name in sorted(set(oracles) - dumped):
        print(f"[FAIL] {name}: registered oracle but no dumped output")
        failures += 1
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        spark_files = glob.glob(f"{qdir}/*.parquet")
        if not spark_files:
            print(f"[FAIL] {name}: no spark parquet output")
            failures += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
        if name not in oracles:
            rows_only += 1
            print(f"[rows-only] {name}: {len(sdf)} rows (no oracle)")
            if len(sdf) == 0:
                print(f"  WARNING: zero rows")
            continue
        checked += 1
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            failures += 1
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"[FAIL] {name}: schema {scols} vs oracle {ocols}")
            failures += 1
            continue
        srows = sorted(tuple(norm(v) for v in r)
                       for r in sdf[scols].itertuples(index=False))
        orows = sorted(tuple(norm(v) for v in r)
                       for r in odf[ocols].itertuples(index=False))
        if len(srows) != len(orows):
            print(f"[FAIL] {name}: rows {len(srows)} vs oracle {len(orows)}")
            failures += 1
            continue
        if srows != orows:
            bad = [(a, b) for a, b in zip(srows, orows) if a != b]
            print(f"[FAIL] {name}: {len(bad)} differing rows; first 3:")
            for a, b in bad[:3]:
                print(f"  spark : {a}\n  oracle: {b}")
            failures += 1
            continue
        print(f"[ok] {name}: {len(srows)} rows match")
    print(f"\n{checked} oracle-checked, {rows_only} rows-only, "
          f"{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
