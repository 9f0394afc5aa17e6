#!/usr/bin/env python3
"""Local approximation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every oracle in
oracle_sql.json, loads the corresponding Spark result parquet, sorts
columns by name, canonically sorts rows, and compares values.
"""
import json, sys, math, time
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def keyed(rows):
    """Typed canonical keys: distinguishes 5 vs 5.0 and -0.0 vs 0.0, like
    the driver's value hash does (plain == would treat them as equal)."""
    def key(r):
        return tuple("\0NULL" if v is None else (repr(v) if isinstance(v, float) else str(type(v).__name__) + ":" + str(v)) for v in r)
    return sorted(key(r) for r in rows)

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):  # datetime vs pandas Timestamp: compare by value
        return v.isoformat()
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            dk = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_bad += 1
            continue
        try:
            sp = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_bad += 1
            continue
        dcols, scols = sorted(dk.column_names), sorted(sp.column_names)
        if dcols != scols:
            print(f"FAIL {name}: columns differ duckdb={dcols} spark={scols}")
            n_bad += 1
            continue
        dk = dk.select(dcols).to_pylist()
        sp = sp.select(scols).to_pylist()
        drows = keyed([[norm(v) for v in r.values()] for r in dk])
        srows = keyed([[norm(v) for v in r.values()] for r in sp])
        if len(drows) != len(srows):
            print(f"FAIL {name}: rowcount duckdb={len(drows)} spark={len(srows)}")
            n_bad += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(drows, srows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: first diff at sorted row {bad[0]}:\n  duckdb={bad[1]}\n  spark ={bad[2]}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(srows)} rows, {time.time() - t0:.1f}s)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
