#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only; the
shipped engine is pure Scala/Spark). Usage:
  python3 tools/check.py <verifyOutDir> <sfDir>
Reads each <outDir>/<name> parquet (Spark output) and oracle_sql.json,
runs the oracle in DuckDB with views named after the tables, and
compares row-sets (columns sorted by name, rows sorted, values
compared exactly; floats compared bit-exactly to match a hash gate).
"""
import sys, os, json, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out

def norm(v):
    if isinstance(v, float):
        return v  # exact: bit-match is the bar
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        got = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')")
        gcols, grows = canon(got.fetchall(), [c for c in got.columns])
        if name not in oracles:
            print(f"  {name:28s} rows-only: {len(grows)} rows")
            continue
        try:
            exp = con.sql(oracles[name])
            ecols, erows = canon(exp.fetchall(), [c for c in exp.columns])
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        ok = True
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} vs oracle {ecols}"); ok = False
        elif len(grows) != len(erows):
            print(f"FAIL {name}: {len(grows)} rows vs oracle {len(erows)}"); ok = False
        else:
            for i, (g, e) in enumerate(zip(grows, erows)):
                if g != e:
                    print(f"FAIL {name}: first diff at sorted-row {i}:")
                    print(f"  spark : {g}")
                    print(f"  oracle: {e}")
                    ok = False
                    break
        if ok:
            n_pass += 1
            print(f"  {name:28s} OK ({len(grows)} rows)")
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
