#!/usr/bin/env python3
"""Dev harness approximating the driver's correctness gate: run each oracle
SQL in DuckDB over the testdata tables and diff against the Spark parquet
dumps produced by `graft.Verify`. Usage:
    sbt -batch 'runMain graft.Verify <sfdir> <outdir>'
    python3 dev/compare_oracle.py <sfdir> <outdir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(vals):
    out = []
    for v in vals:
        if isinstance(v, float):
            out.append(round(v, 6))
        else:
            out.append(v)
    return tuple(out)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    fails = 0
    for name in sorted(os.listdir(outdir)):
        pdir = os.path.join(outdir, name)
        if not os.path.isdir(pdir):
            continue
        files = glob.glob(f"{pdir}/*.parquet")
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracle:
            print(f"{name:20s} rows-only: {len(got)} rows " + ("OK" if len(got) > 0 else "EMPTY!"))
            continue
        want = con.sql(oracle[name]).df()
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"{name:20s} SCHEMA MISMATCH spark={gcols} duckdb={wcols}")
            fails += 1
            continue
        gr = sorted(norm(r) for r in got[gcols].itertuples(index=False, name=None))
        wr = sorted(norm(r) for r in want[wcols].itertuples(index=False, name=None))
        if gr == wr:
            print(f"{name:20s} OK ({len(gr)} rows)")
        else:
            fails += 1
            print(f"{name:20s} VALUE MISMATCH spark={len(gr)} duckdb={len(wr)} rows")
            for a, b in list(zip(gr, wr))[:1000]:
                if a != b:
                    print(f"  spark:  {a}\n  duckdb: {b}")
                    break
    print("FAILURES:", fails)
    return 1 if fails else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
