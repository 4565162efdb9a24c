#!/usr/bin/env python3
"""Dev harness approximating the driver's correctness gate: run each oracle
SQL in DuckDB over the testdata tables and diff against the Spark parquet
dumps produced by `graft.Verify`. Usage:
    sbt -batch 'runMain graft.Verify <sfdir> <outdir>'
    python3 dev/compare_oracle.py <sfdir> <outdir>

HASH-FAITHFUL (r9): the driver hashes FORMATTED output, so this comparator
formats values (full float repr — signed zero preserved, NaN==NaN by string,
ints width-independent) and compares the formatted tuples EXACTLY. The old
norm() rounded values to 6 places with Python equality (-0.0 == 0.0), which
passed s24 in r8 while the driver's hash failed it (and a15 in r7) — a
value-tolerant gate is strictly weaker than the driver and cannot be trusted
to predict it. When a strict mismatch IS value-equal at 1e-6 it is reported
as HASH-CLASS so the formatting delta (signed zero, float repr) is obvious.
"""
import sys, json, glob, os, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def fmt(v):
    """Driver-faithful formatting of one cell: exact, width-independent."""
    if v is None:
        return "NULL"
    # numpy bool/int/float + python equivalents
    t = type(v).__name__
    if t in ("bool", "bool_"):
        return repr(bool(v))
    if t in ("int", "int8", "int16", "int32", "int64", "uint8", "uint16",
             "uint32", "uint64"):
        return repr(int(v))
    if t in ("float", "float32", "float64"):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)  # repr distinguishes -0.0 from 0.0
    return repr(v)


def strict(vals):
    return tuple(fmt(v) for v in vals)


def loose(vals):
    """The old tolerant compare, kept ONLY to classify strict failures."""
    out = []
    for v in vals:
        if isinstance(v, float) or type(v).__name__ in ("float32", "float64"):
            f = float(v)
            out.append("NaN" if math.isnan(f) else round(f + 0.0, 6))
        else:
            out.append(fmt(v))
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
        grows = [tuple(r) for r in got[gcols].itertuples(index=False, name=None)]
        wrows = [tuple(r) for r in want[wcols].itertuples(index=False, name=None)]
        gr, wr = sorted(strict(r) for r in grows), sorted(strict(r) for r in wrows)
        if gr == wr:
            print(f"{name:20s} OK ({len(gr)} rows)")
            continue
        fails += 1
        gl, wl = sorted(loose(r) for r in grows), sorted(loose(r) for r in wrows)
        kind = "HASH-CLASS MISMATCH (values equal at 1e-6 — formatting/signed-zero)" \
            if gl == wl else "VALUE MISMATCH"
        print(f"{name:20s} {kind} spark={len(gr)} duckdb={len(wr)} rows")
        for a, b in list(zip(gr, wr))[:100000]:
            if a != b:
                print(f"  spark:  {a}\n  duckdb: {b}")
                break
    print("FAILURES:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
