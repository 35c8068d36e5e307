#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on each oracle_sql.json entry against the same sf dir
Verify ran on, and compares with the parquet Verify wrote. Strict:
columns sorted by name, rows sorted, exact value equality (floats
bit-compared; a FLOAT_NEAR verdict is reported separately so near
misses are visible while iterating).

Usage: python3 scripts/check.py <sfdir> <verify_outdir>
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(repr(x) for x in t))


def dtype_class(t):
    """Map a DuckDB column type to the pandas dtype KIND the driver's
    harness would fetch it as. HUGEINT (any SUM over INT/BIGINT) and
    DECIMAL land as float64 — the exact mismatch class that shipped 9
    red rows in round 4 while plain value comparison stayed green."""
    t = t.upper()
    if t == "HUGEINT" or t.startswith("DECIMAL") or t in ("FLOAT", "DOUBLE"):
        return "f"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "i"
    if t == "DATE" or t.startswith("TIMESTAMP"):
        return "M"
    if t == "BOOLEAN":
        return "b"
    return "O"


def dtypes_of(con, sql):
    """Column name → DuckDB type, via DESCRIBE (plans, never executes)."""
    return {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}


def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if a == b or (math.isnan(a) and math.isnan(b)):
            return "EXACT"
        if math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12):
            return "NEAR"
        return "DIFF"
    return "EXACT" if a == b else "DIFF"


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_near = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        r2 = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        scols = [d[0] for d in r2.description]
        srows = r2.fetchall()
        oc, orw = canon(orows, ocols)
        sc, srw = canon(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: schema mismatch oracle={oc} spark={sc}")
            n_bad += 1
            continue
        # dtype gate: the driver compares pandas-fetched frames, so a
        # value-equal HUGEINT/INT32 oracle column still hash-fails there
        try:
            odt = dtypes_of(con, sql)
            sdt = dtypes_of(con, f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            badcols = [(c, odt[c], sdt[c]) for c in oc
                       if dtype_class(odt[c]) != dtype_class(sdt[c])]
        except Exception as e:
            print(f"FAIL {name}: describe error: {e}")
            n_bad += 1
            continue
        if badcols:
            detail = ", ".join(f"{c}: oracle={o} spark={s}" for c, o, s in badcols)
            print(f"FAIL {name}: dtype mismatch {detail}")
            n_bad += 1
            continue
        if len(orw) != len(srw):
            print(f"FAIL {name}: rowcount oracle={len(orw)} spark={len(srw)}")
            n_bad += 1
            continue
        verdict = "EXACT"
        bad = None
        for ro, rs in zip(orw, srw):
            for i, (a, b) in enumerate(zip(ro, rs)):
                v = eq(a, b)
                if v == "DIFF":
                    verdict, bad = "DIFF", (oc[i], a, b)
                    break
                if v == "NEAR" and verdict == "EXACT":
                    verdict, bad = "NEAR", (oc[i], a, b)
            if verdict == "DIFF":
                break
        if verdict == "EXACT":
            print(f"OK   {name} ({len(orw)} rows)")
            n_ok += 1
        elif verdict == "NEAR":
            print(f"NEAR {name}: col={bad[0]} oracle={bad[1]!r} spark={bad[2]!r}")
            n_near += 1
        else:
            print(f"FAIL {name}: col={bad[0]} oracle={bad[1]!r} spark={bad[2]!r}")
            n_bad += 1
    print(f"\n{n_ok} exact, {n_near} near, {n_bad} fail / {len(oracle)} total")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
