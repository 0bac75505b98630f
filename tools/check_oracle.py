#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage:
  python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Assumes `sbt "runMain graft.Verify <sfDir> <verifyOutDir>"` already ran.
For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB over
views of the sfDir parquet tables, load the Spark parquet result, sort columns
by name and rows by all columns, and compare cell-by-cell (exact; floats also
get a 1e-9 relative fallback so we can tell "bit mismatch" from "wrong").
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None, a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False, False
        exact = fa == fb or (math.isnan(fa) and math.isnan(fb))
        approx = exact or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
        return exact, approx
    eq = a == b or str(a) == str(b)
    return eq, eq


def _canon_type(t):
    t = str(t).lower()
    # Spark writes TIMESTAMP_NTZ/µs vs DuckDB's timestamp — same driver type.
    if t.startswith("timestamp"):
        return "timestamp"
    # Integer WIDTH is immaterial to the driver's hash (r03: ten queries with
    # spark int32 vs oracle int64 all passed); what breaks it is HUGEINT,
    # which arrives as decimal128(38,0) and stays distinct here.
    if t in ("int8", "int16", "int32", "int64", "uint8", "uint16", "uint32"):
        return "int"
    aliases = {"large_string": "string", "large_binary": "binary"}
    return aliases.get(t, t)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        try:
            # One execution per side: the Arrow table yields both the row
            # data and the typed schema (a second execute doubled gate
            # runtime on the expensive dedup queries).
            otab = con.execute(oracle[name]).fetch_arrow_table()
            ocols = otab.column_names
            orows = list(zip(*[otab.column(c).to_pylist() for c in ocols])) \
                if ocols else []
            stab = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_arrow_table()
            scols = stab.column_names
            srows = list(zip(*[stab.column(c).to_pylist() for c in scols])) \
                if scols else []
        except Exception as e:
            print(f"FAIL  {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            failures += 1
            continue
        # The driver's hash is TYPED: a DuckDB HUGEINT (SUM of integers,
        # incl. windowed SUM) vs Spark BIGINT fails it even when every value
        # matches. DBAPI description is too coarse (all ints are "NUMBER"),
        # so compare Arrow schemas, which keep int64 vs decimal128 distinct.
        otypes = {f.name: str(f.type) for f in otab.schema}
        stypes = {f.name: str(f.type) for f in stab.schema}
        type_diff = [(c, stypes[c], otypes[c]) for c in stypes
                     if _canon_type(stypes[c]) != _canon_type(otypes[c])]
        if type_diff:
            c, st, ot = type_diff[0]
            print(f"FAIL  {name}: column type spark[{c}]={st} oracle[{c}]={ot}"
                  " (driver hash is typed — CAST the oracle)")
            failures += 1
            continue
        _, oc = canon(orows, ocols)
        _, sc = canon(srows, scols)
        if len(oc) != len(sc):
            print(f"FAIL  {name}: rows spark={len(sc)} oracle={len(oc)}")
            failures += 1
            continue
        exact = approx = True
        first_diff = None
        for r, (ra, rb) in enumerate(zip(sc, oc)):
            for c, (va, vb) in enumerate(zip(ra, rb)):
                e, ap = cells_equal(va, vb)
                exact &= e
                approx &= ap
                if not ap and first_diff is None:
                    first_diff = (r, c, va, vb)
        if exact:
            print(f"OK    {name}: {len(sc)} rows exact")
        elif approx:
            print(f"NEAR  {name}: {len(sc)} rows approx-only (float bit diff)")
            failures += 1
        else:
            r, c, va, vb = first_diff
            print(f"FAIL  {name}: first diff row {r} col {c}: spark={va!r} oracle={vb!r}")
            failures += 1
    print(f"{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
