#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle compare.

Usage: python3 tools/check_local.py <outDir> [query ...]

Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` (optionally with
SPARK_GRAFT_ONLY=<names>) to have populated <outDir>/<name>/ parquet and
<outDir>/oracle_sql.json. Re-runs each oracle SQL in DuckDB over the same
sf tables and compares rows/schema/values the way the driver does: columns
sorted by name, values stringified with float rounding, then hashed.
"""
import decimal, json, os, sys, hashlib

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            # Type-representation differences between Spark-written
            # parquet read back through DuckDB and the oracle expression
            # must not read as value differences (r15 ADVICE): one
            # numeric path for Decimal/float, -0.0 snapped to 0.0,
            # bool casing via str(bool). Integral values render EXACTLY
            # (r16 ADVICE: .6g masked integer drift above 1e6 and
            # cent-level decimal drift); non-integral Decimals get .12g
            # — they only arise from exact decimal-domain oracle
            # expressions, where 6 significant digits is too forgiving.
            # Non-integral floats stay .6g: cross-engine double
            # summation order legitimately differs in low bits.
            if isinstance(v, decimal.Decimal):
                if v == v.to_integral_value():
                    vals.append(str(int(v)))
                else:
                    vals.append(f"{float(v):.12g}")
            elif isinstance(v, float):
                if v == 0.0:
                    v = 0.0  # -0.0 and 0.0 must render identically
                if v.is_integer() and abs(v) < 1e15:
                    vals.append(str(int(v)))
                else:
                    vals.append(f"{v:.6g}")
            elif v is None:
                vals.append("NULL")
            else:
                vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return hashlib.md5("\x1e".join(out).encode()).hexdigest(), len(out)


def main():
    out_dir = sys.argv[1]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    names = sys.argv[2:] or sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    fails = 0
    for name in names:
        if name not in oracles:
            print(f"{name}: NO_ORACLE (rows-only check)")
            continue
        sp = con.execute(
            "SELECT * FROM read_parquet(?)",
            [os.path.join(out_dir, name, "*.parquet")])
        sp_cols = [d[0] for d in sp.description]
        sp_rows = sp.fetchall()
        try:
            du = con.execute(oracles[name])
        except Exception as e:
            print(f"{name}: ORACLE_SQL_ERROR {e}")
            fails += 1
            continue
        du_cols = [d[0] for d in du.description]
        du_rows = du.fetchall()
        if sorted(sp_cols) != sorted(du_cols):
            print(f"{name}: SCHEMA_MISMATCH spark={sorted(sp_cols)} "
                  f"duck={sorted(du_cols)}")
            fails += 1
            continue
        # r17 ADVICE: Decimal renders at .12g, float at .6g — a column
        # that is DECIMAL on one side and DOUBLE on the other hashes
        # identical values differently. The rendering must stay faithful
        # to the driver's (changing it here would make local green lie),
        # so instead surface the hazard loudly: any query whose twin
        # sides disagree on Decimal-vs-float for a column is a query
        # contract bug to fix at the source (align the types).
        def numkind(rows, cols):
            kinds = {}
            for r in rows:
                for c, v in zip(cols, r):
                    if isinstance(v, decimal.Decimal):
                        kinds[c] = "decimal"
                    elif isinstance(v, float):
                        kinds.setdefault(c, "float")
            return kinds
        k1, k2 = numkind(sp_rows, sp_cols), numkind(du_rows, du_cols)
        for c in sorted(set(k1) & set(k2)):
            if k1[c] != k2[c]:
                print(f"{name}: WARN column {c} is {k1[c]} on spark side "
                      f"but {k2[c]} on oracle side — renders at different "
                      f"precision; align the twin types")
        h1, n1 = canon(sp_rows, sp_cols)
        h2, n2 = canon(du_rows, du_cols)
        if n1 != n2:
            print(f"{name}: ROWS_MISMATCH spark={n1} duck={n2}")
            fails += 1
        elif h1 != h2:
            print(f"{name}: HASH_MISMATCH ({n1} rows)")
            fails += 1
        else:
            print(f"{name}: OK ({n1} rows)")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
