#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read each Verify output
parquet, run the matching oracle SQL in DuckDB over the same sf tables,
compare rows/schema/values. Dev-only tool (driver-side python deps);
the Scala library does not depend on it.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pads
import os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v

def type_mismatches(spark_tbl, ora_tbl):
    """Flag column-type divergences the driver's type-sensitive hasher
    rejects but pylist value comparison is blind to — specifically a
    decimal128 on one side vs a plain int/float on the other (DuckDB's
    HUGEINT class: Python int == Decimal is True, so values compare
    equal while the hashes differ). Timestamp unit and int-width
    divergences are normalized by the driver and not flagged."""
    import pyarrow.types as pt
    bad = []
    s_types = {f.name.lower(): f.type for f in spark_tbl.schema}
    o_types = {f.name.lower(): f.type for f in ora_tbl.schema}
    for c in sorted(set(s_types) & set(o_types)):
        st, ot = s_types[c], o_types[c]
        for dec, other in ((st, ot), (ot, st)):
            if not pt.is_decimal(dec):
                continue
            # decimal vs integer: always the HUGEINT class (driver-red).
            # decimal vs float: driver normalizes scale>0 decimals to
            # double (observed green), so only scale-0 is suspicious.
            if pt.is_integer(other) or (pt.is_floating(other) and dec.scale == 0):
                bad.append(f"{c}: spark={st} vs oracle={ot}")
            break
    return bad

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        spark_tbl = pads.dataset(d, format="parquet").to_table()
        spark_cols = sorted(spark_tbl.column_names)
        spark_rows = [tuple(norm(row[c]) for c in spark_cols)
                      for row in spark_tbl.to_pylist()]
        if name not in oracle:
            print(f"  ? {name}: no oracle (rows-only) rows={len(spark_rows)}")
            continue
        try:
            ora = con.sql(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_bad += 1
            continue
        ora_cols = sorted(ora.column_names)
        ora_rows = [tuple(norm(row[c]) for c in ora_cols)
                    for row in ora.to_pylist()]
        schema_ok = [c.lower() for c in spark_cols] == [c.lower() for c in ora_cols]
        rows_ok = len(spark_rows) == len(ora_rows)
        val_ok = spark_rows == ora_rows
        tmis = type_mismatches(spark_tbl, ora)
        if schema_ok and rows_ok and val_ok and not tmis:
            print(f"  ✓ {name}: {len(spark_rows)} rows")
            n_ok += 1
        else:
            n_bad += 1
            print(f"  ✗ {name}: schema_ok={schema_ok} rows {len(spark_rows)}v{len(ora_rows)} val_ok={val_ok} types_ok={not tmis}")
            for t in tmis:
                print(f"      TYPE: {t}")
            if not schema_ok:
                print(f"      spark cols: {spark_cols}\n      ora cols:   {ora_cols}")
            elif not val_ok:
                for i, (a, b) in enumerate(zip(spark_rows, ora_rows)):
                    if a != b:
                        print(f"      first diff row {i}:\n      spark: {a}\n      ora:   {b}")
                        break
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
