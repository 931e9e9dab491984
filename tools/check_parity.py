#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run each oracle SQL in DuckDB
against the sf parquet tables and compare (schema-ish, rowcount, values)
with the Verify parquet dumps. Usage:
  python3 tools/check_parity.py <sfDir> <verifyOutDir> [key ...]
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return tuple(norm_cell(x) for x in v.tolist())
        if isinstance(v, np.generic):
            return norm_cell(v.item())
    except ImportError:
        pass
    return v


def compare(name, con, sql, dump_dir):
    try:
        oracle = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        return f"ORACLE-ERROR: {e}"
    try:
        spark = con.execute(
            f"SELECT * FROM read_parquet('{dump_dir}/{name}/*.parquet')").fetch_arrow_table()
    except Exception as e:
        return f"DUMP-MISSING: {e}"

    o_cols = sorted(oracle.column_names)
    s_cols = sorted(spark.column_names)
    if o_cols != s_cols:
        return f"SCHEMA-NAMES: oracle={o_cols} spark={s_cols}"
    if oracle.num_rows != spark.num_rows:
        return f"ROWCOUNT: oracle={oracle.num_rows} spark={spark.num_rows}"
    o_types = {c: str(oracle.schema.field(c).type) for c in o_cols}
    s_types = {c: str(spark.schema.field(c).type) for c in s_cols}
    type_diff = {c: (o_types[c], s_types[c]) for c in o_cols if o_types[c] != s_types[c]}

    op = oracle.select(o_cols).to_pylist()
    sp = spark.select(s_cols).to_pylist()
    for i, (orow, srow) in enumerate(zip(op, sp)):
        for c in o_cols:
            ov, sv = norm_cell(orow[c]), norm_cell(srow[c])
            if ov != sv:
                return (f"VALUE row {i} col {c}: oracle={ov!r} spark={sv!r}"
                        + (f" [typediff {type_diff}]" if type_diff else ""))
    if type_diff:
        return f"TYPES-ONLY (values equal): {type_diff}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, bad = [], []
    for name in sorted(oracle_sql):
        if only and name not in only:
            continue
        err = compare(name, con, oracle_sql[name], out_dir)
        if err:
            bad.append((name, err))
            print(f"FAIL {name}: {err}")
        else:
            ok.append(name)
            print(f"ok   {name}")
    print(f"\n{len(ok)} ok, {len(bad)} fail")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
