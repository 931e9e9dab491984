#!/usr/bin/env python3
"""Local replica of the driver's t2 gate.

r1 lesson: the previous version of this script normalized array cells to
tuples and compared values leniently — it reported 94/94 while the REAL
driver comparator (pandas sort_values + row hash) crashed on 6 queries and
hash-failed a 7th. A replica that is more permissive than the gate is
worse than no replica. This version reproduces the driver's compare
verbatim-in-behavior:

  oracle  = duckdb.execute(sql).df()          # pandas via duckdb
  spark   = parquet dump -> pandas            # via pyarrow
  both    -> columns sorted by name
          -> sort_values(by=all columns)      # CRASHES on array/map cells
          -> row-hash (pd.util.hash_pandas_object, dtype-sensitive)

and reports the driver's row shape: rows_match / schema_match / hash_match
/ err per query. Pass --diag to ALSO run a lenient value-by-value diff on
failures (debugging aid only — never treat diag-green as gate-green).

Usage: python3 tools/check_parity.py <sfDir> <verifyOutDir> [--diag] [key ...]
"""
import sys, json, hashlib, traceback
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def _norm_temporal(df):
    """Normalize temporal dtypes before hashing. Calibrated against the 96
    observed r1 driver outcomes: the driver PASSED queries whose two sides
    differ only in datetime64 unit (us vs ns) or date-as-object vs
    datetime64, while it FAILED b2 (decimal vs int) — so temporals are
    normalized, numerics are not."""
    import datetime
    df = df.copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[ns]")
        elif s.dtype == object:
            nn = s.dropna()
            if len(nn) and all(isinstance(x, (datetime.date, datetime.datetime))
                               for x in nn.head(100)):
                df[c] = pd.to_datetime(s)
    return df


def frame_hash(df):
    """Sort columns by name, sort rows by all columns (raises on unhashable
    cells, exactly like the driver), then hash rows dtype-sensitively."""
    df = _norm_temporal(df[sorted(df.columns)])
    if len(df.columns):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    h = pd.util.hash_pandas_object(df, index=False)
    return hashlib.md5(h.values.tobytes()).hexdigest()


def compare(name, con, sql, dump_dir):
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": None}
    try:
        oracle = con.execute(sql).df()
    except Exception as e:
        rec["err"] = f"ORACLE-ERROR: {e}"
        return rec
    try:
        spark = pq.read_table(f"{dump_dir}/{name}").to_pandas()
    except Exception as e:
        rec["err"] = f"DUMP-MISSING: {e}"
        return rec
    rec["oracle_rows"], rec["spark_rows"] = len(oracle), len(spark)
    try:
        rec["rows_match"] = len(oracle) == len(spark)
        rec["schema_match"] = sorted(oracle.columns) == sorted(spark.columns)
        rec["hash_match"] = frame_hash(oracle) == frame_hash(spark)
    except Exception:
        # the driver records the traceback tail as err (array cells land here)
        rec.update(rows_match=None, schema_match=None, hash_match=None,
                   spark_rows=None, oracle_rows=None,
                   err=traceback.format_exc()[-500:])
    return rec


def diag_diff(name, con, sql, dump_dir):
    """Lenient value diff for debugging a FAIL (r1-style normalization)."""
    import math
    def norm(v):
        if v is None:
            return None
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else v
        if isinstance(v, (list, tuple)):
            return tuple(norm(x) for x in v)
        try:
            import numpy as np
            if isinstance(v, np.ndarray):
                return tuple(norm(x) for x in v.tolist())
            if isinstance(v, np.generic):
                return norm(v.item())
        except ImportError:
            pass
        return v
    oracle = con.execute(sql).fetch_arrow_table()
    spark = con.execute(
        f"SELECT * FROM read_parquet('{dump_dir}/{name}/*.parquet')").fetch_arrow_table()
    cols = sorted(oracle.column_names)
    op = sorted([tuple(norm(r[c]) for c in cols) for r in oracle.to_pylist()],
                key=lambda t: tuple((x is None, str(x)) for x in t))
    sp = sorted([tuple(norm(r[c]) for c in cols) for r in spark.to_pylist()],
                key=lambda t: tuple((x is None, str(x)) for x in t))
    o_types = {c: str(oracle.schema.field(c).type) for c in cols}
    s_types = {c: str(spark.schema.field(c).type) for c in cols if c in spark.column_names}
    tdiff = {c: (o_types[c], s_types.get(c)) for c in cols if o_types[c] != s_types.get(c)}
    if len(op) != len(sp):
        return f"  diag: ROW COUNT differs: oracle={len(op)} spark={len(sp)}; typediff={tdiff}"
    for i, (orow, srow) in enumerate(zip(op, sp)):
        if orow != srow:
            return f"  diag: first value diff at sorted row {i}:\n    oracle={orow!r}\n    spark ={srow!r}\n    typediff={tdiff}"
    return f"  diag: values EQUAL under lenient compare; typediff={tdiff} (dtype/hash-level mismatch)"


def main():
    argv = [a for a in sys.argv[1:]]
    diag = "--diag" in argv
    argv = [a for a in argv if a != "--diag"]
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, bad, vacuous = [], [], []
    for name in sorted(oracle_sql):
        if only and name not in only:
            continue
        rec = compare(name, con, oracle_sql[name], out_dir)
        green = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        if green:
            if rec["spark_rows"] == 0:
                # a legitimately-empty result at a small SF is not a FAIL,
                # but it proves nothing — keep it loud without failing the
                # run (hard comparison errors remain exit 1)
                vacuous.append(name)
                print(f"WARN {name}: green but 0 rows = 0 rows proves nothing")
            else:
                ok.append(name)
                print(f"ok   {name}")
        else:
            bad.append((name, rec))
            err = (rec["err"] or "").strip().splitlines()
            tail = err[-1] if err else ""
            print(f"FAIL {name}: rows={rec['rows_match']} schema={rec['schema_match']} "
                  f"hash={rec['hash_match']} ({rec['oracle_rows']} vs {rec['spark_rows']}) {tail}")
            if diag:
                try:
                    print(diag_diff(name, con, oracle_sql[name], out_dir))
                except Exception as e:
                    print(f"  diag failed: {e}")
    vtail = f", {len(vacuous)} vacuous-green" if vacuous else ""
    print(f"\n{len(ok)} ok, {len(bad)} fail{vtail}")
    # exit codes: 1 = hard comparison failure; 2 = vacuous-green only (a
    # 0-row green proves nothing — callers that EXPECT an empty result at
    # this SF may treat 2 as pass, but a bare `== 0` check still flags it)
    sys.exit(1 if bad else (2 if vacuous else 0))


if __name__ == "__main__":
    main()
