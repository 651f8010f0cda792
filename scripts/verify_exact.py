"""Strict local replica of the driver's correctness gate.

The per-round driver hashes (column-name-sorted, row-sorted) EXACT
values — no float tolerance — so a query can pass tests/_oracle.py's
1e-6-tolerance compare yet hash-FAIL the driver (r1 `standardize_twin`).
This script runs every (queries(), oracle_sql()) pair at sf0.01 and
compares with zero tolerance, flagging any value whose canonical string
differs between Spark and DuckDB.

Usage: python scripts/verify_exact.py [--bare] [query ...]  (default: all)
Exit code 1 if any pair mismatches.

--bare runs with a DEFAULT-CONFIG SparkSession (no tuned timezone /
parquet / shuffle settings — the driver's own session shape) instead of
the engine's tuned one. Partition layout changes float summation order,
so a query can be exact on local[32]/32-partitions yet flip a rounding
boundary on the driver's layout (observed: rollup_cascade_daily's
round(,6) moved 1 ulp between local[8] and local[32] before its
partials switched to associative DECIMAL sums). Run BOTH modes before
shipping a new oracle query. SPARK_GRAFT_SHUFFLE can force an odd
shuffle-partition count for a third layout sample.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            # repr() round-trips float64 exactly; NaN/None unify to "NULL"
            out[c] = s.map(lambda v: "NULL" if pd.isna(v) else repr(float(v)))
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.map(lambda v: "NULL" if pd.isna(v) else v.isoformat())
        else:
            out[c] = s.map(lambda v: "NULL" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    res = pd.DataFrame(out)
    return res.sort_values(by=list(res.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    import __spark_entry__ as entry
    from tests._oracle import duckdb_connection

    argv = [a for a in sys.argv[1:] if a != "--bare"]
    if "--bare" in sys.argv[1:]:
        from pyspark.sql import SparkSession

        builder = SparkSession.builder.master("local[8]").appName("verify-bare")
        if os.environ.get("SPARK_GRAFT_SHUFFLE"):
            builder = builder.config(
                "spark.sql.shuffle.partitions", os.environ["SPARK_GRAFT_SHUFFLE"]
            )
        spark = builder.getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
    else:
        from loan_default_prediction_app_big_data_spark.session import get_spark

        spark = get_spark()
    con = duckdb_connection(SF_DIR)
    queries = entry.queries()
    oracles = entry.oracle_sql()
    only = set(argv)
    names = [n for n in queries if n in oracles and (not only or n in only)]

    failures: dict[str, str] = {}
    t_all = time.time()
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            sp = canon(queries[name](spark, SF_DIR).toPandas())
            du = canon(con.execute(oracles[name]).df())
        except Exception:
            failures[name] = "ERR: " + traceback.format_exc(limit=3)
            print(f"[{i+1}/{len(names)}] {name}: ERR", flush=True)
            continue
        errs = []
        if list(sp.columns) != list(du.columns):
            errs.append(f"columns {list(sp.columns)} vs {list(du.columns)}")
        elif len(sp) != len(du):
            errs.append(f"rows {len(sp)} vs {len(du)}")
        else:
            for c in sp.columns:
                bad = sp[c].to_numpy() != du[c].to_numpy()
                if bad.any():
                    j = int(bad.argmax())
                    errs.append(
                        f"col {c}: {int(bad.sum())} diffs, first row {j}: "
                        f"{sp[c].iloc[j]!r} vs {du[c].iloc[j]!r}"
                    )
        status = "ok" if not errs else "HASH-FAIL"
        print(f"[{i+1}/{len(names)}] {name}: {status} ({time.time()-t0:.1f}s)", flush=True)
        if errs:
            failures[name] = "; ".join(errs)
    print(f"\n{len(names)-len(failures)}/{len(names)} exact-match in {time.time()-t_all:.0f}s")
    if failures:
        print(json.dumps(failures, indent=2)[:8000])
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
