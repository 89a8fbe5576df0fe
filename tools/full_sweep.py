"""Full-registry correctness sweep: run EVERY queries() entry and its
DuckDB twin side-by-side at sf0.01 and value-compare, driver-style —
the local superset of the driver's 50-slot rotation window (the window
bounds per-round driver evidence; this bounds total staleness to one
local run). Prints one JSON line {"checked": N, "total_s": s, "bad":
{name: reason}} — "bad" empty means every oracle-checkable query is
value-identical to its twin.

Run from anywhere:  python tools/full_sweep.py  [sf_dir]

Normalization mirrors the driver's: columns sorted by name, floats
rounded to 6dp with -0.0 folded, date/timestamp unified, SQL NULL in
any representation (None / NaN / NaT) unified — pandas ``fetchdf``
surfaces DuckDB NULLs as NaN in numeric columns and NaT in timestamp
columns, which a naive tuple compare misreads as mismatches.
"""
import datetime
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.session import (  # noqa: E402
    get_spark,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if v is None:
        return (0, "")
    if isinstance(v, float) and v != v:  # NaN = SQL NULL via fetchdf
        return (0, "")
    try:
        import pandas as pd

        if not isinstance(v, (list, tuple, str)) and pd.api.types.is_scalar(v) and pd.isna(v):
            return (0, "")
        if isinstance(v, pd.Timestamp):
            v = v.to_pydatetime()
    except Exception:
        pass
    if isinstance(v, bool):
        return (1, str(v))
    if isinstance(v, datetime.datetime):
        return (2, v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return (2, datetime.datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, (int, float)):
        return (3, round(float(v), 6) + 0.0)  # +0.0 folds -0.0
    if isinstance(v, (list, tuple)):
        return (4, tuple(norm(x) for x in v))
    return (5, str(v))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("full-sweep")
    con = duckdb.connect()
    for t in TABLES:
        src = f"{sf}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    qs, orc = E.queries(), E.oracle_sql()
    results: dict[str, str] = {}
    t_all = time.time()
    for name in qs:
        try:
            df = qs[name](spark, sf)
            cols = sorted(df.columns)
            rows = sorted(
                tuple(norm(r[c]) for c in cols) for r in df.collect()
            )
            if name not in orc:
                results[name] = f"rows_only:{len(rows)}"
                continue
            odf = con.execute(orc[name]).fetchdf()
            ocols = sorted(odf.columns)
            orows = sorted(
                tuple(norm(rec[c]) for c in ocols)
                for rec in odf.to_dict("records")
            )
            ok = cols == ocols and rows == orows
            results[name] = ("OK" if ok else "MISMATCH") + f":{len(rows)}"
        except Exception as e:  # keep sweeping; report per query
            results[name] = f"ERR:{type(e).__name__}:{str(e)[:150]}"
    bad = {
        k: v
        for k, v in results.items()
        if not (v.startswith("OK") or v.startswith("rows_only"))
    }
    print(
        json.dumps(
            {
                "checked": len(results),
                "rows_only": sorted(
                    k for k, v in results.items() if v.startswith("rows_only")
                ),
                "total_s": round(time.time() - t_all, 1),
                "bad": bad,
            }
        )
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
