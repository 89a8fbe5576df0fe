"""Targeted oracle check: like full_sweep but only for the named
queries.  python tools/spot_sweep.py q1 q2 ...   (env SPOT_SF overrides
the sf dir, default /root/testdata/sf0.01)."""
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
from tools.full_sweep import TABLES, norm  # noqa: E402


def main() -> int:
    sf = os.environ.get("SPOT_SF", "/root/testdata/sf0.01")
    names = sys.argv[1:]
    spark = get_spark("spot-sweep")
    con = duckdb.connect()
    for t in TABLES:
        src = f"{sf}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    qs, orc = E.queries(), E.oracle_sql()
    bad = {}
    t0 = time.time()
    for name in names:
        try:
            df = qs[name](spark, sf)
            cols = sorted(df.columns)
            rows = sorted(tuple(norm(r[c]) for c in cols) for r in df.collect())
            if name not in orc:
                print(f"{name}: rows_only:{len(rows)}")
                continue
            odf = con.execute(orc[name]).fetchdf()
            ocols = sorted(odf.columns)
            orows = sorted(
                tuple(norm(rec[c]) for c in ocols)
                for rec in odf.to_dict("records")
            )
            ok = cols == ocols and rows == orows
            print(f"{name}: {'OK' if ok else 'MISMATCH'}:{len(rows)}")
            if not ok:
                bad[name] = "MISMATCH"
        except Exception as e:  # noqa: BLE001
            bad[name] = f"ERR:{type(e).__name__}:{str(e)[:150]}"
            print(f"{name}: {bad[name]}")
    print(json.dumps({"checked": len(names), "total_s": round(time.time() - t0, 1), "bad": bad}))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
