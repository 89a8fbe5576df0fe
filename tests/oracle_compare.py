"""Mimic the driver's DuckDB-oracle comparison: row count + schema
(column names) + order-insensitive value comparison, columns sorted by
name. Keeping this strict (exact equality, including doubles) predicts the
driver's value-hash check."""

from __future__ import annotations

import decimal
import math

import duckdb

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.sources.tables import (
    TABLES,
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # Deliberately NOT normalized to int/float: the driver's fetch
        # path hashes DuckDB HUGEINT/DECIMAL differently from Spark's
        # bigint/double, so a Decimal reaching here must FAIL parity —
        # the oracle SQL needs an explicit CAST (see
        # test_oracle_output_types_driver_safe).
        return f"Decimal({v})"
    return str(v)


def _key(row):
    return tuple(_norm(v) for v in row)


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, name: str = "query"):
    con = duckdb_conn(sf_dir)
    rel = con.sql(sql)
    oracle_cols = list(rel.columns)
    oracle_rows = rel.fetchall()
    con.close()

    spark_cols = list(spark_df.columns)
    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in oracle_cols
    ), f"{name}: column mismatch spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"

    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i].lower())
    o_order = sorted(range(len(oracle_cols)), key=lambda i: oracle_cols[i].lower())

    spark_rows = [tuple(r) for r in spark_df.collect()]
    got = sorted(_key(tuple(r[i] for i in s_order)) for r in spark_rows)
    exp = sorted(_key(tuple(r[i] for i in o_order)) for r in oracle_rows)

    assert len(got) == len(exp), f"{name}: row count {len(got)} != oracle {len(exp)}"
    if got != exp:
        diffs = [(g, e) for g, e in zip(got, exp) if g != e][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
