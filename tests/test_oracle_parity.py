"""Every registered query must hash-match its DuckDB oracle — this is the
driver's t2 correctness gate, run here at sf0.001 (fast) and sf0.01 (the
driver's actual scale, marked slow)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from conftest import SF_CORRECTNESS, SF_SMALL
from oracle_compare import assert_matches_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

#: Declared rows-only queries (driver records the weaker rows-only
#: check): genuinely non-SQL-expressible outputs. Each must carry its
#: own value-evidence tests instead (see the query docstring).
ROWS_ONLY = {
    # DataSketches HLL binaries have no DuckDB twin and estimates are
    # not bit-stable across partitionings; error bound + merge
    # consistency pinned in test_round5_ops.py.
    "events_monthly_users_hll",
}


def test_registry_complete():
    missing = set(QUERIES) - set(ORACLES) - ROWS_ONLY
    assert not missing, f"queries without oracle: {missing}"
    assert not (ROWS_ONLY & set(ORACLES)), "rows-only query grew an oracle"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - ROWS_ONLY))
def test_parity_sf0001(spark, name):
    df = QUERIES[name](spark, SF_SMALL)
    assert_matches_oracle(df, ORACLES[name], SF_SMALL, name)


@pytest.mark.parametrize("name", sorted(ROWS_ONLY))
def test_rows_only_queries_run(spark, name):
    """Rows-only queries must still execute and return rows (the
    driver's weaker check) — fast tier at sf0.001."""
    assert QUERIES[name](spark, SF_SMALL).count() > 0


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(ROWS_ONLY))
def test_rows_only_queries_run_sf001(spark, name):
    """Driver-scale (sf0.01) rows-only check, tiered slow to match the
    parity tests' fast/slow split."""
    assert QUERIES[name](spark, SF_CORRECTNESS).count() > 0


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(set(QUERIES) - ROWS_ONLY))
def test_parity_sf001(spark, name):
    df = QUERIES[name](spark, SF_CORRECTNESS)
    assert_matches_oracle(df, ORACLES[name], SF_CORRECTNESS, name)


#: DuckDB types that round-trip identically to Spark's through ANY
#: fetch path (fetchall / pandas / arrow). HUGEINT and DECIMAL do NOT:
#: the driver's value-hash fetches them as Decimal/float and mismatches
#: a Spark bigint/double even when values are equal (the r06
#: user_event_pivot / graph_closeness_landmarks / events_value_winsorized
#: hash failures). Oracles must CAST sums to BIGINT / DOUBLE.
_SAFE_DUCK_TYPES = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
    "BLOB",
    # JSON fetches as a plain Python str (driver-green in r05:
    # search_bizcards_envelope).
    "JSON",
}


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types_driver_safe(name):
    from oracle_compare import duckdb_conn

    con = duckdb_conn(SF_SMALL)
    try:
        rel = con.sql(ORACLES[name])
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t).split("(")[0] not in _SAFE_DUCK_TYPES
            and not str(t).endswith("[]")
        ]
        assert not bad, (
            f"{name}: oracle emits driver-unsafe output types {bad}; "
            "CAST sums to BIGINT and decimals to DOUBLE"
        )
    finally:
        con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


FLOAT_SENSITIVE = [
    "graph_pagerank_top20",
    "pymk_user_3_adamic_adar",
    "docs_unigram_logprob",
    "customer_running_totals",
    # r5 late additions: PPS priorities (bit-exact claim), a
    # round(sum(double)) over per-user event groups, and the sampled
    # closeness ratio
    "docs_weighted_sample",
    "events_user_range_pruned",
    "graph_closeness_landmarks",
    # r7: NTILE over the 6dp-rounded LM score from the two-phase
    # distributed rank — ordering must not depend on partition count
    "docs_lm_buckets",
    # r7: sequential SES folds — the per-series array is sorted before
    # folding, so partitioning must be invisible
    "orders_revenue_ses",
    "orders_priority_revenue_ses",
    # r8: DSIR per-doc Σ c·lr double sums and the sqrt-weight ratios —
    # both round at a declared edge (6dp / 9dp); the BPE argmax rides
    # integer counts with a lexicographic tie-break, so the merge
    # TRAJECTORY (not just per-round sums) must survive repartitioning
    "docs_dsir_weights",
    "docs_source_mixture",
    "docs_bpe_vocab_k8",
    # r8: composed manifest — prefix-sum shard ids ride the doc_id
    # total order and the boost rides the sqrt-mixture ratios; neither
    # may move under a different partition count
    "docs_training_manifest",
]


@pytest.mark.parametrize("name", FLOAT_SENSITIVE)
def test_parity_is_partition_count_invariant(spark, name):
    """Float-sensitive queries must hash-match the oracle under a
    different shuffle-partition count — a partition-order-dependent
    float sum would pass at 32 partitions and silently drift on a real
    cluster's 2000. (Each query sums in exact decimal or rounds at a
    declared edge; this pins that property.)"""
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        df = QUERIES[name](spark, SF_SMALL)
        assert_matches_oracle(df, ORACLES[name], SF_SMALL, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
