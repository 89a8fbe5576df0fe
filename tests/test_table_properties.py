"""Property tests for the snapshot-table merge policies against plain
dict models: KeyedParquetTable is LWW-by-key, GroupedParquetTable is
group replace (delete keys then insert rows). Random operation sequences
must converge to the model exactly — the idempotent-sink argument the
streaming exactly-once story rests on."""

import random

from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.streaming.table import (
    GroupedParquetTable,
    KeyedParquetTable,
)


def test_grouped_table_matches_dict_model(spark, tmp_path):
    rng = random.Random(7)
    t = GroupedParquetTable(
        spark, str(tmp_path / "g"), group_keys=["id"]
    )
    model: dict[int, list[tuple[int, str, int]]] = {}

    for step in range(6):
        ids = rng.sample(range(8), k=rng.randint(1, 4))
        rows = []
        for i in ids:
            group = [
                (i, f"tok{step}_{j}", rng.randint(1, 5))
                for j in range(rng.randint(0, 3))  # 0 rows = delete
            ]
            model[i] = group
            rows.extend(group)
        keys_df = spark.createDataFrame([(i,) for i in ids], ["id"])
        rows_df = spark.createDataFrame(
            rows or [], "id int, tok string, tf int"
        )
        t.merge(rows_df, keys_df)

        want = sorted(r for group in model.values() for r in group)
        got = sorted(
            (r["id"], r["tok"], r["tf"]) for r in t.read().collect()
        )
        assert got == want, f"step {step}"


def test_keyed_table_matches_dict_model(spark, tmp_path):
    rng = random.Random(11)
    t = KeyedParquetTable(
        spark, str(tmp_path / "k"), keys=["id"], order_by=["seq"]
    )
    model: dict[int, tuple[int, str, int]] = {}

    for step in range(5):
        rows = []
        for i in rng.sample(range(6), k=rng.randint(1, 4)):
            row = (i, f"v{step}_{i}", step)
            rows.append(row)
            # LWW: higher seq wins; ties impossible (one row per key/step)
            if i not in model or model[i][2] <= step:
                model[i] = row
        t.merge(spark.createDataFrame(rows, "id int, val string, seq int"))

        want = sorted(model.values())
        got = sorted(
            (r["id"], r["val"], r["seq"]) for r in t.read().collect()
        )
        assert got == want, f"step {step}"


def test_time_travel_and_change_feed(spark, tmp_path):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.streaming.table import (
        KeyedParquetTable,
        read_version,
        table_changes,
        table_versions,
    )

    t = KeyedParquetTable(
        spark, str(tmp_path / "kt"), keys=["k"], order_by=["ver"],
        keep_snapshots=4,
    )
    t.merge(spark.createDataFrame([(1, 1, "a"), (2, 1, "b")], "k long, ver long, v string"))
    t.merge(spark.createDataFrame([(2, 2, "B"), (3, 1, "c")], "k long, ver long, v string"))

    vs = table_versions(spark, t.root)
    assert vs == ["snap-000001", "snap-000002"]
    old = read_version(spark, t.root, vs[0])
    new = read_version(spark, t.root, vs[1])
    assert {tuple(r) for r in old.collect()} == {(1, 1, "a"), (2, 1, "b")}

    ch = {(r.k, r._change) for r in table_changes(old, new, ["k"]).collect()}
    assert ch == {(3, "insert"), (2, "update_pre"), (2, "update_post")}


def test_change_feed_delete_and_noop(spark):
    from social_graph_based_people_recommender_using_amazon_neptune_and_textract_spark.streaming.table import (
        table_changes,
    )

    old = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    new = spark.createDataFrame([(1, "a")], "k long, v string")
    ch = [(r.k, r._change) for r in table_changes(old, new, ["k"]).collect()]
    assert ch == [(2, "delete")]
    # identical states -> empty feed (unchanged rows never materialize)
    assert table_changes(old, old, ["k"]).count() == 0
