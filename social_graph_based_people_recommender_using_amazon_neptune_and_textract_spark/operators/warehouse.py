"""Warehouse-analytics queries over the TPC-H-shaped testdata tables
(lineitem / orders / customer / nation / region) — the classic Catalyst
showcase shapes: predicate pushdown into the parquet scan, column
pruning, map-side partial aggregation, and broadcast dimension joins.

These exercise the largest testdata tables (lineitem is 600k rows at
sf0.1 and the table that actually becomes 100 TB in a real warehouse)
with the plans that must hold at that scale: a scan-side filter that
reaches PushedFilters, aggregations that combine before the exchange,
and dimension joins that ship megabytes, not the fact table.

Determinism contract: every SUM over a floating-point measure goes
through DECIMAL(18,6). Double addition is not associative, so a
partition-ordered double sum differs run-to-run and engine-to-engine;
decimal sums are exact. The exact decimal is then cast to double and
ROUNDED TO 4 DECIMALS: the engines' decimal→double casts can disagree
by 1 ulp (DuckDB divides the int128 by 10^scale in double space; the
JVM rounds the exact decimal), and the measures' true scale is ≤4dp
(2dp money × 2dp discount), so the 4dp round collapses both ulp
neighbors onto the same double. Ratios (avgs) divide the ROUNDED sums
in double space — identical inputs, identical IEEE result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def pricing_summary(lineitem: DataFrame, cutoff: str = "2000-12-31") -> DataFrame:
    """TPC-H Q1-flavored pricing summary: per (returnflag, linestatus)
    totals and averages for rows shipped on or before ``cutoff``.
    Single scan → pushdown filter → one partial+final aggregation."""
    qty = F.col("l_quantity").cast(DEC)
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    disc_price = price * (F.lit(1).cast(DEC) - disc)
    li = lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).alias("_sq"),
        F.sum(price).alias("_sp"),
        F.sum(disc_price).alias("_sd"),
        F.count(F.lit(1)).alias("count_order"),
    )
    sq = F.round(F.col("_sq").cast("double"), 4)
    sp = F.round(F.col("_sp").cast("double"), 4)
    sd = F.round(F.col("_sd").cast("double"), 4)
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        sq.alias("sum_qty"),
        sp.alias("sum_base_price"),
        sd.alias("sum_disc_price"),
        F.round(sq / F.col("count_order"), 6).alias("avg_qty"),
        F.round(sp / F.col("count_order"), 6).alias("avg_price"),
        "count_order",
    )


def pricing_rollup(lineitem: DataFrame, cutoff: str = "2000-12-31") -> DataFrame:
    """ROLLUP form of the pricing summary: per-(returnflag, linestatus)
    rows PLUS per-returnflag subtotals PLUS the grand total, one pass.

    At 100 TB this is the device that replaces N separate aggregation
    jobs over the same scan: Catalyst expands the rollup into a single
    Expand + partial/final aggregate — the fact table is read once.
    ``grouping_id`` disambiguates subtotal rows from genuine NULL groups
    (both engines compute it identically: bit i set = column i rolled
    up)."""
    qty = F.col("l_quantity").cast(DEC)
    li = lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
    agg = li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(qty).alias("_sq"),
        F.count(F.lit(1)).alias("count_order"),
        F.grouping_id().alias("gid"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("_sq").cast("double"), 4).alias("sum_qty"),
        "count_order",
        "gid",
    )


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact continuous percentiles of the event measure per event_type
    (p50/p90/p99) plus the row count — the distribution-sketch query
    every metrics pipeline runs. Uses the EXACT ``percentile``
    (sort-based, linear-interpolated, identical definition to DuckDB's
    ``quantile_cont``) so the result is oracle-checkable; the approximate
    ``percentile_approx`` is the 100 TB drop-in when exactness stops
    mattering (declared trade, not used here because approximate sketches
    are engine-specific and cannot hash-match an oracle)."""
    return events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


def region_revenue(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    year: int = 1997,
) -> DataFrame:
    """TPC-H Q5-flavored regional revenue: discounted revenue of ``year``
    orders, rolled up to the ordering customer's region.

    Join shape for a 100 TB fact table: lineitem ⋈ orders shuffles on
    orderkey (the two big relations); customer arrives already reduced
    to (custkey, nationkey); nation and region are broadcast — the
    dimension path ships kilobytes while the fact path is one co-
    partitioned join + one aggregate."""
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    o = orders.filter(F.year("o_orderdate") == year).select("o_orderkey", "o_custkey")
    c = customer.select("c_custkey", "c_nationkey")
    n = nation.select("n_nationkey", "n_regionkey")
    r = region.select("r_regionkey", "r_name")
    return (
        lineitem.select("l_orderkey", (price * (F.lit(1).cast(DEC) - disc)).alias("_rev"))
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(F.round(F.sum("_rev").cast("double"), 4).alias("revenue"))
    )


def events_cube(events: DataFrame) -> DataFrame:
    """CUBE over (event_type, hour-of-day): counts and value sums for
    every combination INCLUDING the per-hour marginals ROLLUP can't
    express (rollup only nests left-to-right; cube adds the
    (NULL, hour) slices). Same one-scan Expand + single partial/final
    aggregate device as pricing_rollup — 4 groupings, one shuffle,
    ``grouping_id`` disambiguates subtotal rows from genuine NULLs."""
    hr = F.hour("ts").cast("long").alias("hr")
    return (
        events.select("event_type", hr, "value")
        .cube("event_type", "hr")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("value_sum"),
            F.grouping_id().alias("gid"),
        )
    )


def topk_order_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue for one market segment —
    the canonical selective-dim ⋈ fact ⋈ fact pipeline.

    Plan contract at 100 TB: the segment filter reduces customer ~5x and
    that TINY side broadcasts into orders (never the reverse); the
    orders⋈lineitem join is the only shuffle pair, on the natural
    orderkey — PINNED with a shuffle_hash hint, because the planner's
    size estimate of the selectively-filtered lineitem side undershoots
    the broadcast threshold at bench scale and it silently broadcast a
    FACT (the r6→r8 drift the r9 profile caught: the per-run driver
    HashedRelation build cost 2.12 s at sf1 where the pinned shuffle
    join serves in 0.61 s — and a fact broadcast is a driver OOM at
    100 TB, not a slowdown). Both date filters push into the parquet
    scans. Revenue sums in exact DECIMAL (module docstring) and the
    top-k orders on the EXACT decimal before the display round, so the
    cut is deterministic and identical to the oracle's;
    TakeOrderedAndProject keeps it a k-row driver result.
    """
    ts = F.lit(cutoff).cast("timestamp")
    c = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.filter(F.col("o_orderdate") < ts).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = lineitem.filter(F.col("l_shipdate") > ts).select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast(DEC)
            * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
        ).alias("_r"),
    )
    # The hint rides on the orders⋈customer side: Spark builds the
    # ShuffledHashJoin hash map from the HINTED side, and the segment-
    # filtered orders side is the small one — building from the filtered
    # fact would reintroduce the very per-partition memory pressure the
    # pinned-shuffle contract above exists to avoid.
    j = li.join(
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")).hint(
            "shuffle_hash"
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    agg = j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum("_r").alias("_rev")
    )
    return (
        agg.orderBy(
            F.col("_rev").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc()
        )
        .limit(k)
        .select(
            "l_orderkey",
            F.round(F.col("_rev").cast("double"), 4).alias("revenue"),
            # parquet reads NTZ; session tz is pinned UTC so this cast is
            # the same instant the oracle's epoch_us(naive) computes
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_us"
            ),
            "o_orderpriority",
        )
    )


def value_histogram(
    events: DataFrame, lo: float = 0.0, hi: float = 500.0, nbuckets: int = 10
) -> DataFrame:
    """Fixed-bound histogram of the event measure per event_type:
    bucket i covers [lo + i*w, lo + (i+1)*w); underflow lands in bucket
    -1, overflow in bucket ``nbuckets``. Fixed (declared) bounds — not
    data-dependent min/max — so the operator is a single scan + one
    map-side-combined aggregation with at most |types|*(nbuckets+2)
    groups, and incremental re-runs bucket identically as data grows.
    Returns (event_type, bucket, bucket_lo, n)."""
    w = (hi - lo) / nbuckets
    raw = F.floor((F.col("value") - F.lit(lo)) / F.lit(w)).cast("long")
    b = (
        F.when(F.col("value") < lo, F.lit(-1).cast("long"))
        .when(F.col("value") >= hi, F.lit(nbuckets).cast("long"))
        .otherwise(raw)
    )
    return (
        events.select("event_type", b.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "bucket",
            F.round(F.lit(lo) + F.col("bucket") * F.lit(w), 6).alias("bucket_lo"),
            "n",
        )
    )


def customer_running_totals(orders: DataFrame, first_n: int = 5) -> DataFrame:
    """Per-customer running order totals: each of a customer's first
    ``first_n`` orders (by date, then key) with the cumulative spend
    through that order — the classic ROWS UNBOUNDED PRECEDING frame.

    Scale: ONE shuffle on o_custkey serves both the running-sum window
    and the rank cut (same partitioning, same ordering — Catalyst fuses
    them into a single Window operator over one sort). The frame is
    running, so state per partition is O(1), not O(rows); the first_n
    cut bounds the output at n rows per customer. Decimal cumulative sum
    (exact), rounded at the edge per the module contract.
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    run = (
        F.sum(F.col("o_totalprice").cast(DEC))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("order_seq"),
            F.round(run, 4).alias("running_total"),
        )
        .filter(F.col("order_seq") <= first_n)
    )


def cheapest_supplier_per_part(lineitem: DataFrame, min_lines: int = 3) -> DataFrame:
    """Grouped argmin: for each part, the supplier with the lowest
    average sale price (parts with < ``min_lines`` total lines dropped
    as noise). Ties declared: lowest avg, then lowest supplier key.

    The Q2 shape (min-cost supplier) recast onto the lineitem fact: one
    (part, supp) aggregation — map-side combined — then a per-part
    argmin window over the ALREADY-AGGREGATED relation, which is orders
    of magnitude smaller than the fact table; the window's sort never
    sees raw lineitem rows. Ranking compares rounded-sum/n quotients —
    both engines divide identical doubles, so order is identical.
    """
    per = (
        lineitem.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast(DEC)).alias("_sum"),
        )
        .select(
            "l_partkey",
            "l_suppkey",
            "n_lines",
            # module contract: round the exact-decimal sum at the double
            # edge FIRST, then divide — both engines divide identical
            # doubles, so the quotient (and its ordering) is identical
            (
                F.round(F.col("_sum").cast("double"), 4) / F.col("n_lines")
            ).alias("_avg"),
        )
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("_avg").asc(), F.col("l_suppkey").asc()
    )
    per_part = per.groupBy("l_partkey").agg(
        F.sum("n_lines").alias("part_lines")
    )
    return (
        per.join(per_part, "l_partkey")
        .filter(F.col("part_lines") >= min_lines)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_partkey", "l_suppkey", F.round("_avg", 4).alias("avg_price")
        )
    )


def user_trailing_24h(events: DataFrame) -> DataFrame:
    """Per-event trailing-24-hour activity: for every event, how many
    events the same user produced in the preceding 24 hours (inclusive
    of now), and their value sum — the RANGE-frame sibling of
    ``customer_running_totals``'s ROWS frame, and the batch twin of the
    streaming sliding window (streaming/windows.py).

    The frame is declared on epoch MICROSECONDS (the native event-time
    resolution): ``RANGE [now - 24h + 1µs, now]``. Both engines frame on
    the identical integer column, so boundary events land identically —
    framing on engine-native timestamps instead would tie the result to
    each engine's interval arithmetic.

    Scale: one shuffle on user_id; the range frame keeps a sliding
    buffer bounded by one user-day of events, not the partition. Skewed
    bot users are the hazard — the same salting escape hatch as
    operators/skew.py applies when one user-day exceeds a task.
    """
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-(86_400_000_000 - 1), 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_24h"),
        F.round(
            F.sum(F.col("value").cast(DEC)).over(w).cast("double"), 4
        ).alias("value_24h"),
    )


#: Declared pivot domain: pivoting on an OPEN domain at 100 TB means an
#: extra distinct-scan to discover columns AND a schema that drifts with
#: the data; production pivots declare the domain (it is the event
#: taxonomy, a contract — not data).
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def user_event_pivot(events: DataFrame) -> DataFrame:
    """Per-user event-type matrix: one row per user, one LONG count
    column per declared event type, as ONE aggregate pass with per-type
    conditional counts — one scan, one shuffle, map-side partial agg.

    Deliberately NOT ``groupBy().pivot(values=...)``: Spark lowers that
    to a two-phase plan (pre-aggregate on (user, type), re-shuffle on
    user — two Exchanges), because the generic pivot must handle
    arbitrary agg expressions. With a DECLARED domain and count/sum
    aggs, the conditional-column form shuffles once and carries 5
    counters per user instead of 5 rows — the single-Exchange plan is
    asserted in tests. Undeclared types fall out of every column
    (the oracle mirrors with the same CASE columns)."""
    return events.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
            for t in EVENT_TYPES
        ]
    )


def customer_spend_quartiles(orders: DataFrame) -> DataFrame:
    """Per-customer total spend with the NTILE(4) quartile bucket —
    the segmentation primitive (deciles/quartiles) every growth
    dashboard runs. Ties declared: the tiling orders on (rounded spend
    desc, custkey asc), so bucket boundaries are deterministic.

    Scale: the aggregate reduces orders to one row per customer, then
    the quartile comes from the house two-phase machinery (ranking.py):
    range-partitioned global row_number + the exact closed-form
    ``ntile_from_rank`` on (rank, count) — NO global-order window
    anywhere in the plan (was the repo's one unpartitioned NTILE window
    through r10; parity with window NTILE is test-pinned on unique-rank
    data, and the oracle is still DuckDB's real ntile). Works for
    billions of customers: the sort is 32-way range-partitioned, the
    count join is a 1-row broadcast fold."""
    from .ranking import global_row_number, ntile_from_rank

    spend = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.round(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 4
        ).alias("total_spend")
    )
    ranked = global_row_number(
        spend, [F.col("total_spend").desc(), F.col("custkey").asc()]
    )
    total = ranked.agg(F.count(F.lit(1)).alias("n_rows"))
    return ranked.crossJoin(F.broadcast(total)).select(
        "custkey",
        "total_spend",
        ntile_from_rank(F.col("rn"), F.col("n_rows"), 4).alias("quartile"),
    )


def revenue_forecast(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: float = 0.02,
    disc_hi: float = 0.04,
    qty_below: int = 24,
) -> DataFrame:
    """TPC-H Q6 shape: revenue delta from a what-if discount change —
    one scan, zero joins, zero groupings. The whole query is a filter
    that must reach the parquet scan (all three predicates land in
    PushedFilters — asserted in test_plans) followed by a single global
    agg whose partial side does all the work. The canonical 'is
    pushdown working' probe: at 100 TB the difference between scanning
    2% and 100% of the fact table IS this plan."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
        & (F.col("l_discount") >= disc_lo)
        & (F.col("l_discount") <= disc_hi)
        & (F.col("l_quantity") < qty_below)
    )
    rev = F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC)
    return li.agg(
        F.round(F.sum(rev).cast("double"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def orders_with_returns_by_priority(
    orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """EXISTS-shaped priority report: orders having at least one
    returned line, counted per order priority — the Q4 pattern with the
    reference schema's predicate. The EXISTS lowers to a LEFT SEMI
    join: the lineitem side is reduced to DISTINCT qualifying order
    keys BEFORE the join (semi-join semantics make duplicates free),
    then one count per priority. At 100 TB both sides shuffle once on
    orderkey and the filter pushes into the lineitem scan."""
    returned = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .distinct()
    )
    return (
        orders.join(
            returned, orders["o_orderkey"] == returned["l_orderkey"], "leftsemi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def rolling_active_users(events: DataFrame, window_days: int = 7) -> DataFrame:
    """Trailing N-day active users per day (WAU for N=7): for every day
    d with at least one user active in [d-N+1, d], the count of
    distinct users active in that window.

    SQL window frames cannot express COUNT(DISTINCT) over a RANGE, and
    a day-spine × events range self-join is O(days · events). The scale
    pattern is CONTRIBUTION SPREADING: reduce events to distinct
    (user, day) pairs first (one shuffle — this is the big win: the
    spread operates on user-days, not raw events), then each user-day
    contributes to exactly N report days via a bounded ``sequence``
    explode, and a count-distinct per report day finishes. Total work is
    N·|user-days| rows through hash exchanges — no inequality join, no
    per-day rescans, fan-out a declared constant.

    At 100 TB the exact per-day distinct is itself the bottleneck;
    ``approx_count_distinct`` (HLL++, a mergeable sketch) is the
    declared drop-in — same plan shape, fixed-size state per day —
    pinned within 5% of exact by test_round5_ops.
    """
    user_days = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    spread = user_days.select(
        "user_id",
        F.explode(
            F.expr(f"sequence(day, date_add(day, {int(window_days) - 1}))")
        ).alias("day"),
    )
    return spread.groupBy("day").agg(
        F.countDistinct("user_id").alias("active_users")
    )


def winsorized_stats(
    events: DataFrame, lo_p: float = 0.01, hi_p: float = 0.99
) -> DataFrame:
    """Per-group winsorization report: clamp the measure to its exact
    [p_lo, p_hi] percentiles within each event_type and report the clip
    counts plus the winsorized mean — the robust-stats gate a training
    pipeline runs before a heavy-tailed measure feeds a loss or a
    reward model.

    Plan: one percentile aggregate per group (exact sort-based
    ``percentile`` ≡ DuckDB ``quantile_cont``, the value_percentiles
    device), broadcast the few-row bounds table back onto the scan, and
    finish with a second map-side-combined aggregate. Two scans of the
    fact, one broadcast, no window over raw rows.

    Float edges (house rule): the bounds are rounded at 6dp before
    clamping — the clamp compares each raw double against the SAME
    rounded bound in both engines; the winsorized sum is rounded at 6dp,
    and the mean divides the rounded sum by the exact count (one IEEE
    division)."""
    bounds = events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(float(lo_p))), 6).alias("lo"),
        F.round(F.percentile("value", F.lit(float(hi_p))), 6).alias("hi"),
    )
    clamped = events.join(F.broadcast(bounds), "event_type").withColumn(
        "wv", F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    )
    return clamped.groupBy("event_type").agg(
        F.min("lo").alias("lo"),
        F.min("hi").alias("hi"),
        F.sum((F.col("value") < F.col("lo")).cast("long")).alias("n_clipped_low"),
        F.sum((F.col("value") > F.col("hi")).cast("long")).alias("n_clipped_high"),
        (F.round(F.sum("wv"), 6) / F.count(F.lit(1))).alias("winsorized_mean"),
    )


def group_zscores(events: DataFrame) -> DataFrame:
    """Per-row z-score of the measure within its event_type — the
    per-group normalization step before mixed-scale measures feed a
    model. Two-pass shape: a tiny per-group moment aggregate, broadcast
    back onto the scan, then a narrow per-row expression (no window
    over raw rows, so no per-group sort at 100 TB).

    Determinism: the two order-dependent double sums (Σv, Σv²) are
    rounded at declared edges (6dp / 4dp); every downstream step —
    s²/n, the subtraction, /(n-1), ``sqrt``, (v-mean)/std — is a single
    correctly-rounded IEEE op on identical inputs, so both engines land
    on the same double, and the final z is rounded at 6dp.

    The rounding can make a near-constant group's variance land a hair
    BELOW zero — Spark's sqrt would yield NaN while DuckDB raises — so
    both engines clamp the variance at 0 before the sqrt (mirrored with
    ``greatest(var, 0)`` in the oracle). A true- or clamped-zero std
    yields NULL z (``try_divide`` here — ANSI Spark raises on x/0 —
    and x/0 → NULL in DuckDB): constant groups carry NULL z-scores by
    declaration."""
    moments = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).alias("s"),
        F.round(F.sum(F.col("value") * F.col("value")), 4).alias("ssq"),
    )
    stats = moments.select(
        "event_type",
        (F.col("s") / F.col("n")).alias("mean"),
        F.sqrt(
            F.greatest(
                (F.col("ssq") - F.col("s") * F.col("s") / F.col("n"))
                / (F.col("n") - 1),
                F.lit(0.0),
            )
        ).alias("std"),
    )
    return (
        events.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round(
                F.try_divide(F.col("value") - F.col("mean"), F.col("std")), 6
            ).alias("z"),
        )
    )


def mad_outliers(events: DataFrame, cutoff: float = 3.5) -> DataFrame:
    """Per-row modified z-score within the event_type, via median/MAD —
    the robust companion of ``group_zscores``: mean/std are themselves
    dragged by the outliers they are supposed to expose, median and MAD
    are not (Iglewicz–Hoaglin's 0.6745·(x−median)/MAD with the standard
    3.5 cutoff; both public statistics-handbook material).

    Plan: two tiny per-group percentile aggregates (exact sort-based
    ``percentile(0.5)`` ≡ DuckDB ``quantile_cont(0.5)``, the
    value_percentiles device) — one for the median, one over |x−median|
    for the MAD after broadcasting the first back onto the scan — then a
    narrow per-row expression. Three scans of the fact, two broadcasts,
    no window over raw rows (no per-group sort at 100 TB).

    Float edges: median and MAD are rounded at 6dp; the modified z is
    (x − median)·0.6745 / MAD as single IEEE ops on identical inputs,
    rounded at 6dp. A zero-MAD group (≥ half the rows at the median)
    yields NULL z via ``try_divide`` and is_outlier=false by declaration
    — mirrored x/0→NULL in the oracle."""
    med = events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    mad = (
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(
                F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)),
                6,
            ).alias("mad")
        )
    )
    stats = med.join(mad, "event_type")
    z = F.round(
        F.try_divide(
            (F.col("value") - F.col("med")) * F.lit(0.6745), F.col("mad")
        ),
        6,
    )
    return (
        events.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            z.alias("robust_z"),
            F.coalesce(F.abs(z) > cutoff, F.lit(False)).alias("is_outlier"),
        )
    )


def retention_cohorts(orders: DataFrame) -> DataFrame:
    """Classic cohort-retention matrix over the orders fact: customers
    grouped by FIRST-order month; for each (cohort_month, month_offset),
    how many of them ordered again ``month_offset`` months later, and
    what fraction of the cohort that is.

    Plan shape: the fact reduces to distinct (customer, month) activity
    — one map-side-combined aggregate — from which the cohort relation
    (customer → min month) is ONE more tiny aggregate; the matrix is the
    activity ⋈ cohort equi-join on the customer key (fan-out exactly 1
    per activity row) aggregated on (cohort, offset). Cohort sizes
    re-derive from the offset-0 cell (every cohort member is active in
    their own first month by construction) — no extra pass over the
    fact. No windows, no driver state; every shuffle keys on customer or
    the tiny (cohort, offset) pair.

    ``month_offset`` is whole calendar months between first-of-month
    dates (both engines: exact integer). ``retention`` divides two
    counts, one IEEE division rounded at 6dp; offset 0 is always 1.0."""
    activity = orders.groupBy(
        F.col("o_custkey").alias("custkey"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month"),
    ).agg(F.count(F.lit(1)).alias("_n"))
    cohort = activity.groupBy("custkey").agg(
        F.min("month").alias("cohort_month")
    )
    cells = (
        activity.join(cohort, "custkey")
        .groupBy(
            "cohort_month",
            F.months_between(F.col("month"), F.col("cohort_month"))
            .cast("int")
            .alias("month_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    sizes = cells.filter(F.col("month_offset") == 0).select(
        "cohort_month", F.col("n_customers").alias("_cohort_size")
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_month")
        .select(
            "cohort_month",
            "month_offset",
            "n_customers",
            F.round(
                F.col("n_customers").cast("double") / F.col("_cohort_size"), 6
            ).alias("retention"),
        )
    )


def monthly_revenue_growth(orders: DataFrame) -> DataFrame:
    """Monthly revenue with month-over-month and year-over-year growth —
    the trend report every revenue dashboard serves.

    Scale shape: ONE map-side-combined aggregate reduces the fact table
    to one row per month (~tens of rows however big the fact is); the
    MoM/YoY comparisons are then CALENDAR SELF-JOINS on that tiny
    relation (month = prior + 1/12 months) rather than ``lag`` rows —
    a lag-12-rows window silently breaks the moment a month is missing
    from the data, the calendar join never does. Catalyst broadcasts
    both sides; the fact is scanned once.

    Float edges: exact decimal revenue rounded at 4dp; growth divides
    two identical rounded doubles (single IEEE ops), rounded at 6dp.
    Months with no prior-period row carry NULL growth (declared)."""
    m = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(
        F.round(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double"), 4
        ).alias("revenue")
    )
    mom = m.select(
        F.add_months(F.col("month"), 1).alias("month"),
        F.col("revenue").alias("prev_rev"),
    )
    yoy = m.select(
        F.add_months(F.col("month"), 12).alias("month"),
        F.col("revenue").alias("yago_rev"),
    )
    return (
        m.join(mom, "month", "left")
        .join(yoy, "month", "left")
        .select(
            "month",
            "revenue",
            F.round(
                (F.col("revenue") - F.col("prev_rev")) / F.col("prev_rev"), 6
            ).alias("mom_pct"),
            F.round(
                (F.col("revenue") - F.col("yago_rev")) / F.col("yago_rev"), 6
            ).alias("yoy_pct"),
        )
    )


def bucketed_quantiles(
    events: DataFrame,
    qs: tuple = (0.5, 0.95, 0.99),
    lo: float = 0.0,
    hi: float = 500.0,
    nbuckets: int = 100,
) -> DataFrame:
    """MERGEABLE approximate quantiles from the fixed-bound histogram —
    the rollup-friendly quantile idiom: per-partition/per-day bucket
    counts merge by addition (unlike exact quantiles, which need the
    two-phase rank, and unlike t-digest, whose merge is
    order-sensitive), and the q-quantile estimate is the lower bound of
    the FIRST bucket where the cumulative count reaches ceil(q·n)
    (cum − n_bucket < target ≤ cum). Error is bounded by the declared
    bucket width — a knob, not a surprise.

    Returns (event_type, q, est_lo, cum). The window runs over
    ≤ nbuckets+2 rows per type — aggregate-then-window, never a
    raw-row sort."""
    from pyspark.sql import Window

    hist = value_histogram(events, lo, hi, nbuckets)
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "event_type",
        "bucket_lo",
        F.col("n"),
        F.sum("n").over(w).cast("long").alias("cum"),
        F.sum("n").over(wt).cast("long").alias("total"),
    )
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    return cum.select(
        "event_type",
        F.col("bucket_lo").alias("est_lo"),
        "cum",
        F.explode(
            F.filter(
                qarr,
                lambda q: (F.col("cum") >= F.ceil(q * F.col("total")))
                & (F.col("cum") - F.col("n") < F.ceil(q * F.col("total"))),
            )
        ).alias("q"),
    ).select("event_type", "q", "est_lo", "cum")


def nation_trade_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q7-flavored cross-nation trade: discounted revenue per
    (customer nation, supplier nation, ship year), cross-border pairs
    only — the double-dimension-role join (nation enters TWICE, once
    per side) that exercises join reordering hardest.

    Join shape at 100 TB: lineitem ⋈ orders shuffles on orderkey (the
    two facts), customer/supplier arrive reduced to (key, nationkey),
    and BOTH nation roles broadcast — the six-table plan moves exactly
    one fact-fact shuffle plus kilobytes of dimensions. Revenue sums in
    exact decimal (order-independent), one display round."""
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    o = orders.select("o_orderkey", "o_custkey")
    c = customer.select("c_custkey", "c_nationkey")
    s = supplier.select("s_suppkey", "s_nationkey")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        lineitem.select(
            "l_orderkey",
            "l_suppkey",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (price * (F.lit(1).cast(DEC) - disc)).alias("_rev"),
        )
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("cn_key"))
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", "l_year")
        .agg(F.round(F.sum("_rev").cast("double"), 4).alias("revenue"))
    )


def funnel_steps(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered funnel per user — the product-analytics staple: step i+1
    counts only STRICTLY AFTER the chosen step-i event, and each step
    greedily takes its earliest qualifying event (earliest-first is the
    declared — and completion-maximal — chain: an earlier step-i event
    can only widen step-i+1's choices). Returns
    (user_id, t1..tN timestamps — NULL from the first missed step on,
    steps_completed).

    Scale: one keyed min-aggregate per step (each map-side combined)
    chained by equi-joins on user_id — no windows, no per-user event
    sorting; each stage's relation is ≤ |users| rows. At 100 TB the
    event scan is filtered per step (predicate pushdown on event_type)
    and everything downstream is user-dimension-sized."""
    assert 2 <= len(steps) <= 5
    cur = (
        events.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    out = cur
    for i, ev in enumerate(steps[1:], start=2):
        prev_t = f"t{i - 1}"
        nxt = (
            events.filter(F.col("event_type") == ev)
            .select("user_id", F.col("ts").alias("_ts"))
            .join(out.select("user_id", prev_t), "user_id")
            .filter(F.col("_ts") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("_ts").alias(f"t{i}"))
            .select("user_id", f"t{i}")
        )
        out = out.join(nxt, "user_id", "left")
    comp = F.lit(1)
    for i in range(2, len(steps) + 1):
        comp = comp + F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
    return out.select(
        "user_id",
        *[f"t{i}" for i in range(1, len(steps) + 1)],
        comp.cast("int").alias("steps_completed"),
    )
