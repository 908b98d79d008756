"""Physical-plan assertions — the scale posture is part of correctness.

These tests pin the plan properties SURVEY.md §4/§7 promises: filters reach
the parquet scan, projections prune the read schema, small dimensions
broadcast, and the hot paths stay inside whole-stage codegen.  A regression
here means a 100 TB run does extra scans/shuffles even if results match.
"""

from __future__ import annotations

import contextlib
import io
import os

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q01_filter_pushed_to_scan(spark):
    plan = plan_of(entrymod.q01_pricing_summary(spark, SF_DIR))
    assert "PushedFilters" in plan
    assert "LessThanOrEqual(l_shipdate" in plan


def test_q01_partial_aggregation(spark):
    # map-side partial agg before the exchange: HashAggregate on both sides
    plan = plan_of(entrymod.q01_pricing_summary(spark, SF_DIR))
    tree = plan.split("(1) Scan")[0]
    assert tree.count("HashAggregate") == 2
    assert tree.count("Exchange") == 1


def test_q09_column_pruning(spark):
    plan = plan_of(entrymod.q09_sensitive_projection(spark, SF_DIR))
    # ReadSchema keeps only the 3 projected + 1 filter column
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "c_custkey" in read and "c_mktsegment" in read
    assert "c_acctbal" not in read and "c_name" in read


def test_q10_broadcasts_small_dims(spark):
    plan = plan_of(entrymod.q10_star_join_revenue(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_q16_dedup_single_shuffle(spark):
    plan = plan_of(entrymod.q16_dedup_exact(spark, SF_DIR))
    tree = plan.split("(1) Scan")[0]
    assert tree.count("Exchange") == 1
    # Spark inserts WindowGroupLimit below the shuffle: partial top-k
    # map-side, so only group winners ride the Exchange at scale.
    assert "WindowGroupLimit" in tree


def test_q26_single_projection_no_shuffle(spark):
    # clean_columns is one wide projection: no Exchange anywhere
    plan = plan_of(entrymod.q26_clean_columns_pipeline(spark, SF_DIR))
    assert "Exchange" not in plan
    assert "Scan parquet" in plan


def test_q21_posting_list_plan_shape(spark):
    """The inverted-index path must not re-run tokenization below the
    repartition Exchange (the InferFiltersFromGenerate regression)."""
    plan = plan_of(entrymod.q21_ngram_jaccard(spark, SF_DIR))
    scan_region = plan.split("Exchange")[0]
    # no split/transform expression may appear before the first Exchange
    assert "transform(" not in scan_region


def test_bucketed_merge_is_shuffle_free(spark):
    """SCALE.md claim: version tables bucketed on Connect_ID sort-merge-join
    without any shuffle Exchange (bucket spec satisfies the join's
    distribution requirement)."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    base = spark.range(1000).select(
        F.col("id").cast("string").alias("Connect_ID"),
        (F.col("id") % 50).cast("string").alias("payload"),
    )
    for name in ("bm_v1", "bm_v2"):
        (
            base.write.mode("overwrite")
            .bucketBy(8, "Connect_ID")
            .sortBy("Connect_ID")
            .saveAsTable(name)
        )
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            v1, v2 = spark.table("bm_v1"), spark.table("bm_v2")
            joined = v1.join(v2, "Connect_ID")
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain("formatted")
            tree = buf.getvalue().split("(1) Scan")[0]
            assert "SortMergeJoin" in tree
            assert "Exchange" not in tree, f"bucketed join shuffled:\n{tree}"
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS bm_v1")
        spark.sql("DROP TABLE IF EXISTS bm_v2")


def test_q59_band_join_broadcasts_not_shuffles(spark):
    """The non-equi band join must evaluate as BroadcastNestedLoopJoin:
    the fact table streams, only the 4-row band table moves."""
    plan = plan_of(entrymod.q59_range_band_join(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan
    before_agg = plan.split("HashAggregate")[0]
    assert "Exchange" not in before_agg.split("BroadcastExchange")[0]


def test_q69_hash_split_single_shuffle(spark):
    """The split expression must stay scan-side: exactly one Exchange
    (the 3-group final aggregate), none before the partial aggregate."""
    tree = plan_of(entrymod.q69_hash_split(spark, SF_DIR)).split("(1) Scan")[0]
    assert tree.count("Exchange") == 1


def test_q55_rolling_window_after_aggregate(spark):
    """The moving-average window must sit on top of the daily aggregate
    (tiny input), never on the raw fact table."""
    plan = plan_of(entrymod.q55_rolling_avg(spark, SF_DIR))
    assert plan.index("Window") < plan.index("HashAggregate")


def test_q80_shuffle_uses_top_k_not_global_sort(spark):
    """orderBy+limit must compile to TakeOrderedAndProject (per-partition
    top-k), never a full Sort of the corpus before the limit."""
    plan = plan_of(entrymod.q80_deterministic_shuffle(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_q86_broadcasts_filtered_dims(spark):
    """Both dimension sides (segment-filtered customer, date-filtered
    orders) must broadcast; lineitem streams through two BHJs and the only
    wide Exchange is the final group aggregate. The ship-date filter must
    reach the parquet scan."""
    plan = plan_of(entrymod.q86_shipping_priority(spark, SF_DIR))
    tree = plan.split("(1) Scan")[0]
    assert tree.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert "PushedFilters" in plan and "GreaterThan(l_shipdate" in plan


def test_q88_exists_compiles_to_semi_join(spark):
    """The correlated EXISTS must run as ONE LeftSemi join carrying the
    non-equi interval residual — no row explosion, no distinct."""
    plan = plan_of(entrymod.q88_late_shipment_priority(spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "INTERVAL '60' DAY" in plan


def test_q89_single_lineitem_scan(spark):
    """The argmax must reuse the per-supplier aggregate for its global max
    (window over the aggregated frame) — exactly one lineitem scan, vs the
    two a scalar-subquery re-derivation costs."""
    plan = plan_of(entrymod.q89_top_supplier(spark, SF_DIR))
    tree = plan.split("(1) Scan")[0]
    assert tree.count("Scan parquet") == 2  # lineitem once + supplier once


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """A filter on a hive-partition column must prune at planning time:
    the scan's PartitionFilters carries the predicate and only matching
    partition directories are read."""
    import os as _os

    src = entrymod._t(spark, SF_DIR, "customer")
    dest = str(tmp_path / "part_cust")
    src.write.mode("overwrite").partitionBy("c_mktsegment").parquet(dest)

    df = spark.read.parquet(dest).filter(F.col("c_mktsegment") == "BUILDING")
    plan = plan_of(df)
    assert "PartitionFilters" in plan
    assert "c_mktsegment" in plan.split("PartitionFilters")[1].splitlines()[0]
    # files actually read = only the BUILDING directory
    n_read = df.count()
    n_building = (
        spark.read.parquet(_os.path.join(dest, "c_mktsegment=BUILDING")).count()
    )
    assert n_read == n_building > 0


def test_q95_rank_filter_uses_window_group_limit(spark):
    """dense_rank <= k must compile to WindowGroupLimit: partitions
    pre-truncate to local top-k before the window sort."""
    plan = plan_of(entrymod.q95_topk_per_group(spark, SF_DIR))
    assert "WindowGroupLimit" in plan


def test_q99_nation_lookups_broadcast(spark):
    """Q7 shape: both nation lookups plus supplier broadcast — the fact
    side never shuffles for a dimension."""
    plan = plan_of(entrymod.q99_nation_pair_volume(spark, SF_DIR))
    tree = plan.split("(1) Scan")[0]
    assert tree.count("BroadcastHashJoin") >= 3


def test_q103_one_shuffle_feeds_agg_and_window(spark):
    """Q21 shape: the l_orderkey repartition must satisfy BOTH the
    pair-key groupBy (subset rule) and the order-level window. Tree
    exchanges: that repartition + final per-supplier groupBy + 2
    broadcasts — a 5th would mean the window re-shuffled."""
    plan = plan_of(entrymod.q103_sole_late_supplier(spark, SF_DIR))
    tree = plan.split("(1) Scan")[0]
    assert tree.count("Exchange") == 4
    assert tree.count("BroadcastHashJoin") == 2


def test_q105_argmin_uses_window_group_limit(spark):
    plan = plan_of(entrymod.q105_cheapest_supplier(spark, SF_DIR))
    assert "WindowGroupLimit" in plan


def test_q106_single_fact_scan(spark):
    """Share-of-total via empty-frame window over the aggregated frame:
    lineitem is scanned exactly once (a scalar-subquery formulation would
    scan it twice)."""
    plan = plan_of(entrymod.q106_important_parts(spark, SF_DIR))
    tree = plan.split("(1) Scan")[0]
    assert tree.count("Scan parquet") == 1


def test_q108_eval_grams_broadcast(spark):
    """Decontamination joins the tiny eval n-gram set as a broadcast —
    the training corpus side must not shuffle for the probe."""
    plan = plan_of(entrymod.q108_decontamination(spark, SF_DIR))
    tree = plan.split("(1) Scan")[0]
    assert "BroadcastHashJoin" in tree


def test_q113_all_three_filters_pushed(spark):
    """Q6 shape is pure pushdown: the date, discount, and quantity range
    predicates must ALL reach the parquet scan, and the scalar aggregate
    must run as partial + 1-row final (no wide shuffle)."""
    plan = plan_of(entrymod.q113_forecast_revenue(spark, SF_DIR))
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount,0.05)" in plan
    assert "LessThan(l_quantity,24.0)" in plan
    tree = plan.split("(1) Scan")[0]
    assert tree.count("HashAggregate") == 2


def test_q119_disjunction_stays_hash_join(spark):
    """Catalyst must extract the common l_partkey = p_partkey equi-condition
    out of the OR blocks: a BroadcastHashJoin with the disjunction as a
    residual, never a nested-loop over the cross product."""
    plan = plan_of(entrymod.q119_disjunctive_predicate_join(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q118_aggregate_built_on_branded_subset(spark):
    """The per-part average is computed AFTER the brand broadcast filter —
    both the agg input and the probe side read the brand-pruned join, so
    the fact contributes ~1/|brands| of its rows to the shuffle."""
    plan = plan_of(entrymod.q118_small_quantity_revenue(spark, SF_DIR))
    tree = plan.split("(1) Scan")[0]
    assert tree.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in tree or "Exchange" in tree


def test_q121_single_exchange_for_window_and_distinct_agg(spark):
    """Winnowing: the gram rows shuffle ONCE on doc_id; the window-min and
    the distinct fingerprint aggregation both reuse that partitioning."""
    plan = plan_of(entrymod.q121_winnowing_fingerprints(spark, SF_DIR))
    tree = plan.split("(1) Scan")[0]
    assert tree.count("Exchange") == 1


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Scale posture: with a selective build side, Catalyst injects a
    runtime bloom filter (might_contain) on the probe side of a shuffle
    join, cutting probe rows BEFORE the exchange.  Test data is far below
    the default 10 GB application-side threshold, so the thresholds are
    lowered here only to prove the wiring — at warehouse scan sizes the
    defaults trigger on their own."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    try:
        orders = entrymod._t(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = entrymod._t(spark, SF_DIR, "lineitem")
        j = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        plan = plan_of(j)
        assert "might_contain" in plan.lower()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    """Scale posture: AQE's skew-join handling splits oversized partitions
    at runtime (skew=true in the final plan). 95% of left rows share one
    key; thresholds are lowered only because local test bytes sit far
    under the 256 MB default — at warehouse partition sizes the defaults
    fire on their own. Salting (operators/joins.salted_join) remains the
    manual fallback for non-AQE paths."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
        )
        j = left.join(right, "k").groupBy().agg(F.count(F.lit(1)).alias("n"))
        j.collect()
        final_plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan.lower()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_cc_iteration_edge_side_needs_no_exchange_or_sort(spark):
    """The CC edge list is hash-partitioned + sorted on the join key before
    its checkpoint, so each iteration's SMJ consumes it with ZERO Exchange
    and ZERO Sort — only the per-iteration label frame shuffles.  AQE and
    auto-broadcast off so the tiny fixture plans like the at-scale SMJ."""
    from pr2_transformation_spark.operators import graph

    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (4, 5)], "src bigint, dst bigint"
        )
        fwd = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        sym = (
            fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .repartition("b")
            .sortWithinPartitions("b")
            .localCheckpoint(eager=True)
        )
        labels = (
            sym.select(F.col("a").alias("id")).distinct()
            .select("id", F.col("id").alias("comp"))
            .localCheckpoint(eager=True)
        )
        step = (
            sym.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a").agg(F.min("comp").alias("nbr_comp"))
        )
        plan = step._jdf.queryExecution().executedPlan().toString()
        # edge side: Scan ExistingRDD feeds the SMJ directly (no Sort above it)
        assert plan.count("Exchange") == 2  # labels join side + groupBy only
        assert plan.count("Sort [") == 1    # labels side only
        # and the full operator still resolves components correctly
        comp = {r["id"]: r["comp"] for r in graph.connected_components(edges).collect()}
        assert comp == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)


def test_runtime_bloom_filter_injects_on_selective_dim_join(spark):
    """100 TB lever: with runtime bloom filters enabled, a selective dim
    filter injects a BloomFilter semi-join predicate into the FACT side's
    scan subtree, pre-shuffle — the Catalyst feature SCALE.md's join
    notes rely on.  Local datasets never cross the default 10 GB
    application-side threshold, so the test pins the behavior with the
    thresholds lowered; production sessions keep the defaults."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        orders = spark.read.parquet(
            "/root/testdata/sf0.001/orders.parquet"
        ).filter(F.col("o_orderpriority") == "1-URGENT")
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "o_totalprice"
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), plan[:2000]
        # and the filtered join still computes the right row count
        exact = (
            li.join(
                orders.select("o_orderkey", "o_totalprice"),
                li.l_orderkey == orders.o_orderkey,
            ).count()
        )
        assert j.count() == exact
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_join_strategy_hints_control_physical_plan(spark):
    """SURVEY §2.6 note: Catalyst picks the join strategy, but hints
    override it when the optimizer's estimate is wrong at 100 TB —
    shuffle_hash avoids the sort of a sort-merge join for huge
    unsorted sides; merge forces SMJ back; broadcast pins the small
    side.  Pin that each hint lands in the physical plan."""
    from pyspark.sql import functions as F

    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

        def phys(j):
            return j._jdf.queryExecution().executedPlan().toString()

        smj = li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
        assert "SortMergeJoin" in phys(smj)
        shj = li.join(
            orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey
        )
        assert "ShuffledHashJoin" in phys(shj)
        bhj = li.join(
            F.broadcast(orders), li.l_orderkey == orders.o_orderkey
        )
        assert "BroadcastHashJoin" in phys(bhj)
        # all three strategies agree on the result
        n = smj.count()
        assert shj.count() == n and bhj.count() == n
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
