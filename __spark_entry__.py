"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 (reference surface + EXT training-data operators), each paired
with a DuckDB oracle in ``oracle_sql()`` where the semantics are
SQL-expressible.  Column names and rounding are mirrored exactly on both
sides; timestamps are surfaced as epoch BIGINTs and double aggregates are
rounded to keep the value-hash comparison stable across engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pr2_transformation_spark import profiling  # noqa: E402
from pr2_transformation_spark.expressions import unwrap_singleton  # noqa: E402
from pr2_transformation_spark.functions import dedup, similarity, textstats  # noqa: E402
from pr2_transformation_spark.operators.clean_columns import clean_columns_df  # noqa: E402
from pr2_transformation_spark.operators.clean_rows import clean_rows_df  # noqa: E402
from pr2_transformation_spark.operators.merge import merge_versions_df  # noqa: E402
from pr2_transformation_spark.operators.sampling import bucket_sql  # noqa: E402
from pr2_transformation_spark.streaming.windows import sessionize_batch  # noqa: E402

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

#: The sampling hash-bucket expression, shared verbatim between the Spark
#: queries and the DuckDB oracles (operators/sampling.py keeps it portable).
_BUCKET_SQL = bucket_sql("c_custkey")

#: Morton-interleave SQL for the q85 z-value oracle — the same shift/mask
#: arithmetic operators/zorder.py builds as a Column expression, emitted as
#: portable integer-bitwise SQL (6 bits per axis).
_Z_SQL = "(" + " | ".join(
    f"((((c_custkey % 64) >> {i}) & 1) << {2 * i})"
    f" | ((((CAST(c_nationkey AS BIGINT) % 64) >> {i}) & 1) << {2 * i + 1})"
    for i in range(6)
) + ")"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _utc(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events.parquet with a session-TZ (UTC) ``ts`` timestamp column.

    The testdata generator has shipped ``ts`` as either TIMESTAMP(MICROS)
    (reads back as TIMESTAMP_NTZ) or TIMESTAMP(NANOS) (reads back as BIGINT
    under ``nanosAsLong``), so branch on the dtype that actually arrives:

    - timestamp / timestamp_ntz → cast to session-TZ timestamp (UTC session,
      so the NTZ wall-clock is reinterpreted as the same UTC instant DuckDB's
      naive TIMESTAMP gives the oracles);
    - long → nanos→micros with integer division (a double division would
      lose microsecond precision at 1.7e18).
    """
    from pyspark.sql.types import LongType

    _utc(spark)
    # Harmless for micros files; required to even read a nanos file's schema.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if isinstance(raw.schema["ts"].dataType, LongType):
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


# ===========================================================================
# Reference-surface queries (SURVEY.md §2.1-2.10)
# ===========================================================================

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped scan+filter+agg (projection pushdown,
    map-side partial agg, one shuffle on two low-cardinality keys)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q02_projection_rename_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core projection operator: rename + COALESCE + case standardization
    (clean_columns' clause shapes on a TPC-H table)."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").alias("part_key"),
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#13")), F.col("p_type")).alias(
            "brand_or_type"
        ),
        F.lower(F.col("p_name")).alias("name_lc"),
        F.col("p_size").alias("size_num"),
    )


def q03_case_recode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary->CID CASE recode shape (/root/reference/core/utils.py:437-466)
    applied to a status flag, plus group counts of the recoded value."""
    orders = _t(spark, sf_dir, "orders")
    recoded = orders.select(
        F.when(F.col("o_orderstatus") == "F", F.lit("353358909"))
        .when(F.col("o_orderstatus") == "O", F.lit("104430631"))
        .otherwise(F.lit(None).cast("string"))
        .alias("status_cid")
    )
    return recoded.groupBy("status_cid").agg(F.count(F.lit(1)).alias("n_orders"))


def q04_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REGEXP_CONTAINS / REGEXP_REPLACE / extraction surface."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderpriority").rlike(r"^\d-"))
        .select(
            F.regexp_extract(F.col("o_orderpriority"), r"^(\d)", 1).alias("priority_num"),
            F.regexp_replace(F.col("o_orderpriority"), r"^\d-", "").alias("priority_name"),
        )
        .groupBy("priority_num", "priority_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q05_guarded_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex-guarded CAST (age/year custom-transform template shape,
    /root/reference/core/constants.py:157-186)."""
    part = _t(spark, sf_dir, "part")
    digits = F.regexp_extract(F.col("p_brand"), r"#(\d+)$", 1)
    brand_num = F.when(
        digits.rlike(r"^\d{1,3}$") & digits.try_cast("long").between(0, 125),
        digits.try_cast("long"),
    ).otherwise(F.lit(None).cast("long"))
    return (
        part.select(brand_num.alias("brand_num"))
        .groupBy("brand_num")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


def q06_merge_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge_table_versions operator: case-insensitive common-column
    COALESCE + unique pass-through + FULL OUTER chain on Connect_ID."""
    cust = _t(spark, sf_dir, "customer")
    v1 = cust.filter(F.col("c_custkey") % 3 != 0).select(
        F.col("c_custkey").cast("string").alias("Connect_ID"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_name"))
        .alias("c_name"),
        F.col("c_mktsegment").alias("c_mktsegment"),
        F.col("c_nationkey").cast("string").alias("nat_v1"),
    )
    v2 = cust.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").cast("string").alias("Connect_ID"),
        F.col("c_name").alias("c_name"),
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        (F.col("c_nationkey") + 100).cast("string").alias("nat_v2"),
    )
    return merge_versions_df([v1, v2])


def q07_profile_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column detector aggregate: COUNTIF(NOT allowed) = 0 per
    column, one pass (/root/reference/core/utils.py:406-408)."""
    li = _t(spark, sf_dir, "lineitem")
    derived = li.select(
        F.col("l_returnflag"),
        F.when(F.col("l_linestatus") == "F", F.lit("1")).otherwise(F.lit("0")).alias("flag01"),
    )

    def is_binary(c):
        col = F.col(c)
        bad = ~((col == "0") | (col == "1") | col.isNull() | (col == ""))
        return F.count_if(bad) == 0

    return derived.agg(
        is_binary("l_returnflag").alias("returnflag_is_binary"),
        is_binary("flag01").alias("flag01_is_binary"),
    )


def q08_profile_false_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict false-array detector checks (distinct-count bounds, allowed
    value set, <=1 bracketed CID) as one aggregation pass
    (/root/reference/core/utils.py:644-664)."""
    li = _t(spark, sf_dir, "lineitem")
    fa = (
        F.when(F.col("l_returnflag") == "A", F.lit("[]"))
        .when(F.col("l_returnflag") == "N", F.lit("[178420302]"))
        .otherwise(F.lit("[958239616]"))
    )
    d = li.select(fa.alias("fa"))
    c = F.col("fa")
    return d.agg(
        F.count_distinct(c).alias("n_distinct"),
        F.count_if(c.isNotNull() & ~c.isin(["[]", "[178420302]", "[958239616]"])).alias(
            "n_outside_domain"
        ),
        F.count_distinct(F.when(c.rlike(r"^\[\d{9}\]$"), c)).alias("n_bracketed_distinct"),
    )


def q09_sensitive_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-list projection + pushed-down filter (sensitive-tier shape,
    /root/reference/core/transformations.py:792-797)."""
    cust = _t(spark, sf_dir, "customer")
    return cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("connect_key"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nation_key"),
    )


def q10_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: lineitem⨝orders⨝customer⨝nation⨝region + agg; small dims
    broadcast, one shuffle for the final group-by."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def q11_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function top-k: 3 highest-value orders per priority
    (deterministic tie-break on key)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rank")
    )


def q12_unwrap_singleton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """False-array unwrap CASE (/root/reference/core/utils.py:750-778)
    applied to constructed bracketed values, aggregated."""
    li = _t(spark, sf_dir, "lineitem")
    fa = (
        F.when(F.col("l_returnflag") == "A", F.lit("[]"))
        .when(F.col("l_returnflag") == "N", F.lit("[178420302]"))
        .otherwise(F.lit("[958239616]"))
    )
    d = li.select(fa.alias("fa"))
    unwrapped = d.select(unwrap_singleton("fa", "NULL").column)
    return unwrapped.groupBy("fa").agg(F.count(F.lit(1)).alias("n")).withColumnRenamed("fa", "unwrapped")


def _survey_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey-shaped fixture built deterministically from `customer`: a flat
    all-STRING table whose column names exercise the full CID grammar
    (one-off rename, custom-transform source, loop variants, mid-name
    version, multi-CID frozenset pair, substring excision collision, and an
    impure name that must be dropped)."""
    cust = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    return cust.select(
        k.cast("string").alias("Connect_ID"),
        F.when(k % 11 == 0, F.lit(None).cast("string")).otherwise(F.col("c_name"))
        .alias("D_150352141_D_206625031"),
        F.when(k % 4 == 0, F.col("c_nationkey").cast("string"))
        .when(k % 4 == 1, (F.lit(1900) + k % 150).cast("string"))
        .when(k % 4 == 2, F.lit("abc"))
        .otherwise(F.lit(None).cast("string"))
        .alias("D_317093647"),
        F.col("c_mktsegment").alias("d_110349197_1_1"),
        F.concat(F.lit("ph-"), (k % 100).cast("string")).alias("D_110349197_2_2"),
        F.concat(F.lit("ad-"), F.col("c_nationkey").cast("string")).alias("d_285476655_v2_1_1"),
        F.when(k % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("cm-"), (k % 17).cast("string")))
        .alias("d_111111111_d_222222222_5_5"),
        F.concat(F.lit("cb-"), (k % 7).cast("string")).alias("d_222222222_d_111111111_5_5"),
        F.when(k % 2 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_nationkey").cast("string"))
        .alias("state_d_934064808"),
        (F.col("c_nationkey") + 1).cast("string").alias("d_934064808_num"),
        F.lit("x").alias("biospecimen_flag"),
    )


def q26_clean_columns_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real clean_columns operator end-to-end on a survey-shaped frame:
    all four clause builders + threaded processed-set + duplicate guard
    (/root/reference/core/transformations.py:536-648)."""
    return clean_columns_df(
        _survey_frame(spark, sf_dir),
        "FlatConnect.module1_v2_JP",
        "proj.FlatConnect.module1_v2_JP",
    )


def q27_clean_rows_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real clean_rows operator with *computational* profiling (binary
    detection + strict false-array detection as single-pass aggregations,
    /root/reference/core/utils.py:375-435,582-698) composing recode/unwrap/
    passthrough clauses from the data itself."""
    orders = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    fixture = orders.select(
        k.cast("string").alias("Connect_ID"),
        F.when(k % 5 == 0, F.lit("1"))
        .when(k % 5 == 1, F.lit("0"))
        .when(k % 5 == 2, F.lit(""))
        .otherwise(F.lit(None).cast("string"))
        .alias("d_111111111"),
        F.when(k % 3 == 0, F.lit("[]"))
        .when(k % 3 == 1, F.lit("[178420302]"))
        .otherwise(F.lit(None).cast("string"))
        .alias("d_222222222"),
        F.col("o_orderpriority").alias("d_333333333"),
    )
    return clean_rows_df(fixture, use_reference=False)


def q28_merge_three_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-version merge exercising the star-shaped FULL OUTER chain anchored
    on the last source's key (SURVEY.md §2.6 note; /root/reference/core/
    transformations.py:126-136), plus forbidden-column drop and
    common-column COALESCE in alias order."""
    cust = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    v1 = cust.filter(k % 2 == 0).select(
        k.cast("string").alias("Connect_ID"),
        F.when(k % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_mktsegment"))
        .alias("common_col"),
        F.concat(F.lit("u1-"), (k % 19).cast("string")).alias("uniq_v1"),
        F.col("c_name").alias("token"),
    )
    v2 = cust.filter(k % 3 == 0).select(
        k.cast("string").alias("Connect_ID"),
        F.when(k % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("s2:"), F.col("c_mktsegment")))
        .alias("common_col"),
        F.concat(F.lit("u2-"), (k % 23).cast("string")).alias("uniq_v2"),
    )
    v3 = cust.filter(k % 5 == 0).select(
        k.cast("string").alias("Connect_ID"),
        F.concat(F.lit("s3:"), F.col("c_mktsegment")).alias("common_col"),
        F.col("c_nationkey").cast("string").alias("uniq_v3"),
    )
    return merge_versions_df([v1, v2, v3])


# ===========================================================================
# EXT queries: events (streaming batch-twins), documents, embeddings
# ===========================================================================

def q13_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute window aggregate (batch twin of the Structured
    Streaming form in streaming/windows.py)."""
    ev = _events(spark, sf_dir)
    win = F.window(F.col("ts"), "10 minutes")
    return (
        ev.groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def q14_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag/gap sessionization (30-minute gap): sessions + events per user."""
    ev = _events(spark, sf_dir)
    s = sessionize_batch(ev, "ts", "user_id", 30)
    return s.groupBy("user_id").agg(
        F.max("session_idx").alias("n_sessions"), F.count(F.lit(1)).alias("n_events")
    )


def q15_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction over the props column + aggregate."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k")
    return (
        ev.select(k.alias("k"), F.col("value"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


def q16_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one kept row (min doc_id) per source group."""
    docs = _t(spark, sf_dir, "documents")
    kept = dedup.exact_dedup(docs, ["source"], "doc_id")
    return kept.select(F.col("source"), F.col("doc_id").alias("keep_id"))


def q17_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text quality profile (token/punct/stopword metrics)."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        textstats.token_count(t).alias("n_tokens"),
        textstats.char_count(t).alias("n_chars_c"),
        textstats.punct_count(t).alias("n_punct"),
        textstats.stopword_ratio(t).alias("stopword_ratio"),
    )


def q18_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language-ID heuristic, counted per guess."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(textstats.language_guess(F.col("text")).alias("lang_guess"))
        .groupBy("lang_guess")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q19_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5 document fingerprints (dedup keys)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", textstats.fingerprint(F.col("text")).alias("fingerprint")
    )


def q20_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 10 query vectors (exact ANN baseline)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    return similarity.cosine_topk_bruteforce(corpus, queries, k=5)


def q21_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard similarity for same-(lang,source) document pairs
    sharing at least one word bigram."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", n=2, min_jaccard=0.01, bucket_cols=["lang", "source"]
    )


def q29_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregate (SURVEY.md §2.7 EXT surface)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


def q30_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level INTERSECT / EXCEPT ALL (SURVEY.md §2.8 EXT surface)."""
    cust = _t(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k"), F.col("c_nationkey").alias("nk")
    )
    low_nation = cust.filter(F.col("c_nationkey") < 13).select(
        F.col("c_custkey").alias("k"), F.col("c_nationkey").alias("nk")
    )
    even = cust.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("k"), F.col("c_nationkey").alias("nk")
    )
    return building.intersect(low_nation).exceptAll(even)


def q31_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 10-minute/5-minute window aggregate (batch twin of the
    streaming form in streaming/windows.py)."""
    from pr2_transformation_spark.streaming.windows import sliding_agg

    ev = _events(spark, sf_dir)
    out = sliding_agg(ev, "ts", "10 minutes", "5 minutes", ["event_type"])
    return out.select(
        F.unix_timestamp("window_start").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def q32_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native session_window (30-minute gap) per user; oracle is the
    lag/gap-islands SQL equivalent."""
    from pr2_transformation_spark.streaming.windows import session_agg

    ev = _events(spark, sf_dir)
    out = session_agg(ev, "ts", "30 minutes", ["user_id"])
    return out.select(
        "user_id",
        F.unix_timestamp("session_start").alias("session_start"),
        F.unix_timestamp("session_end").alias("session_end"),
        "n_events",
    )


def q33_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque binary payloads + Arrow-batched
    mapInPandas feature extraction (stub decoder; Spark-side schema,
    batching, and UDF signature are the real surface)."""
    from pr2_transformation_spark.functions import multimodal

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id"), F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return multimodal.extract_features(media, "payload", "doc_id")


def q34_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting next to whitespace counting (LLM token
    budgeting estimator)."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        textstats.token_count(t).alias("ws_tokens"),
        textstats.bpe_ish_token_count(t).alias("bpe_tokens"),
    )


# --- rows-only (no SQL-expressible oracle) ---------------------------------

def q22_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs with exact-Jaccard verification.
    Graded in ``hasher="md5"`` mode so the DuckDB oracle replays the exact
    signature/banding arithmetic; production default stays xxhash64."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.near_dup_pairs_minhash(
        docs, num_hashes=16, bands=4, threshold=0.2, hasher="md5"
    )


def q23_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures (bit-vote fold over token hashes).  Graded in
    ``hasher="md5"`` mode (cross-engine-deterministic bit votes)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash(docs, bits=16, hasher="md5")


def q24_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table hyperplane-LSH approximate top-k, SELF-VERIFYING: the
    query joins the approximate result against the in-query exact
    brute-force top-k and emits the recall assertion, so the DuckDB oracle
    (which cannot replay our hash tables) pins the contract
    deterministically: n_exact rows, the floor constant, and
    meets_recall_floor=TRUE.  Measured recall at sf0.001/0.01/0.1 is
    0.92/0.90/0.96 (4 planes x 16 tables, OR-amplified) — floor 0.7.
    A recall regression flips the boolean and fails the value hash."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    approx = similarity.cosine_topk_lsh_pandas(
        corpus, queries, k=5, n_planes=4, n_tables=16
    )
    # exact side via the Arrow/BLAS twin — provably the same top-k set as
    # the expression form (tests pin exact equivalence; q126's oracle
    # hash-matches it), ~5x cheaper on the 64-dim corpus scan
    exact = similarity.cosine_topk_bruteforce_pandas(corpus, queries, k=5)
    joined = exact.select("query_id", "vec_id").join(
        approx.select("query_id", "vec_id", F.lit(1).alias("__hit")),
        ["query_id", "vec_id"],
        "left",
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.lit(0.7).alias("recall_floor"),
        (
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))) / F.count(F.lit(1))
            >= 0.7
        ).alias("meets_recall_floor"),
    )


def q25_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via multi-table LSH
    self-bucketing, SELF-VERIFYING: every emitted pair is exact-verified
    (precision 1 by construction), so recall on the deterministic
    vec_id<500 slice is |approx| / |exact|; the exact pair count IS
    DuckDB-replayable (list_cosine_similarity cross join), making this an
    oracle that checks the exact side numerically AND asserts the recall
    floor.  Measured recall 0.86/0.85/0.83 (3 planes x 8 tables) — floor
    0.6."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    approx_n = (
        similarity.embedding_near_dup_pairs(
            emb, threshold=0.25, n_planes=3, n_tables=8
        )
        .agg(F.count(F.lit(1)).alias("n_approx"))
    )
    e = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    a, b = e.alias("a"), e.alias("b")
    exact_n = (
        a.crossJoin(b)
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.round(similarity.cosine(F.col("a.v"), F.col("b.v")), 4).alias("s")
        )
        .filter(F.col("s") >= 0.25)
        .agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    )
    return exact_n.crossJoin(approx_n).select(
        "n_exact_pairs",
        F.lit(0.6).alias("recall_floor"),
        (F.col("n_approx") / F.col("n_exact_pairs") >= 0.6).alias(
            "meets_recall_floor"
        ),
    )


def q39_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click gets the latest prior (or
    simultaneous) view's value per user — the union+window trick (one
    shuffle, zero joins); oracle is DuckDB's native ASOF LEFT JOIN."""
    from pr2_transformation_spark.operators.joins import asof_join

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("last_view_value")
    )
    out = asof_join(clicks, views, ["user_id"], "ts", ["last_view_value"])
    return out.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.round(F.col("last_view_value"), 2).alias("last_view_value"),
    )


def q38_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining text-quality metrics (avg token length, composite quality
    score) completing the textstats oracle coverage."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        textstats.avg_token_length(t).alias("avg_token_len"),
        textstats.punct_ratio(t).alias("punct_ratio"),
        F.floor(textstats.quality_score_raw(t) * 10000).cast("long").alias("quality_x1e4"),
    )


def q37_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column table profile (rows/nulls/min/max); the approx-
    distinct sketch column is dropped here so the oracle stays exact."""
    orders = _t(spark, sf_dir, "orders")
    prof = profiling.table_profile(
        orders, ["o_orderkey", "o_orderstatus", "o_orderpriority"]
    )
    return prof.select("column", "n_rows", "n_nulls", "min_value", "max_value")


def q41_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long->wide) aggregate: revenue by market segment pivoted over
    order status."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    j = orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
    return (
        j.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
        .withColumnsRenamed({"F": "total_f", "O": "total_o", "P": "total_p"})
    )


def q42_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word count: tokenize + explode + groupBy, top-100 by
    (count desc, word) — the canonical array fan-out aggregate."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(textstats.tokens(F.lower(F.col("text")))).alias("word")
    ).filter(F.col("word") != "")
    counts = toks.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), F.col("word")).limit(100)


def q43_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (median/p90 of quantity and
    extended price)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("qty_p50"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("qty_p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("price_p50"),
    )


def q52_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two version slices with different column
    sets combined row-wise, missing columns NULL-filled
    (unionByName(allowMissingColumns=True))."""
    cust = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    v1 = cust.filter(k % 2 == 0).select(
        k.cast("string").alias("Connect_ID"), F.col("c_name").alias("a")
    )
    v2 = cust.filter(k % 2 == 1).select(
        k.cast("string").alias("Connect_ID"), F.col("c_mktsegment").alias("b")
    )
    return v1.unionByName(v2, allowMissingColumns=True)


def q127_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join (operators/joins.salted_join): the big fact side
    carries a deterministic row-hash salt mod 16 and the supplier side
    replicates 16x, so one hot l_suppkey spreads over 16 shuffle tasks.
    Result is identical to the plain equi-join — the oracle IS the plain
    join, which is the operator's correctness contract.  Revenue uses the
    exact-cents trick (sum over rounded long cents) so double summation
    order can't diverge across engines."""
    from pr2_transformation_spark.operators.joins import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    j = salted_join(li, supp, on=["l_suppkey"], salt=16)
    return j.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100,
                    0,
                ).cast("long")
            )
            / 100.0,
            2,
        ).alias("revenue"),
    )


def q53_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: lpad / translate / concat_ws formatting."""
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        F.concat_ws(
            "-",
            F.lit("C"),
            F.lpad(F.col("c_custkey").cast("string"), 8, "0"),
            F.translate(F.col("c_mktsegment"), "AEIOU", "aeiou"),
        ).alias("customer_code")
    )


def q51_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi and left-anti joins: per segment, customers with vs
    without orders (existence joins never widen rows — the cheap
    existence-check shape at scale)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    cond = F.col("c_custkey") == F.col("o_custkey")
    with_orders = cust.join(orders, cond, "left_semi").groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_with_orders")
    )
    without = cust.join(orders, cond, "left_anti").groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_without_orders")
    )
    return with_orders.join(without, "c_mktsegment", "full").select(
        "c_mktsegment",
        F.coalesce("n_with_orders", F.lit(0)).alias("n_with_orders"),
        F.coalesce("n_without_orders", F.lit(0)).alias("n_without_orders"),
    )


def q49_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: parse the JSON props column into
    map<string,string>, explode entries, aggregate per key."""
    ev = _events(spark, sf_dir)
    m = F.from_json(F.col("props"), "map<string,string>")
    entries = ev.select(F.explode(m).alias("k", "v"))
    return entries.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("v").alias("n_distinct_values"),
    )


def q50_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: average order-to-ship latency in days per
    priority (datediff over timestamp columns)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    return j.groupBy("o_orderpriority").agg(
        F.round(F.avg(F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))), 4)
        .alias("avg_days_to_ship"),
        F.count(F.lit(1)).alias("n"),
    )


def q48_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group standardization (z-score of order totals within each
    priority) — built-in window form; the applyInPandas twin is pinned
    result-equal in tests/test_ext_ops.py."""
    from pr2_transformation_spark.functions.scoring import zscore_window

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    z = zscore_window(orders, ["o_orderpriority"], "o_totalprice")
    # + 0.0 normalizes IEEE negative zero (round(-1e-5, 4) -> -0.0, which
    # formats as "-0.0" and breaks value-hash comparison against engines
    # that produce +0.0)
    return z.select(
        "o_orderkey", "o_orderpriority",
        (F.round("zscore", 4) + F.lit(0.0)).alias("zscore"),
    )


def q47_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate (all grouping-set combinations of status x priority)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )


def q44_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar feature extraction: events per (day-of-week, hour) —
    F.dayofweek/hour surface over the timestamp column."""
    ev = _events(spark, sf_dir)
    return (
        ev.select(
            F.dayofweek("ts").alias("dow"),
            F.hour("ts").alias("hh"),
        )
        .groupBy("dow", "hh")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def q45_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per group: sample stddev, Pearson
    correlation, sample covariance."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_sd"),
        (F.round(F.corr("l_quantity", "l_extendedprice"), 4) + F.lit(0.0)).alias("qty_price_corr"),
        (F.round(F.covar_samp("l_quantity", "l_discount"), 4) + F.lit(0.0)).alias("qty_disc_cov"),
    )


def q46_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein fuzzy matching via FastSS-style wildcard blocking.

    The (nation, segment) bucket join alone is O(n²/125) — fixed bucket
    cardinality, so candidate pairs grow quadratically at 100×.  Since the
    4-char tails are equal-length, distance <= 1 means identical or ONE
    substitution, so two matching tails must agree on at least one
    single-position wildcard variant (``*bcd``, ``a*cd``, ...).  Blocking
    on (nation, segment, variant) is therefore LOSSLESS for this
    predicate while candidate volume tracks the true near-match count
    (pairs sharing a variant are 1 substitution apart by construction) —
    the candidate join is within a constant factor of the output size,
    which is optimal, instead of n² over fixed buckets."""
    cust = _t(spark, sf_dir, "customer")
    c = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.substring(F.col("c_name"), -4, 4).alias("tail"),
    )
    variants = c.select(
        "k",
        "nk",
        "seg",
        "tail",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.substring("tail", 1, i),
                        F.lit("*"),
                        F.substring("tail", i + 2, 4 - i - 1),
                    )
                    for i in range(4)
                ]
            )
        ).alias("vkey"),
    )
    a, b = variants.alias("a"), variants.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.nk") == F.col("b.nk"))
            & (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.vkey") == F.col("b.vkey"))
            & (F.col("a.k") < F.col("b.k")),
        )
        .select(
            F.col("a.k").alias("k_a"),
            F.col("b.k").alias("k_b"),
            F.col("a.tail").alias("tail_a"),
            F.col("b.tail").alias("tail_b"),
        )
        .distinct()  # a pair can share up to 4 variants (identical tails)
    )
    return (
        pairs.select(F.levenshtein("tail_a", "tail_b").alias("dist"))
        .filter(F.col("dist") <= 1)
        .groupBy("dist")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def q40_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling fan-out (1 asset -> many frames) through
    mapInPandas; codec stubbed but deterministic (sha256 + ASCII frame
    suffix), so the DuckDB oracle replays it exactly.  The doc subset is
    pinned by id (not limit) to keep both engines on the same assets."""
    from pr2_transformation_spark.functions import multimodal

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    media = docs.select(
        F.col("doc_id"), F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return multimodal.sample_frames(media, "payload", "doc_id", every_nth=64)


def q36_duplicate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplication summary (total/distinct/duplicate rows) in
    the SCALE form: distinct-count over the portable 60-bit content hash,
    so the distinct machinery moves 8-byte keys instead of document text —
    and the oracle replays the identical hash, keeping the graded check
    exact.  `dedup.duplicate_stats` remains the text-exact twin
    (equivalence pinned in test_ext_ops)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.duplicate_stats_by_hash(docs, ["text"], hasher="md5")


def q35_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k (coarse-quantizer cells + n_probe probing —
    the second scale path next to hyperplane LSH), SELF-VERIFYING like
    q24: recall vs the in-query exact top-k, asserted against a floor the
    DuckDB oracle pins as TRUE.  Measured recall 0.80/0.70/0.70 at
    sf0.001/0.01/0.1 (16 centroids, 6 probes) — floor 0.5."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    approx = similarity.cosine_topk_ivf(
        corpus, queries, k=5, n_centroids=16, n_probe=6
    )
    exact = similarity.cosine_topk_bruteforce_pandas(corpus, queries, k=5)
    joined = exact.select("query_id", "vec_id").join(
        approx.select("query_id", "vec_id", F.lit(1).alias("__hit")),
        ["query_id", "vec_id"],
        "left",
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.lit(0.5).alias("recall_floor"),
        (
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))) / F.count(F.lit(1))
            >= 0.5
        ).alias("meets_recall_floor"),
    )


def q54_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (status-only, priority-only, grand total)
    with GROUPING() flags disambiguating real NULLs from subtotal rows —
    the general form behind ROLLUP (q29) and CUBE (q47)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


def q55_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily revenue: aggregate-then-window. The
    global (unpartitioned) window frame is safe at any input scale because
    it runs on the *daily* aggregate — cardinality = distinct days, tiny
    by construction after the first groupBy reduces 100 TB to rows-per-day.
    The frame is RANGE over epoch-day (calendar days), not ROWS: with a
    gap in the date series, ROWS(-6, 0) would silently widen the window
    past 7 calendar days — a fixture-blind divergence on dense TPC-H
    dates that a sparse series exposes."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    w = Window.orderBy(
        F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    ).rangeBetween(-6, 0)
    return daily.select(
        F.col("d").cast("string").alias("day"),
        "rev",
        F.round(F.avg("rev").over(w), 4).alias("ma7"),
    )


def q56_rank_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window features per order: quartile (ntile),
    percent_rank, cume_dist within priority — deterministic via the
    (totalprice, orderkey) tie-break."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        (F.round(F.percent_rank().over(w), 4) + F.lit(0.0)).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    )


def q57_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long unpivot (melt) of per-flag measure columns into
    (measure, value) rows — the inverse of q41's pivot."""
    li = _t(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("price"),
        F.round(F.sum("l_discount"), 2).alias("disc"),
    )
    return m.unpivot("l_returnflag", ["qty", "price", "disc"], "measure", "value")


def q58_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column: L2 norm via
    fold (F.aggregate), positive-component count via F.filter, array_max —
    all JVM-side, no UDF (SURVEY.md §2.10 EXT array surface)."""
    emb = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    l2 = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    return emb.select(
        "vec_id",
        F.round(l2, 4).alias("l2_norm"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_positive"),
        (F.round(F.array_max(v), 4) + F.lit(0.0)).alias("max_val"),
    )


def q59_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: orders matched to price bands by interval
    containment, not equality. The band table is broadcast so the
    non-equi condition evaluates as a BroadcastNestedLoopJoin — no
    shuffle of the big side, the only sane plan for interval joins
    against a small dimension."""
    orders = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [
            (0, 0.0, 100_000.0),
            (1, 100_000.0, 200_000.0),
            (2, 200_000.0, 300_000.0),
            (3, 300_000.0, 1e12),
        ],
        "band INT, lo DOUBLE, hi DOUBLE",
    )
    j = orders.join(
        F.broadcast(bands),
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
    )
    return j.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )


def q60_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery pattern: customers whose total spend exceeds the
    all-customer average. The 1-row aggregate is broadcast (crossJoin of
    a broadcast single row = free), never a driver collect."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    spend = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("spend"))
    avg_spend = spend.agg(F.avg("spend").alias("avg_spend"))
    big = spend.crossJoin(F.broadcast(avg_spend)).filter(
        F.col("spend") > F.col("avg_spend")
    )
    return (
        big.join(cust, big["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_big_spenders"),
            F.round(F.sum("spend"), 2).alias("total_spend"),
        )
    )


def q61_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram with per-bucket stats (floor-division
    bucketing — portable across engines, unlike width_bucket)."""
    orders = _t(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50_000).cast("long")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


def q62_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based document curation: per-language keep/drop
    counts plus per-rule failure tallies (so a curation run shows *why*
    documents fail). Pure scan-side expressions — no shuffle except the
    final small groupBy."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    flags = textstats.quality_rule_columns(t)
    d = docs.select(
        "lang",
        textstats.quality_pass(t).alias("keep"),
        *[(~c).cast("int").alias(f"fail_{n[5:]}") for n, c in flags.items()],
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("keep")).alias("n_keep"),
        F.sum("fail_token_count").alias("n_fail_tokens"),
        F.sum("fail_avg_token_len").alias("n_fail_avg_len"),
        F.sum("fail_punct_ratio").alias("n_fail_punct"),
        F.sum("fail_stopword_ratio").alias("n_fail_stopword"),
    )


def q63_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative connected components (min-label propagation) on a
    deterministic chain graph — the dedup-cluster resolution step that
    turns near-dup *pairs* into transitive keep/drop clusters. Oracle is
    a recursive-CTE transitive closure in DuckDB."""
    from pr2_transformation_spark.operators.graph import connected_components

    cust = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    edges = cust.filter(k % 7 != 0).select(k.alias("src"), (k + 3).alias("dst"))
    return connected_components(edges)


def q128_connected_components_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (large-star/small-star) connected components on the SAME
    graph as q63 — O(log n) rounds regardless of diameter (Kiveris et al.
    SoCC'14), sharing q63's recursive-CTE oracle: both algorithms must
    produce the identical transitive closure."""
    from pr2_transformation_spark.operators.graph import (
        connected_components_two_phase,
    )

    cust = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    edges = cust.filter(k % 7 != 0).select(k.alias("src"), (k + 3).alias("dst"))
    return connected_components_two_phase(edges)


def q129_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus-preparation pipeline under the oracle gate:
    quality rules -> md5-hash exact dedup -> MinHash-LSH near-dup removal
    (32 perms / 8 bands, affine md5 mode) with transitive-cluster keepers
    -> 4-gram decontamination vs the doc_id%97 eval slice.  The DuckDB
    oracle replays every stage (quality flags, QUALIFY keeper choice,
    signature/banding arithmetic, recursive-CTE clusters, gram semi-join)
    — the composition, not just each operator, is checked.  PII redaction
    and language filtering are exercised in test_pipeline instead (regex
    dialects differ across engines)."""
    from pr2_transformation_spark.pipeline import prepare_training_corpus

    docs = _t(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    out, _ = prepare_training_corpus(
        train,
        langs=None,
        redact_pii=False,
        near_dup=True,
        jaccard_threshold=0.2,
        eval_docs=eval_docs,
        hasher="md5",
    )
    return out.select("doc_id", "lang", "source")


def q130_segment_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus REWRITE (the mutation counterpart of q120's
    dup-fraction signal): every distinct 10-token segment survives only at
    its first global (doc_id, position) occurrence; documents are rebuilt
    from their surviving segments and fully-claimed documents drop out.
    Graded in ``hasher="md5"`` mode so the DuckDB oracle replays the
    winner election exactly; the corpus text never enters the winner
    shuffle (8-byte hashes + 16-byte claims), and reassembly re-slices
    the original token arrays in one projection."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.segment_dedup_rewrite(docs, segment_tokens=10, hasher="md5")


def q131_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking with overlap (pre-training/RAG chunker):
    16-token chunks on a 12-token stride, so consecutive chunks share 4
    tokens and no boundary phrase is lost.  Pure narrow projection +
    explode — zero shuffles; the token array is bound before the slice
    lambdas so documents tokenize once, not once per chunk."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.chunk_documents(docs, chunk_tokens=16, stride=12)


def q132_png_roundtrip_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-codec round trip under the value-hash gate: each document's id
    deterministically seeds an 8x8 RGB image (byte i = (doc_id*31 + i) %
    251), which is ENCODED to a standard PNG (mixed per-row filters, so
    all five predictors are exercised) and DECODED back by the pure-stdlib
    inflate+reconstruct path — then position-weighted pixel checksums are
    emitted by ``image_checksums``.  The DuckDB oracle replays the pixel
    arithmetic directly (it never sees a PNG), so any encoder or decoder
    defect — wrong filter inverse, scanline offset, channel swap — breaks
    the hash.  Two narrow Arrow-batched stages, zero shuffles."""
    import numpy as np
    import pandas as pd

    from pr2_transformation_spark.functions import multimodal

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        idx = np.arange(8 * 8 * 3, dtype=np.int64)
        for pdf in batches:
            payloads = [
                multimodal.png_encode(
                    ((int(did) * 31 + idx) % 251)
                    .astype(np.uint8)
                    .reshape(8, 8, 3),
                    filters="mixed",
                )
                for did in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(gen, "doc_id long, payload binary")
    return multimodal.image_checksums(media, "payload", "doc_id")


def q133_gif_roundtrip_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF twin of q132: each doc id seeds TWO 8x8 palette images —
    asset ``<id>`` uses a 64-entry palette (index at pixel p =
    (doc_id+p) % 64; palette entry j = (3j%256, 5j%256, 7j%256)) for
    dictionary-depth coverage, and asset ``<id>:b`` uses a 5-entry
    palette (same entry formula, index = (doc_id+p) % 5) whose LZW
    stream's FINAL data code lands exactly on the decoder's phantom-add
    code-width boundary for every doc id — the round-3 encoder bug
    (EOI written narrow after the decoder widened) fails this fixture
    for all 500 docs.  Both are ENCODED with true variable-width LZW
    and DECODED back by the pure-stdlib dictionary decoder;
    ``image_checksums`` emits position-weighted sums the DuckDB oracle
    replays from the palette arithmetic alone — any LZW width desync,
    palette misread, or channel swap breaks the value hash.  Two narrow
    Arrow stages, zero shuffles."""
    import numpy as np
    import pandas as pd

    from pr2_transformation_spark.functions import multimodal

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents").select("doc_id"))
    palette = (np.arange(64, dtype=np.int64)[:, None] * [3, 5, 7] % 256).astype(
        np.uint8
    )

    def gen(batches):
        p = np.arange(64, dtype=np.int64)
        for pdf in batches:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                ids.append(str(int(did)))
                payloads.append(
                    multimodal.gif_encode(
                        palette[(int(did) + p) % 64].reshape(8, 8, 3)
                    )
                )
                ids.append(f"{int(did)}:b")
                payloads.append(
                    multimodal.gif_encode(
                        palette[(int(did) + p) % 5].reshape(8, 8, 3)
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    media = docs.mapInPandas(gen, "doc_id string, payload binary")
    return multimodal.image_checksums(media, "payload", "doc_id")


def q134_jpeg_roundtrip_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG twin of q132/q133 — the hardest codec in the family under the
    value-hash gate: each doc id seeds a 16x16 grayscale image of four
    flat 8x8 blocks (block (by,bx) = (doc_id*7 + 2*by + bx) % 256),
    ENCODED through the full baseline pipeline (FDCT, quant, zigzag,
    Huffman, restart markers every 2 MCUs) and DECODED back by the
    pure-numpy entropy+IDCT path.  quality=100 makes block-flat content
    BIT-exact, so the DuckDB oracle replays the block arithmetic alone —
    a Huffman desync, zigzag slip, predictor bug, or IDCT scale error
    breaks the hash.  Two narrow Arrow stages, zero shuffles."""
    import numpy as np
    import pandas as pd

    from pr2_transformation_spark.functions import multimodal

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        yy, xx = np.mgrid[0:16, 0:16]
        block = (yy // 8) * 2 + (xx // 8)
        for pdf in batches:
            payloads = [
                multimodal.jpeg_encode(
                    ((int(did) * 7 + block) % 256).astype(np.uint8),
                    quality=100,
                    restart_interval=2,
                )
                for did in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(gen, "doc_id long, payload binary")
    return multimodal.image_checksums(media, "payload", "doc_id")


def q135_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance against a fixed 4-term query — scan + one
    scalar partial-aggregate + broadcast cross join; term frequencies are
    HOF filter-counts over the bound token array (no explode, no wide
    shuffle).  The DuckDB oracle replays idf/tf normalization to 4dp."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.bm25_scores(
        docs, ["table", "spark", "query", "vector"]
    )


def q136_vocab_oov_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction + coverage: the top-10 corpus tokens
    (deterministic count-then-lex tie-break, TakeOrdered not global sort)
    broadcast back over the corpus for per-document OOV rates — the
    tokenizer-fit metric.  The corpus shuffles once (token counts); the
    coverage join is map-side against the broadcast vocab."""
    docs = _t(spark, sf_dir, "documents")
    vocab = textstats.vocab_topk(docs, 10)
    return textstats.oov_rates(docs, vocab)


def q137_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion dedup: the doc_id%5==0 slice plays the
    historical corpus (its persisted hash index), the full table plays
    the new batch; batch rows whose text already exists in history — or
    earlier in the batch — are dropped.  Hash-to-hash anti join: history
    contributes 8-byte hashes, batch text never enters a wide shuffle.
    Graded in md5 mode so DuckDB replays the hash election."""
    docs = _t(spark, sf_dir, "documents")
    history = docs.filter(F.col("doc_id") % 5 == 0)
    return dedup.exact_dedup_against(
        docs, history, ["text"], "doc_id", hasher="md5"
    ).select("doc_id", "lang", "source")


def q138_webp_roundtrip_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebP-lossless (VP8L) twin of q132-q134: each doc id seeds an 8x8
    RGBA image (byte i = (doc_id*13 + i) % 256), ENCODED as a literal-only
    VP8L stream (canonical prefix codes built per image) and DECODED back
    by the full spec decoder; ``image_checksums`` emits position-weighted
    sums the DuckDB oracle replays from the byte arithmetic — a prefix
    desync, channel-order slip, or canonical-code bug breaks the hash."""
    import numpy as np
    import pandas as pd

    from pr2_transformation_spark.functions import multimodal

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        idx = np.arange(8 * 8 * 4, dtype=np.int64)
        for pdf in batches:
            payloads = [
                multimodal.webp_encode(
                    ((int(did) * 13 + idx) % 256).astype(np.uint8).reshape(8, 8, 4)
                )
                for did in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(gen, "doc_id long, payload binary")
    return multimodal.image_checksums(media, "payload", "doc_id")


def q139_resize_pipeline_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode -> RESIZE -> feature pipeline under the oracle gate: the
    q132 PNG assets are nearest-neighbor downsampled 8x8 -> 4x4 by
    ``resize_images`` (output pixel (oy,ox) samples source (2oy,2ox)),
    then the raw RGB bytes are checksummed.  The DuckDB oracle replays
    the sampling arithmetic — an off-by-one in the index gather or a
    channel reorder breaks the hash.  Three narrow Arrow stages."""
    import numpy as np
    import pandas as pd

    from pr2_transformation_spark.functions import multimodal

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        idx = np.arange(8 * 8 * 3, dtype=np.int64)
        for pdf in batches:
            payloads = [
                multimodal.png_encode(
                    ((int(did) * 31 + idx) % 251).astype(np.uint8).reshape(8, 8, 3)
                )
                for did in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(gen, "doc_id long, payload binary")
    resized = multimodal.resize_images(media, "payload", "doc_id", 4, 4)

    def sums(batches):
        for pdf in batches:
            out = {"asset_id": [], "width": [], "height": [],
                   "rgb_sum": [], "rgb_wsum": []}
            for aid, w, h, rgb in zip(
                pdf["asset_id"], pdf["width"], pdf["height"], pdf["rgb"]
            ):
                flat = np.frombuffer(bytes(rgb), np.uint8).astype(np.int64)
                out["asset_id"].append(aid)
                out["width"].append(int(w))
                out["height"].append(int(h))
                out["rgb_sum"].append(int(flat.sum()))
                out["rgb_wsum"].append(
                    int((flat * (np.arange(flat.size) + 1)).sum())
                )
            yield pd.DataFrame(out)

    return resized.mapInPandas(
        sums, "asset_id string, width int, height int, rgb_sum long, rgb_wsum long"
    )


def q140_wav_roundtrip_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio twin of the codec round trips: each doc id seeds 64 mono
    int16 PCM frames (sample i = ((doc_id*7 + i*331) % 65536) - 32768),
    ENCODED to a canonical RIFF/WAVE and DECODED back by the pure-numpy
    chunk walker; exact integer checksums replayed by the oracle pin the
    header fields, chunk offsets, and sample byte order end-to-end."""
    import numpy as np
    import pandas as pd

    from pr2_transformation_spark.functions import multimodal

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        i = np.arange(64, dtype=np.int64)
        for pdf in batches:
            rows = {"doc_id": [], "n_frames": [], "sample_rate_hz": [],
                    "sample_sum": [], "sample_wsum": []}
            for did in pdf["doc_id"]:
                pcm = (((int(did) * 7 + i * 331) % 65536) - 32768).astype(np.int16)
                wav = multimodal.wav_encode(pcm, 16000)
                meta = multimodal.wav_decode(wav)
                got = multimodal.pcm_samples(wav)[:, 0].astype(np.int64)
                rows["doc_id"].append(int(did))
                rows["n_frames"].append(int(meta["n_frames"]))
                rows["sample_rate_hz"].append(int(meta["sample_rate_hz"]))
                rows["sample_sum"].append(int(got.sum()))
                rows["sample_wsum"].append(int(((i + 1) * got).sum()))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen,
        "doc_id long, n_frames int, sample_rate_hz int, "
        "sample_sum long, sample_wsum long",
    )


def q141_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction graded end-to-end: the q140 WAV assets
    flow through ``audio_features`` (RMS energy, zero-crossing rate, peak
    over decoded PCM); the oracle recomputes all three from the sample
    arithmetic — lag-window sign changes for ZCR, sqrt-avg-square for
    RMS, both fixed to 4dp strings on both engines."""
    import numpy as np
    import pandas as pd

    from pr2_transformation_spark.functions import multimodal

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        i = np.arange(64, dtype=np.int64)
        for pdf in batches:
            payloads = [
                multimodal.wav_encode(
                    (((int(did) * 7 + i * 331) % 65536) - 32768).astype(np.int16),
                    16000,
                )
                for did in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(gen, "doc_id long, payload binary")
    return multimodal.audio_features(media, "payload", "doc_id")


def q142_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle counting by degree orientation (compact-forward):
    every undirected edge points from its lower-(degree,id) endpoint, so
    each triangle closes exactly once and hub vertices cannot fan out
    degree-squared wedges — the formulation that survives celebrity
    nodes at warehouse scale.  Graph: customer chain edges (c, c+1) for
    c%3!=0 plus skip edges (c, c+2) for even c (triangles at c=4 mod 6).
    The DuckDB oracle counts ordered closed triples directly."""
    from pr2_transformation_spark.operators.graph import triangle_count

    cust = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    edges = (
        cust.filter(k % 3 != 0)
        .select(k.alias("src"), (k + 1).alias("dst"))
        .unionAll(
            cust.filter(k % 2 == 0).select(k.alias("src"), (k + 2).alias("dst"))
        )
    )
    return triangle_count(edges)


def q143_ppmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPMI word association over adjacent-token bigrams (the count side
    of PPMI-SVD embedding training): one corpus-sized explode+group, then
    vocab-sized broadcast marginals and a 1-row total.  Oracle replays
    the ln-ratio to 4dp."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.ppmi_bigrams(docs, min_count=5)


def q144_kneser_ney_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM over the corpus — continuation
    counts, absolute discounting, vocab-sized broadcast marginals; the
    oracle replays the full smoothing formula to 6dp."""
    docs = _t(spark, sf_dir, "documents")
    return textstats.kneser_ney_bigrams(docs, discount=0.75, min_count=5)


def q145_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank over the directed customer chain+skip graph
    — the edge list is partitioned and checkpointed once, each iteration
    moves only the 16-byte (vertex, rank) frame, and the fixed iteration
    count keeps the driver out of the loop.  The DuckDB oracle unrolls
    the same three closed-form iterations."""
    from pr2_transformation_spark.operators.graph import pagerank

    cust = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    edges = (
        cust.filter(k % 3 != 0)
        .select(k.alias("src"), (k + 1).alias("dst"))
        .unionAll(
            cust.filter(k % 2 == 0).select(k.alias("src"), (k + 2).alias("dst"))
        )
    )
    return pagerank(edges, iterations=3)


def q146_compression_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality signal, SELF-VERIFYING: DuckDB
    cannot replay deflate, but it CAN pin the doc count, the exact raw
    byte total, and the contract that every ratio is positive and
    bounded (tiny docs can exceed 1.0 from the zlib header, never 1.2) —
    a broken UDF (wrong column, nulls, misaligned batches) flips a
    boolean or the byte total.  Exact byte/ratio values are pinned
    against stdlib zlib in tests/test_ext_ops.py."""
    from pr2_transformation_spark.functions.scoring import compression_ratio

    docs = _t(spark, sf_dir, "documents")
    out = compression_ratio(docs)
    return out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        (
            F.sum(
                F.when(
                    (F.col("compression_ratio") > 0)
                    & (F.col("compression_ratio") <= 1.2),
                    0,
                ).otherwise(1)
            )
            == 0
        ).alias("all_ratios_bounded"),
        (F.avg("compression_ratio") < 1.0).alias("corpus_compresses"),
    )


def q147_spectral_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-domain audio features graded end-to-end: each doc id
    seeds a pure int16 sine at an exact FFT bin (bin 16*(1 + doc_id%30)
    of a 1024-point transform at 8 kHz => frequency 125*(1+doc_id%30) Hz
    exactly — integer, below Nyquist, no leakage), so dominant bin, centroid, and 85% rolloff all
    collapse to the same closed-form integer the DuckDB oracle computes
    — an FFT scaling, bin-indexing, or weighting bug breaks the hash."""
    import numpy as np
    import pandas as pd

    from pr2_transformation_spark.functions import multimodal

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents").select("doc_id"))
    rate, n = 8000, 1024

    def gen(batches):
        t = np.arange(n) / rate
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                hz = 125.0 * (1 + int(did) % 30)
                pcm = (np.sin(2 * np.pi * hz * t) * 20000).astype(np.int16)
                payloads.append(multimodal.wav_encode(pcm, rate))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = docs.mapInPandas(gen, "doc_id long, payload binary")
    return multimodal.spectral_features(media, "payload", "doc_id")


def q148_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic: top-10 heaviest l_partkey values with
    row shares — the pre-flight check that decides salting vs AQE before
    a join on the key.  TakeOrdered top-k, no global sort."""
    li = _t(spark, sf_dir, "lineitem")
    return profiling.key_skew_report(li, "l_suppkey", top_k=10)


def q149_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals (20 buckets over [0, 600k]):
    one 8-byte-bucket shuffle; width_bucket-clamped semantics replayed by
    the oracle."""
    orders = _t(spark, sf_dir, "orders")
    return profiling.equi_width_histogram(
        orders, "o_totalprice", bins=20, lo=0.0, hi=600000.0
    )


def q150_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations over lineitem's numeric measures in
    ONE partial-aggregated pass (each corr is an algebraic aggregate —
    no per-pair scans, no shuffle of raw rows)."""
    li = _t(spark, sf_dir, "lineitem")
    pairs = [
        ("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"),
        ("l_extendedprice", "l_discount"),
        ("l_extendedprice", "l_tax"),
    ]
    return li.agg(
        *[
            F.round(F.corr(a, b), 6).alias(f"corr_{a[2:]}_{b[2:]}")
            for a, b in pairs
        ]
    )


def q151_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between two categorical columns (returnflag x
    linestatus) from the contingency table: one (a,b) count shuffle, two
    broadcast marginals, the same ln-ratio shape as PPMI — the
    column-dependence profile a schema-inference pass runs."""
    li = _t(spark, sf_dir, "lineitem")
    joint = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_ab")
    )
    ma = joint.groupBy("l_returnflag").agg(F.sum("n_ab").alias("n_a"))
    mb = joint.groupBy("l_linestatus").agg(F.sum("n_ab").alias("n_b"))
    tot = joint.agg(F.sum("n_ab").alias("n"))
    terms = (
        joint.join(F.broadcast(ma), "l_returnflag")
        .join(F.broadcast(mb), "l_linestatus")
        .crossJoin(F.broadcast(tot))
        .select(
            (
                F.col("n_ab")
                / F.col("n")
                * F.log(
                    F.col("n_ab") * F.col("n") / (F.col("n_a") * F.col("n_b"))
                )
            ).alias("term")
        )
    )
    return terms.agg(F.round(F.sum("term"), 6).alias("mutual_information"))


def q152_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from an event history: each (user,
    event) row becomes a validity interval [ts, next-change ts), with the
    open current row flagged — the warehouse pattern for replaying any
    point-in-time state.  One window shuffle keyed on the entity; the
    oracle replays lead() exactly.  Timestamps surface as epoch BIGINTs
    (contract note at module top)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").cast("long").alias("valid_from_epoch"),
        F.lead(F.col("ts").cast("long")).over(w).alias("valid_to_epoch"),
        F.lead(F.col("ts")).over(w).isNull().alias("is_current"),
    )


def q153_bpe_tokenizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BPE tokenizer end-to-end, SELF-VERIFYING: 200 merges trained
    on the corpus word-frequency table (one shuffle + a vocab-bounded
    collect — training iterates over the vocab, never the corpus, exactly
    like the reference implementations), then applied distributed.  The
    DuckDB oracle pins everything deterministic: exact per-doc word
    counts, the BPE round-trip invariant (subwords always concatenate
    back to their word), and the compression bound n_words <= n_subwords
    <= n_chars+n_words (every word is 1..len(word)+1 subwords).  Exact
    merge semantics are pinned by tests on the textbook corpus."""
    from pr2_transformation_spark.functions import tokenizer

    docs = _t(spark, sf_dir, "documents")
    merges = tokenizer.train_bpe(tokenizer.word_frequencies(docs), 200)
    out = tokenizer.apply_bpe(docs, merges)
    return out.select(
        "doc_id",
        "n_words",
        "roundtrip_ok",
        (
            (F.col("n_subwords") >= F.col("n_words"))
            & (F.col("n_subwords") <= F.col("n_words") * 25)
        ).alias("subword_count_bounded"),
    )


def q154_grouped_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form per-group OLS (price ~ quantity per return flag) via
    the algebraic regr_* aggregates — one partial-aggregated pass, the
    moment sums compose map-side like any sum, so the fit is a single
    narrow shuffle at any corpus size."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("regr_slope(l_extendedprice, l_quantity)"), 4).alias("slope"),
        F.round(
            F.expr("regr_intercept(l_extendedprice, l_quantity)"), 4
        ).alias("intercept"),
        F.round(F.expr("regr_r2(l_extendedprice, l_quantity)"), 6).alias("r2"),
        F.count(F.lit(1)).alias("n"),
    )


def q155_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of supplier revenue concentration — the
    inequality summary that quantifies how skewed a key's mass is (the
    corpus-level counterpart of q148's top-k report).  Computed from the
    rank formulation ``G = (2*sum(i*x_i)/(n*sum(x)) - (n+1)/n)`` over
    revenue-ranked suppliers: one agg shuffle + one vocab-sized window."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .alias("revenue")
    )
    w = Window.orderBy(F.col("revenue"), F.col("l_suppkey"))
    ranked = rev.withColumn("i", F.row_number().over(w))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("revenue"))
            / (F.count(F.lit(1)) * F.sum("revenue"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


def q156_video_roundtrip_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video round trip — the triad-completing twin of q134/q140:
    each doc id seeds a 2-frame 16x16 grayscale MJPEG-AVI (frame f block
    (by,bx) = (doc_id*5 + 101*f + 2*by + bx) % 256), MUXED into a
    standard RIFF AVI and DEMUXED + JPEG-decoded back; position-weighted
    checksums over the concatenated frames are replayed by the oracle
    from the block arithmetic.  A container-offset slip, frame-order
    swap, or JPEG defect breaks the hash."""
    import numpy as np
    import pandas as pd

    from pr2_transformation_spark.functions import multimodal

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        yy, xx = np.mgrid[0:16, 0:16]
        block = (yy // 8) * 2 + (xx // 8)
        for pdf in batches:
            rows = {"doc_id": [], "n_frames": [], "width": [], "height": [],
                    "pixel_sum": [], "pixel_wsum": []}
            for did in pdf["doc_id"]:
                frames = [
                    ((int(did) * 5 + 101 * f + block) % 256).astype(np.uint8)
                    for f in range(2)
                ]
                avi = multimodal.avi_encode(frames, fps=25)
                meta = multimodal.avi_decode(avi)
                decoded = multimodal.avi_frames(avi)
                flat = np.concatenate(
                    [d[:, :, 0].reshape(-1) for d in decoded]
                ).astype(np.int64)
                rows["doc_id"].append(int(did))
                rows["n_frames"].append(int(meta["n_frames"]))
                rows["width"].append(int(meta["width"]))
                rows["height"].append(int(meta["height"]))
                rows["pixel_sum"].append(int(flat.sum()))
                rows["pixel_wsum"].append(
                    int((flat * (np.arange(flat.size) + 1)).sum())
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen,
        "doc_id long, n_frames int, width int, height int, "
        "pixel_sum long, pixel_wsum long",
    )


def q157_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training hard negatives: for 10 anchor embeddings, the
    3 most-similar vectors with a DIFFERENT label (broadcast anchors vs
    corpus scan, label filter before ranking).  The oracle replays the
    cosine ranking with the same deterministic tie-break."""
    emb = _t(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("anchor_id"), "embedding", "label"
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    return similarity.hard_negative_mining(corpus, anchors, k=3)


def q158_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering: documents ranked by the deterministic
    quality heuristic into 4 difficulty tiers (ntile), with per-tier
    stats — the ordering pass before `write_sorted_shards` lays the
    corpus out easy-to-hard for curriculum training.  floor(score*10000)
    keys the rank (the 4dp-tie-safe form the quality docstring
    prescribes)."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.floor(textstats.quality_score_raw(F.col("text")) * 10000)
        .cast("long")
        .alias("q10k"),
    )
    w = Window.orderBy(F.col("q10k").desc(), F.col("doc_id"))
    tiered = scored.withColumn("tier", F.ntile(4).over(w))
    return tiered.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("q10k").alias("min_q10k"),
        F.max("q10k").alias("max_q10k"),
    )


def q159_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT |A∩B| / |A| (Broder): catches
    quotes and doc-in-doc duplication that symmetric Jaccard misses when
    sizes differ.  Same posting-list inverted index as q21 (one narrow
    shuffle, pair fan-out bounded by true overlap), but each ordered
    pair normalizes by ITS OWN shingle count."""
    docs = _t(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.array_distinct(textstats.word_shingles(F.col("text"), 3)).alias("sh"),
    ).select("doc_id", F.size("sh").alias("sz"), F.explode("sh").alias("s"))
    posts = (
        sh.groupBy("s")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "sz"))).alias("docs"))
        .filter(F.size("docs") > 1)
    )
    pair_expr = """
        flatten(transform(docs, (x, i) ->
            transform(slice(docs, i + 2, size(docs) - i - 1), y ->
                struct(x.doc_id AS id_a, y.doc_id AS id_b,
                       x.sz AS sz_a, y.sz AS sz_b))))
    """
    inter = (
        posts.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.*")
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.select(
            "id_a",
            "id_b",
            F.round(F.col("n_common") / F.col("sz_a"), 4).alias("containment_a"),
            F.round(F.col("n_common") / F.col("sz_b"), 4).alias("containment_b"),
        )
        .filter(
            (F.col("containment_a") >= 0.8) | (F.col("containment_b") >= 0.8)
        )
    )


def q64_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct counts next to exact ones
    (sketch implementations differ across engines, so rows-only; the
    3-sigma accuracy contract is pinned in tests/test_ext_ops.py)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.count_distinct("l_partkey").alias("exact_parts"),
    )


def q65_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median plus deterministic mode per group. Spark's ``mode()``
    breaks ties arbitrarily, so the mode is computed as ``max_by`` over a
    zero-padded (count, value) sort key — identical tie-break on both
    engines, and still a single pair of partial-aggregated shuffles."""
    orders = _t(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    sort_key = F.concat(
        F.lpad(F.col("cnt").cast("string"), 10, "0"), F.col("o_orderstatus")
    )
    mode = counts.groupBy("o_orderpriority").agg(
        F.max_by("o_orderstatus", sort_key).alias("mode_status")
    )
    med = orders.groupBy("o_orderpriority").agg(
        F.round(F.median("o_totalprice"), 2).alias("median_price"),
        F.count(F.lit(1)).alias("n"),
    )
    return med.join(mode, "o_orderpriority")


def q66_sorted_list_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered list aggregation: per-group sorted distinct arrays
    (``array_sort(collect_set)``) — collection aggregates are
    order-nondeterministic across partitions, so the sort makes the
    result canonical (and hash-comparable)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_sort(F.collect_set("l_linestatus")).alias("statuses"),
        F.array_sort(F.collect_set(F.col("l_linenumber").cast("long"))).alias(
            "linenumbers"
        ),
        F.count(F.lit(1)).alias("n"),
    )


def q67_embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label dimension-wise centroid via posexplode — the
    lateral-view/ordinality surface, and the reduce step of k-means-style
    embedding clustering. Explode emits narrow (label, pos, val) rows, so
    the shuffle is (labels × dims) after partial aggregation regardless of
    corpus size."""
    emb = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return (
        emb.select("label", F.posexplode(v).alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("val"), 4).alias("centroid"), F.count(F.lit(1)).alias("n"))
    )


def q68_first_last_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an unbounded frame per
    customer (deterministic (date, key) ordering), reduced to one row per
    customer with a row_number filter."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.select(
            "o_custkey",
            F.first("o_totalprice").over(wall).alias("first_price"),
            F.last("o_totalprice").over(wall).alias("last_price"),
            F.nth_value("o_totalprice", 2).over(wall).alias("second_price"),
            F.count(F.lit(1)).over(wall).alias("n_orders"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def q69_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split — the reproducible alternative to
    ``randomSplit`` for training-data pipelines. Bucket = first md5 byte of
    the key mod 10 (split is a pure scan-side expression: stable across
    runs, engines, and partitionings; no shuffle until the tiny final agg).
    Hex digits are decoded with instr() against a constant alphabet so the
    exact same integer arithmetic runs on both engines."""
    orders = _t(spark, sf_dir, "orders")
    d1 = "instr('0123456789abcdef', substr(md5(cast(o_orderkey as string)), 1, 1)) - 1"
    d2 = "instr('0123456789abcdef', substr(md5(cast(o_orderkey as string)), 2, 1)) - 1"
    bucket = F.expr(f"(({d1}) * 16 + ({d2})) % 10")
    split = (
        F.when(bucket < 8, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return orders.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


def q70_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: documents (per language, in stable doc_id
    order) are laid out contiguously and cut into 8192-token bins by the
    exclusive cumulative token count — the shard-planning step before
    writing training sequences. One window pass; bin assignment is pure
    arithmetic on the running sum."""
    docs = _t(spark, sf_dir, "documents")
    toks = textstats.token_count(F.col("text"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = docs.select("lang", "doc_id", toks.alias("toks")).withColumn(
        "offset", F.coalesce(F.sum("toks").over(w), F.lit(0))
    )
    return (
        d.groupBy("lang", (F.floor(F.col("offset") / 8192)).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("toks").alias("tokens"))
    )


def q71_source_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus composition (docs, distinct languages, mean length,
    corpus share) — the crawl-mix report a curation run starts from. The
    share denominator is a window sum over the already-aggregated rows
    (cardinality = sources), not a second scan."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )
    total = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        "source",
        "n_docs",
        "n_langs",
        "avg_chars",
        F.round(F.col("n_docs") / F.sum("n_docs").over(total), 4).alias("share"),
    )


def q72_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-then-dedup: lowercase, strip non-alphanumerics,
    collapse whitespace, then count exact duplicates of the *normalized*
    text per language — catches near-dups that differ only in case,
    punctuation, or spacing. Normalization is scan-side; the distinct-count
    shuffle carries one normalized string per doc."""
    docs = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"[^a-z0-9 ]", ""),
        r" +",
        " ",
    )
    return docs.select("lang", norm.alias("norm")).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("norm").alias("n_distinct"),
        (F.count(F.lit(1)) - F.count_distinct("norm")).alias("n_dups"),
    )


def q73_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (change-data-capture between two table versions):
    FULL OUTER JOIN on the key, classify added / removed / changed /
    unchanged. The two versions are derived deterministically from orders
    (drop-by-modulus + price restatement) so the oracle sees identical
    inputs. At scale both sides shuffle on the key once — or zero times if
    the snapshots are bucket-partitioned on it (SCALE.md)."""
    orders = _t(spark, sf_dir, "orders")
    v1 = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey", F.col("o_totalprice").alias("price1")
    )
    v2 = orders.filter(F.col("o_orderkey") % 89 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 10 == 0, F.round(F.col("o_totalprice") * 1.1, 2)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("price2"),
    )
    j = v1.join(v2, "o_orderkey", "full_outer")
    status = (
        F.when(F.col("price1").isNull(), F.lit("added"))
        .when(F.col("price2").isNull(), F.lit("removed"))
        .when(F.col("price1") != F.col("price2"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.groupBy(status.alias("status")).agg(F.count(F.lit(1)).alias("n"))


def q74_validity_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2-style validity intervals: each event's state is valid until the
    user's next event (lead over a (user, ts, id) window). Surfaces
    interval counts and mean duration per event type; open intervals
    (latest per user) are counted separately. Microsecond integer
    arithmetic on both engines — no float time math."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "event_type",
        F.unix_micros("ts").alias("t0"),
        F.unix_micros(F.lead("ts").over(w)).alias("t1"),
    )
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("t1").alias("n_closed"),
        F.round(F.avg((F.col("t1") - F.col("t0")) / 1_000_000.0), 2).alias(
            "avg_valid_sec"
        ),
    )


def q75_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top term per document: explode→count for tf, a per-term
    aggregate for df, the corpus size as a broadcast 1-row aggregate, and a
    per-doc row_number to pick the winner (score desc, term asc tie-break).
    Three shuffles total — tf (doc,term), df (term), and the final window
    on doc — each carrying counts, never text."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    terms = docs.select("doc_id", F.explode(toks).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dft, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "term", F.round("score", 4).alias("tfidf"))
    )


def q76_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 bigrams per language for n-gram LM stats. Bigram assembly is
    a JVM-side higher-order function over the token array — no UDF, no
    self-join; only the (lang, bigram) counts shuffle.  zip_with over two
    shifted slices is the formulation that stays O(tokens): the earlier
    sequence(1, n-1) + element_at(i) lambda re-walked the array per index
    (O(tokens²) interpreted) and benched 9x slower on this corpus."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n = F.size(toks)
    # slice(…, 1, n-1) zip slice(…, 2, n-1): adjacent pairs; n=1 gives two
    # empty slices, so single-token docs fall out without a guard.
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    counts = (
        docs.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("lang", "bigram", "n", "rn")
    )


def q77_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language lexical diversity: mean type-token ratio (distinct
    tokens / tokens per doc) and mean token count — array_distinct runs
    scan-side, so the shuffle is one row per language."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    ttr = F.size(F.array_distinct(toks)) / F.size(toks)
    return (
        docs.select("lang", ttr.alias("ttr"), F.size(toks).alias("ntok"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("ttr"), 4).alias("avg_ttr"),
            F.round(F.avg("ntok"), 2).alias("avg_tokens"),
        )
    )


def q78_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE window frame (6 PRECEDING on the day *number*):
    unlike q55's ROWS frame, calendar gaps shrink the window — the correct
    trailing-7-days semantics when days can be missing. Same
    aggregate-then-window posture: the frame runs over the daily rollup."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    dnum = F.datediff(F.col("d"), F.lit("1970-01-01"))
    w = Window.orderBy(dnum).rangeBetween(-6, 0)
    return daily.select(
        F.col("d").cast("string").alias("day"),
        "rev",
        F.round(F.sum("rev").over(w), 2).alias("rev_7d"),
    )


def q79_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-segment keep rates from
    operators/sampling.py (hash-bucket membership — reproducible across
    runs/engines/partitionings, unlike df.sample). Reports kept vs total
    per stratum so the realized rate is visible next to the target."""
    from pr2_transformation_spark.operators.sampling import hash_bucket

    cust = _t(spark, sf_dir, "customer")
    rates = {
        "AUTOMOBILE": 0.5,
        "BUILDING": 0.25,
        "FURNITURE": 0.1,
        "HOUSEHOLD": 1.0,
        "MACHINERY": 0.05,
    }
    bucket = hash_bucket("c_custkey")
    thr = F.lit(None).cast("int")
    for seg, fr in rates.items():
        thr = F.when(F.col("c_mktsegment") == seg, int(fr * 10_000)).otherwise(thr)
    return cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count_if(bucket < thr).alias("n_kept"),
        F.round(F.count_if(bucket < thr) / F.count(F.lit(1)), 4).alias("rate"),
    )


def q80_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible corpus shuffle: global order by md5(key) — the
    training-data shuffle that doesn't change when the pipeline reruns.
    Top-100 via orderBy+limit compiles to TakeOrderedAndProject
    (per-partition top-k, then a 100-row merge on one reducer — never a
    global sort); the row_number window runs on the 100 survivors only.
    The full-corpus form of this layout is Catalog.write_sorted_shards
    keyed on the hash."""
    docs = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    top = docs.select("doc_id", h.alias("h")).orderBy("h", "doc_id").limit(100)
    w = Window.orderBy("h", "doc_id")
    return top.select("doc_id", F.row_number().over(w).alias("shuffle_rank"))


def q81_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (context windows of 64 tokens,
    stride 48 → 16-token overlap): chunk counts and per-chunk token totals
    computed entirely with array HOFs (sequence/transform/slice) — no
    explode, no UDF; the per-doc result is narrow."""
    docs = _t(spark, sf_dir, "documents")
    # bind the token array before the transform() lambda: the lambda body
    # embeds its free expressions, so an unbound split here would
    # re-tokenize the document once per chunk (see winnowing_fingerprints)
    toks = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("__toks")
    )
    n = F.size("__toks")
    chunk_sizes = F.transform(
        F.sequence(F.lit(0), F.floor((n - 1) / 48).cast("int")),
        lambda i: F.size(F.slice(F.col("__toks"), i * 48 + 1, 64)),
    )
    return toks.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(chunk_sizes).alias("n_chunks"),
        F.aggregate(chunk_sizes, F.lit(0), lambda a, x: a + x).alias("chunk_tokens"),
    )


def q82_reaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Algebraic re-aggregation: monthly stats composed from *daily partial
    aggregates* (sum-of-sums, sum-of-counts, min-of-mins, avg = Σsum/Σn) —
    the incremental-rollup pattern where yesterday's partials never get
    rescanned. Correct because sum/count/min/max are algebraic; avg is
    re-derived, never averaged-of-averages."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("s"),
        F.count(F.lit(1)).alias("c"),
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
    )
    return (
        daily.groupBy(F.date_format("d", "yyyy-MM").alias("month"))
        .agg(
            F.sum("c").alias("n"),
            F.round(F.sum("s"), 2).alias("total"),
            F.round(F.min("mn"), 2).alias("min_price"),
            F.round(F.max("mx"), 2).alias("max_price"),
            F.round(F.sum("s") / F.sum("c"), 2).alias("avg_price"),
        )
    )


def q83_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): each stage's timestamp
    must follow the previous stage's. Three co-partitioned user-key
    aggregations (every shuffle is on user_id, so at scale the stages
    reuse one partitioning); time kept as integer microseconds."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("t")
    )
    view = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("t").alias("t_view")
    )
    click = (
        ev.filter(F.col("event_type") == "click")
        .join(view, "user_id")
        .filter(F.col("t") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_click"))
    )
    purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .join(click, "user_id")
        .filter(F.col("t") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_purchase"))
    )
    users = ev.select("user_id").distinct()
    j = (
        users.join(view, "user_id", "left")
        .join(click, "user_id", "left")
        .join(purchase, "user_id", "left")
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_viewed"),
        F.count("t_click").alias("n_clicked"),
        F.count("t_purchase").alias("n_purchased"),
        F.round(F.count("t_purchase") / F.count("t_view"), 4).alias(
            "view_to_purchase"
        ),
    )


def q84_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality assertion report: null keys, key uniqueness, referential
    integrity (orphan orders), domain ranges — each check one small
    aggregate, unioned into a (check, n_violations) frame. The orphan check
    is a LEFT ANTI join (no row explosion); everything else is scan-side
    count_if."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(name).alias("check"), F.col("n").cast("long"))

    checks = [
        one(
            "orders_null_custkey",
            orders.agg(F.count_if(F.col("o_custkey").isNull()).alias("n")),
        ),
        one(
            "orders_dup_orderkey",
            orders.groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.count_if(F.col("c") > 1).alias("n")),
        ),
        one(
            "orders_orphan_custkey",
            orders.join(
                cust, orders["o_custkey"] == cust["c_custkey"], "left_anti"
            ).agg(F.count(F.lit(1)).alias("n")),
        ),
        one(
            "orders_nonpositive_price",
            orders.agg(F.count_if(F.col("o_totalprice") <= 0).alias("n")),
        ),
        one(
            "lineitem_dup_line",
            li.groupBy("l_orderkey", "l_linenumber")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.count_if(F.col("c") > 1).alias("n")),
        ),
        one(
            "lineitem_discount_range",
            li.agg(
                F.count_if(
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
                ).alias("n")
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def q85_zvalue_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-value (operators/zorder.py) computed per customer — proven
    bit-for-bit identical to an independent engine's shift/mask arithmetic
    by the oracle. This is the layout key write_sorted_shards would range-
    partition on for two-column data skipping."""
    from pr2_transformation_spark.operators.zorder import z_value

    cust = _t(spark, sf_dir, "customer")
    x = F.col("c_custkey") % 64
    y = F.col("c_nationkey").cast("long") % 64
    return cust.select(
        "c_custkey",
        z_value(x, y, bits=6).alias("z"),
    )


def q86_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped shipping-priority query: selective dimension filter
    broadcast into a fact-fact join, then a high-cardinality groupBy pruned
    by a HAVING threshold (threshold instead of top-k keeps the result a
    deterministic SET — no cross-engine float-ordering hazard)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", F.to_date("o_orderdate").cast("string").alias("orderdate"))
        # Sum integer cents, not doubles: the per-term product is IEEE-identical
        # across engines, but double-sum order is not — cent-longs are exact.
        .agg(
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100,
                        0,
                    ).cast("long")
                )
                / 100.0,
                2,
            ).alias("revenue")
        )
        .filter(F.col("revenue") > 100000.0)
    )


def q87_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped 6-way join (two facts + four dims) with the
    local-supplier constraint c_nationkey = s_nationkey. Region/nation fold
    into one broadcast; AQE picks broadcast for supplier/customer at small
    SF and sort-merge at scale."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    local_nations = F.broadcast(
        nat.join(reg, nat["n_regionkey"] == reg["r_regionkey"]).select(
            "n_nationkey", "n_name"
        )
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(local_nations, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def q88_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped EXISTS: orders counted by priority when at least one
    lineitem shipped > 60 days after the order date. The correlated EXISTS
    compiles to one LEFT SEMI join with a non-equi residual — no row
    explosion for multi-lineitem orders."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_late_orders"))


def q89_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped argmax: per-supplier revenue over a ship-date
    window, then keep the supplier(s) equal to the global max. The max is
    an empty-partition window over the ALREADY-AGGREGATED frame (one row
    per supplier — bounded), so lineitem is scanned exactly once
    (tests/test_plans.py pins the single scan); a scalar-subquery join
    would re-derive the aggregate from a second scan. Comparison happens
    on the ROUNDED value on both engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    top = (
        rev.withColumn(
            "mx", F.max("total_revenue").over(Window.partitionBy())
        )
        .filter(F.col("total_revenue") == F.col("mx"))
        .drop("mx")
    )
    return (
        top.join(F.broadcast(supp), top["l_suppkey"] == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q90_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrency: each event opens a 5-minute activity
    interval; +1/-1 deltas, per-type running sum, max. Ordering (t, d) puts
    closes before opens at the same instant; within a tie group all deltas
    are equal so the running max is order-invariant — deterministic without
    a total order. Parallelism is per event_type (the partition key)."""
    ev = _events(spark, sf_dir).select(
        "event_type", F.unix_micros("ts").alias("t")
    )
    deltas = ev.select("event_type", "t", F.lit(1).alias("d")).unionByName(
        ev.select(
            "event_type", (F.col("t") + F.lit(300_000_000)).alias("t"),
            F.lit(-1).alias("d"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = deltas.withColumn("c", F.sum("d").over(w))
    return running.groupBy("event_type").agg(
        F.max("c").cast("long").alias("peak_concurrency")
    )


def q91_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type mix — a behavioral
    diversity feature. The wide exchange is the (user_id, event_type)
    groupBy over raw events; the window's user_id exchange and the final
    groupBy then operate on the aggregated frame (<= users x event types
    rows), so data volume collapses before any re-partitioning."""
    ev = _events(spark, sf_dir)
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    p = F.col("c") / F.sum("c").over(Window.partitionBy("user_id"))
    return (
        counts.withColumn("plogp", p * F.log(p))
        .groupBy("user_id")
        .agg(
            F.sum("c").alias("n_events"),
            F.round(-F.sum("plogp"), 4).alias("entropy"),
        )
    )


def q92_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    lead() under a (ts, event_id) total order — event_id breaks timestamp
    ties deterministically — then conditional probabilities via a window
    over the source state."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("t"), "event_id"
    )
    seq = Window.partitionBy("user_id").orderBy("t", "event_id")
    pairs = ev.withColumn("next_type", F.lead("event_type").over(seq)).filter(
        F.col("next_type").isNotNull()
    )
    counts = pairs.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.select(
        "event_type",
        "next_type",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(Window.partitionBy("event_type")), 4
        ).alias("p"),
    )


def q93_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters (functions/sketches.py): bounded-memory
    per-partition candidate pass (10 counters vs ~50k distinct keys, no
    shuffle), then exact counts for candidates only via broadcast semi-join.
    Skew is synthesized deterministically (two hot keys at ~1/6 of rows
    each over a long cold tail); result is EXACT, oracle is the plain
    GROUP BY ... HAVING the sketch path avoids shuffling."""
    from pr2_transformation_spark.functions.sketches import heavy_hitters

    li = _t(spark, sf_dir, "lineitem").select(
        F.when(
            F.col("l_orderkey") % 3 == 0,
            F.concat(F.lit("hot-"), (F.col("l_orderkey") % 2).cast("string")),
        )
        .otherwise(F.concat(F.lit("cold-"), F.col("l_orderkey").cast("string")))
        .alias("k")
    )
    return heavy_hitters(li, "k", support=0.10)


def q94_near_dup_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus canonicalization: exact bigram-Jaccard pairs at
    0.5 (posting-list index, same operator as q21) → connected components
    (min-label propagation) → per-document (cluster, keep) decision with
    singletons as their own keepers. This is the full dedup pass a
    training-data pipeline runs before sampling; every stage is
    deterministic so the DuckDB oracle replays it with a recursive CTE."""
    from pr2_transformation_spark.operators.graph import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", n=2, min_jaccard=0.5, bucket_cols=["lang", "source"]
    )
    return dedup_clusters(pairs, docs, "doc_id", "id_a", "id_b")


def q95_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand by retail price with dense_rank — ties KEPT,
    so the result is a deterministic set (no arbitrary row drop at rank
    boundaries). Spark plans the rank filter as WindowGroupLimit: each
    shuffle partition pre-truncates to its local top-k before the window
    sort, so no partition ever materializes a full brand."""
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        part.withColumn("rnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rnk")
    )


def q96_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-day activity streaks per user. The
    classic date - row_number() grouping trick — island id is constant
    within a streak. Everything is keyed on user_id; distinct days,
    numbering, and streak aggregation share one partitioning."""
    ev = _events(spark, sf_dir)
    days = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "isl", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "isl").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("longest_streak"),
        F.sum("len").alias("active_days"),
    )


def q97_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (approx_percentile / GK at accuracy
    10000) per order priority — the single-pass scale path where exact
    percentiles (q43) would need a per-group sort. Sketch internals are
    engine-specific, so this is a rows-only check; the 1%-of-exact
    tolerance contract is pinned in tests/test_ext_ops.py."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile_approx(
            "o_totalprice", [0.25, 0.5, 0.75], 10000
        ).alias("price_quartiles"),
        F.count(F.lit(1)).alias("n"),
    )


def q98_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted priority sampling: per source, keep the 5 documents with
    the smallest hash/weight priority (weight = n_chars, so longer docs
    are proportionally likelier — the A-Res scheme with an integer-only
    priority that is bit-identical across engines: md5 hex digits decoded
    with instr(), integer division by the weight). One window per source
    partition; no RNG, so the sample is reproducible run-to-run."""
    docs = _t(spark, sf_dir, "documents")
    d = [
        f"(instr('0123456789abcdef', substr(md5(cast(doc_id as string)), {i}, 1)) - 1)"
        for i in (1, 2, 3, 4)
    ]
    h = f"((({d[0]} * 16 + {d[1]}) * 16 + {d[2]}) * 16 + {d[3]})"
    prio = F.expr(f"(cast({h} as bigint) * 1000000) div greatest(n_chars, 1)")
    w = Window.partitionBy("source").orderBy("prio", "doc_id")
    return (
        docs.withColumn("prio", prio)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("source", "doc_id", "n_chars", "prio", "rn")
    )


def _cent_sum(expr) -> F.Column:
    """Cent-exact revenue sum (per-term round to integer cents, sum longs,
    divide once) — the double-sum-order-portable aggregation used by every
    revenue query since q86."""
    return F.round(F.sum(F.round(expr * 100, 0).cast("long")) / 100.0, 2)


def q99_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped bidirectional nation-pair volume: supplier nation x
    customer nation with a disjunctive pair predicate and per-year revenue.
    Both nation lookups are one broadcast each (25 rows); the disjunction
    runs as a post-join residual on the already-joined fact rows, so the
    big join keys stay simple equi-keys Catalyst can shuffle-plan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    n1 = F.broadcast(nat.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nat.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_cent_sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("volume"))
    )


def q100_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-shaped market share: NATION_3's share of STANDARD-part
    revenue sold to EUROPE customers, by order year. The share is a ratio
    of two conditional cent-sums computed in ONE aggregation — no second
    scan, no join-back; integer cents make the ratio bit-stable."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_nations = F.broadcast(
        nat.join(reg, nat["n_regionkey"] == reg["r_regionkey"]).select(
            F.col("n_nationkey").alias("c_nk")
        )
    )
    vol_cents = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100, 0
    ).cast("long")
    joined = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(eu_nations, cust["c_nationkey"] == F.col("c_nk"))
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(
            F.broadcast(
                nat.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
            ),
            F.col("s_nationkey") == F.col("s_nk"),
        )
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol_cents).otherwise(F.lit(0))).alias("nation_cents"),
            F.sum(vol_cents).alias("total_cents"),
        )
        .select(
            "o_year",
            F.round(F.col("nation_cents") / F.col("total_cents"), 6).alias("mkt_share"),
            F.round(F.col("total_cents") / 100.0, 2).alias("total_volume"),
        )
    )


def q101_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-shaped profit by supplier nation and year. The testdata has
    no partsupp/supplycost table, so cost is the deterministic proxy
    0.6 * p_retailprice * l_quantity — the join/agg shape (fact x part x
    supplier x nation, two independent dims broadcast) is Q9's."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nat = _t(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_cent_sum(amount).alias("sum_profit"))
    )


def q102_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped large-volume orders: aggregate the fact to
    per-order quantity, HAVING-filter to the big tail, then join the
    surviving handful BACK to orders/customer. The join-back input is the
    post-aggregation frame (a few rows), so AQE turns both joins into
    broadcasts of the aggregate side — the fact table shuffles once."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 260.0)
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "l_orderkey",
            F.to_date("o_orderdate").cast("string").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
    )


def q103_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped blame assignment: suppliers who were the ONLY late
    supplier (ship > order date + 90 days) on a multi-supplier order.
    Q21's EXISTS/NOT-EXISTS pair collapses into one (order, supplier)
    aggregate plus order-level window counts — the fact shuffles once on
    l_orderkey and the window reuses that same partitioning."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    # Repartition on l_orderkey ALONE before the pair-key groupBy:
    # HashPartitioning(l_orderkey) satisfies the (l_orderkey, l_suppkey)
    # clustering requirement (subset rule), and the order-level window
    # then reuses the exact same partitioning — one shuffle feeds both.
    # Letting groupBy hash the pair would force a second full reshuffle
    # for the window (pair-partitioning does not satisfy l_orderkey).
    per_os = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).cast("int")
            ).alias("late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    blamed = (
        per_os.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .filter((F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    return (
        blamed.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .select("s_name", "l_suppkey", "numwait")
    )


def q104_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped dormant high-balance accounts: customers above the
    global positive-balance average with no order since 1999, rolled up by
    nation. The scalar average is a 1-row broadcast cross join; the
    no-recent-orders test is a LEFT ANTI join (no row explosion)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def q105_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2-shaped per-part argmin: for each small part, the supplier
    offering the lowest observed unit price. No partsupp table exists, so
    unit price is derived from lineitem (cent-rounded so the tie-break is
    exact); rank-1 selection with a (price, suppkey) order is the
    WindowGroupLimit pattern — each partition pre-truncates to rank 1."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & (F.col("p_size") < 15)
    )
    offers = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100, 0).cast("long")
            ).alias("unit_cents")
        )
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cents", "l_suppkey")
    return (
        offers.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("best_suppkey"),
            F.round(F.col("unit_cents") / 100.0, 2).alias("best_unit_price"),
        )
    )


def q106_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-shaped share-of-total filter: parts whose revenue exceeds
    0.05% of global revenue. The global total is an empty-frame window over
    the ALREADY-AGGREGATED per-part rows (one scan of the fact, like q89),
    not a scalar-subquery second scan."""
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100, 0).cast("long")
        ).alias("cents")
    )
    w = Window.partitionBy()
    return (
        per_part.withColumn("total", F.sum("cents").over(w))
        .filter(F.col("cents") > F.col("total") * 0.0005)
        .select(
            "l_partkey",
            F.round(F.col("cents") / 100.0, 2).alias("part_revenue"),
            F.round(F.col("cents") / F.col("total"), 6).alias("revenue_share"),
        )
    )


def q107_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition: fraction of word trigrams
    that are duplicates of an earlier trigram in the SAME document, rolled
    up per (lang, source). Trigram assembly is the zip_with-over-slices
    form (O(tokens), scan-local, no shuffle before the final rollup) —
    a high-repetition doc is LM-training noise, this is the filter
    signal."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    m = F.size(toks)
    length = F.greatest(m - 2, F.lit(0))
    tri = F.zip_with(
        F.zip_with(
            F.slice(toks, 1, length),
            F.slice(toks, 2, length),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        F.slice(toks, 3, length),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    # Materialize the trigram array once so array_distinct and size share
    # it (HOF lambdas are interpreted — see shingles_from_tokens).
    per_doc = docs.withColumn("tri", tri).select(
        "lang",
        "source",
        F.size("tri").alias("n_tri"),
        F.size(F.array_distinct("tri")).alias("n_uniq"),
    )
    rep = (F.col("n_tri") - F.col("n_uniq")) / F.col("n_tri")
    return (
        per_doc.filter(F.col("n_tri") > 0)
        .select("lang", "source", rep.alias("rep"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("rep"), 4).alias("avg_repetition"),
            F.round(F.max("rep"), 4).alias("max_repetition"),
        )
    )


def q108_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any exact
    word 4-gram with the held-out eval slice (doc_id % 97 == 0 — the
    deterministic stand-in for a benchmark suite). The eval n-gram set is
    tiny (~1% of docs), so it BROADCASTS — the training side never
    shuffles; contamination is counted gram-wise per training doc. The
    standard pre-training hygiene pass (e.g. GPT-3 appendix C) expressed
    as a broadcast semi-structure join."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    m = F.size(toks)
    length = F.greatest(m - 3, F.lit(0))
    grams = F.slice(toks, 1, length)
    for j in range(1, 4):
        grams = F.zip_with(
            grams,
            F.slice(toks, 1 + j, length),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    with_grams = docs.withColumn("g5", grams)
    eval_grams = (
        with_grams.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(F.array_distinct("g5")).alias("gram"))
        .distinct()
    )
    train = with_grams.filter(F.col("doc_id") % 97 != 0).select(
        "doc_id", F.explode(F.array_distinct("g5")).alias("gram")
    )
    return (
        train.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )


def q109_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day, counted
    on each of the next 7 days they return. First-active day is a min
    aggregate reused via join (both sides partition on user_id — AQE
    coalesces to one effective shuffle); the output is the
    (cohort, day_offset) -> distinct-user count analytics staple."""
    ev = _events(spark, sf_dir)
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    first = days.groupBy("user_id").agg(F.min("d").alias("d0"))
    return (
        days.join(first, "user_id")
        .withColumn("day_offset", F.datediff("d", "d0"))
        .filter(F.col("day_offset").between(0, 7))
        .groupBy(F.col("d0").cast("string").alias("cohort"), "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def q110_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture resampling: each source gets a repeat weight (0.5 /
    1.4 / 2.3 / 3.2 by source index mod 4 — the up/down-weighting a data
    mixture spec assigns); every document is emitted floor(w) times plus
    one more iff its md5-derived uniform < frac(w). Fully deterministic
    (md5 integer compare, no RNG) so epoch assembly is reproducible and
    shard-stable; the explode is map-side — no shuffle at all."""
    docs = _t(spark, sf_dir, "documents")
    idx = F.substring("source", 4, 8).cast("int")
    w_tenths = (idx % 4) * 9 + 5
    d = [
        f"(instr('0123456789abcdef', substr(md5(cast(doc_id as string)), {i}, 1)) - 1)"
        for i in (1, 2, 3, 4)
    ]
    h = F.expr(f"((({d[0]} * 16 + {d[1]}) * 16 + {d[2]}) * 16 + {d[3]})")
    k = (w_tenths / 10).cast("int") + (h * 10 < (w_tenths % 10) * 65536).cast("int")
    # sequence(1, 0) is DESCENDING in Spark, so guard k = 0 (dropped docs)
    # with an empty array; plain explode then skips them.
    epochs = F.when(
        k >= 1, F.sequence(F.lit(1), k)
    ).otherwise(F.array().cast("array<int>"))
    return docs.select("doc_id", "source", F.explode(epochs).alias("epoch"))


def q111_group_integrity_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe split: events are assigned to train/val/test by a hash
    of USER_ID (the entity), never the event — every user's whole history
    lands in exactly one split, so session-level signals can't leak across
    the boundary. The assignment is a scan-side md5 expression (no
    shuffle, retry-stable); output counts both events and distinct users
    per split so the no-leakage property is visible in the result."""
    ev = _events(spark, sf_dir)
    d = [
        f"(instr('0123456789abcdef', substr(md5(cast(user_id as string)), {i}, 1)) - 1)"
        for i in (1, 2)
    ]
    bucket = F.expr(f"({d[0]} * 16 + {d[1]}) % 10")
    split = (
        F.when(bucket < 8, F.lit("train"))
        .when(bucket < 9, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        ev.select(split.alias("split"), "user_id", "event_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q112_token_budget_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget trimming: each source contributes documents
    in quality order (longest first, doc_id tie-break) until a 10k-token
    budget is crossed — the corpus-assembly step that caps any one
    source's share. INCLUSIVE of the crossing document (standard 'fill
    then stop'), expressed as an exclusive running sum < budget; one
    window pass per source partition, no second scan."""
    docs = _t(spark, sf_dir, "documents")
    toks = textstats.token_count(F.col("text"))
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_chars"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = docs.select("source", "doc_id", "n_chars", toks.alias("toks")).withColumn(
        "prior", F.coalesce(F.sum("toks").over(w), F.lit(0))
    )
    kept = d.filter(F.col("prior") < 10_000)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").alias("tokens"),
        F.max("prior").alias("last_offset"),
    )


def q113_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped forecast-revenue delta: three range predicates and a
    single scalar aggregate — the purest pushdown test.  All three filters
    reach the parquet scan (PushedFilters on l_shipdate/l_discount/
    l_quantity); the agg is a map-side partial + 1-row final, so the only
    exchange moves one partial per task.  Cent-long sum keeps the scalar
    IEEE-identical across engines."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.round(F.col("l_extendedprice") * F.col("l_discount") * 100, 0).cast(
                        "long"
                    )
                )
                / 100.0,
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q114_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped returned-item report: quarter of orders joined to
    returned lineitems (l_returnflag = 'R'), revenue lost per customer with
    the nation dimension folded in by broadcast.  HAVING threshold instead
    of top-20 keeps the result an order-free set.  Join order is
    li⨝orders first (both filtered facts, one l_orderkey shuffle) then a
    broadcast of customer⨝nation — no fact ever shuffles twice."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    cust_nat = F.broadcast(
        cust.join(nat, cust["c_nationkey"] == nat["n_nationkey"]).select(
            "c_custkey", "c_name", "c_acctbal", "n_name"
        )
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust_nat, orders["o_custkey"] == cust_nat["c_custkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100,
                        0,
                    ).cast("long")
                )
                / 100.0,
                2,
            ).alias("revenue"),
            F.round(F.max("c_acctbal"), 2).alias("c_acctbal"),
        )
        .filter(F.col("revenue") > 50000.0)
    )


def q115_priority_shipment_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12-shaped two-tier conditional count (testdata has no
    l_shipmode/l_receiptdate, so l_linestatus stands in for shipmode and
    the late predicate is shipdate > orderdate + 90 days): per class,
    how many late shipments carried high- vs low-priority orders.  The
    CASE-sum pair collapses to one pass over the joined rows — Q12's
    signature map-side conditional aggregation."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(late)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q116_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped customer-order-count distribution: LEFT OUTER join
    so customers with zero qualifying orders survive as c_count = 0, then a
    second aggregation over the counts.  Two shuffles total (o_custkey,
    then c_count); the first agg runs on the join's own partitioning —
    AQE reuses the exchange rather than adding a third."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q117_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped promo-revenue share: one month of lineitems,
    broadcast part, conditional/total cent-sum ratio in a single pass.
    Both numerator and denominator are exact cent longs, so the final
    ratio is one IEEE division — deterministic across engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    cents = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100, 0
    ).cast("long")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0))).alias(
                "promo_cents"
            ),
            F.sum(cents).alias("total_cents"),
        )
        .select(
            F.round(
                F.lit(100.0) * F.col("promo_cents") / F.col("total_cents"), 4
            ).alias("promo_revenue_pct"),
            F.round(F.col("total_cents") / 100.0, 2).alias("total_revenue"),
        )
    )


def q118_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped small-quantity-order revenue: lineitems below 20 %
    of their part's average quantity.  The correlated scalar subquery
    becomes a per-part aggregate joined back to the fact; the comparison
    qty < 0.2 * avg is done in exact integer arithmetic
    (qty_cents * 5 * n < sum_qty_cents * 100 avoids the cross-engine
    float hazard of 0.2 * avg on borderline rows).  Brand filter
    broadcasts into both the agg input and the probe, so the per-part
    aggregate is built over ~1/25 of the fact."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    li = _t(spark, sf_dir, "lineitem")
    qty_cents = F.round(F.col("l_quantity") * 100, 0).cast("long")
    branded = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"]).select(
        "l_partkey", "l_extendedprice", qty_cents.alias("qty_cents")
    )
    per_part = branded.groupBy("l_partkey").agg(
        F.sum("qty_cents").alias("sum_qty_cents"), F.count(F.lit(1)).alias("n_lines")
    ).withColumnRenamed("l_partkey", "agg_partkey")
    return (
        branded.join(
            per_part, branded["l_partkey"] == per_part["agg_partkey"]
        )
        .filter(
            F.col("qty_cents") * 5 * F.col("n_lines")
            < F.col("sum_qty_cents") * 100
        )
        .agg(
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")) / 700.0,
                2,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


def q119_disjunctive_predicate_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped disjunctive join: OR of three (brand, size-range,
    quantity-range) conjunction blocks over li⨝part.  Catalyst extracts
    the common l_partkey = p_partkey equi-condition out of the
    disjunction, so this stays a broadcast HASH join with the OR as a
    residual filter — not a nested-loop over the cross product."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    block = lambda brand, smin, smax, qmin, qmax: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size").between(smin, smax))
        & (F.col("l_quantity") >= qmin)
        & (F.col("l_quantity") <= qmax)
    )
    return (
        joined.filter(
            block("Brand#12", 1, 15, 1, 11)
            | block("Brand#23", 10, 30, 10, 20)
            | block("Brand#34", 20, 50, 20, 30)
        )
        .agg(
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100,
                        0,
                    ).cast("long")
                )
                / 100.0,
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q120_segment_dedup_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/CCNet-style cross-document segment dedup signal: split each doc
    into consecutive 10-word segments, mark segments that occur in more
    than one distinct document, report each document's duplicated-segment
    fraction.  Two shuffles (segment key, then doc_id); the per-segment
    distinct-doc count uses the segment exchange the join probe also
    needs.  The shuffle key is the portable 60-bit md5 of the segment —
    8-byte exchanges instead of 60-char strings, and because DuckDB
    computes the identical hash the oracle stays exact (collision odds at
    2^60 are ~n²/2^61 — negligible against corpus sizes, and any
    collision only nudges one dup_fraction)."""
    docs = _t(spark, sf_dir, "documents")
    # tokenize once per row, then segment off the bound column — an inlined
    # split() inside the transform() lambda would re-tokenize the full text
    # at every segment position (same fix as winnowing_fingerprints).
    toks = docs.select("doc_id", F.split("text", " ").alias("__toks"))
    segs = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(__toks) >= 10 THEN "
                "transform(sequence(0, size(__toks) div 10 - 1), "
                "i -> CAST(conv(substring(md5(concat_ws(' ', slice(__toks, i * 10 + 1, 10))), 1, 15), 16, 10) AS BIGINT)) "
                "ELSE array() END"
            )
        ).alias("seg"),
    )
    seg_docs = segs.groupBy("seg").agg(F.countDistinct("doc_id").alias("nd"))
    return (
        segs.join(seg_docs, "seg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.round(
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)) / F.count(F.lit(1)), 4
            ).alias("dup_fraction"),
        )
    )


def q121_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style winnowing document fingerprints: 5-token k-grams hashed
    to a portable 24-bit integer (md5 hex digits via instr — bit-identical
    across engines, same trick as q98), then the minimum hash of every
    4-gram window is selected; the distinct window-minima are the
    document's fingerprint set.  Guarantees any shared run of >= 8 tokens
    produces at least one common fingerprint — the substring-level dedup
    signal that segment (q120) and whole-doc (q16) hashing miss.  One
    exchange total: gram rows shuffle on doc_id for the window (already
    reduced to the 8-byte hash — conv over the md5 hex prefix matches the
    oracle's digit-by-digit instr chain), and the window-min, validity
    filter, and distinct aggregation all reuse that partitioning.
    Operator: functions/dedup.winnowing_fingerprints (+ winnowing_pairs
    for the posting-list candidate join)."""
    docs = _t(spark, sf_dir, "documents")
    fp = dedup.winnowing_fingerprints(docs, "text", "doc_id", k=5, w=4)
    return fp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.sum("fingerprint").alias("fingerprint_sum"),
    )


def q122_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup over the embedding corpus: nearest of
    max(8, √N) deterministic seed centroids prunes the pair space to
    cluster-local quadratics, then any vector with a lower-id neighbor at
    cosine >= 0.25 inside its cluster is marked dropped.  The centroid
    count scales with the corpus (the oracle recomputes the same √N), so
    expected pair work stays ~N^1.5 as the table grows.  The
    embedding-space twin of q94's text-space canonicalization (see
    similarity.semantic_dedup for the n² -> Σnᵢ² scale argument)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(
        emb, id_col="vec_id", vec_col="embedding", threshold=0.25
    )


def q123_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality signal with no external model: an add-one-
    smoothed bigram LM is estimated FROM the corpus (bigram counts,
    context counts, vocab size), then every document is scored by its
    average negative log-likelihood under that LM — high avg_nll marks
    statistically unusual text, the classic perplexity filter.  Bigram
    assembly is the O(tokens) zip_with form (q76); the LM tables shuffle
    once each on their own keys and join back to the per-position bigram
    stream; the 1-row vocab size rides a broadcast cross join.  avg(-ln p)
    decomposes as avg(ln(c1+V)) - avg(ln(c2+1)) over exactly-representable
    integer inputs, so the rounded score is engine-stable."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bg = docs.select("doc_id", F.explode(bigrams).alias("g"))
    cnt2 = bg.groupBy("g").agg(F.count(F.lit(1)).alias("c2"))
    cnt1 = (
        bg.select(F.substring_index("g", " ", 1).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = docs.select(F.explode(toks).alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    scored = (
        bg.join(cnt2, "g")
        .withColumn("w1", F.substring_index("g", " ", 1))
        .join(cnt1, "w1")
        .crossJoin(F.broadcast(vocab))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.avg(F.log(F.col("c1") + F.col("v")) - F.log(F.col("c2") + 1)), 4
        ).alias("avg_nll"),
    )


def q124_supplier_part_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-shaped supplier-diversity count (testdata has no
    partsupp, so the supplier-part relation derives from observed
    lineitem shipments): per (brand, type, size) class — minus an
    excluded brand/type — how many DISTINCT suppliers shipped it.  The
    distinct rides the (brand, type, size, suppkey) pre-aggregation, so
    the wide fact collapses map-side before the distinct-count shuffle;
    part broadcasts into the fact scan."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45") & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q125_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-shaped nested-semi-join: suppliers in a given nation who
    shipped MORE than 30 % of some part's total 1997 volume (the
    partsupp availqty predicate re-expressed over observed shipments).
    Inner query: per (part, supplier) quantity vs per-part total via an
    empty-frame window on the aggregated frame — one lineitem scan, one
    shuffle, integer-exact 10*sq > 3*total compare in quantity-cents;
    outer: LEFT SEMI from the nation-filtered supplier dim."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    qty_cents = F.round(F.col("l_quantity") * 100, 0).cast("long")
    per_ps = (
        li.select("l_partkey", "l_suppkey", qty_cents.alias("qc"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("qc").alias("sq"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        per_ps.withColumn("total", F.sum("sq").over(w))
        .filter(F.col("sq") * 10 > F.col("total") * 3)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(nat), supp["s_nationkey"] == nat["n_nationkey"])
        .join(dominant, supp["s_suppkey"] == dominant["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name")
    )


def q126_ann_bruteforce_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized brute-force cosine top-k — the production scale
    path for q20's expression form (one numpy matmul per Arrow batch vs
    ~190 interpreted HOF ops per row; measured 5.3x at sf0.1 with 100
    queries).  The float ``score`` column is projected out for grading:
    BLAS summation order is not bit-stable enough for the value-hash, but
    the resulting (query_id, vec_id, rank) ranking is (a rank flip needs
    two true cosines within ~1e-15 of the same rounding boundary); full
    score equivalence to the expression form is pinned in
    tests/test_ext_ops.py."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    return similarity.cosine_topk_bruteforce_pandas(corpus, queries, k=5).select(
        "query_id", "vec_id", "rank"
    )


# ===========================================================================
# Contract functions
# ===========================================================================

def q160_html_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-style HTML -> text extraction (functions/web.py), graded as
    an exact ROUND TRIP: each document is deterministically rendered into
    an HTML page (title + <style>/<script> boilerplate + <h1> + <p>
    paragraphs, entities escaped), then the scan-side extractor strips
    boilerplate/tags/entities back out.  The whole chain — synthesis AND
    extraction — is JVM regex/replace inside whole-stage codegen, and the
    DuckDB oracle replays it verbatim, so a drifted regex or a broken
    entity table flips ``matches_expected`` and fails the value hash."""
    from pr2_transformation_spark.functions import web

    docs = _t(spark, sf_dir, "documents")
    title = F.concat(F.lit("Doc "), F.col("doc_id").cast("string"))
    page = docs.select(
        "doc_id",
        web.render_html(title, F.col("source"), F.col("text")).alias("html"),
        F.trim(
            F.regexp_replace(
                F.concat(
                    title,
                    F.lit(" "),
                    F.col("source"),
                    F.lit(" "),
                    F.replace(F.col("text"), F.lit("\n"), F.lit(" ")),
                ),
                "\\s+",
                " ",
            )
        ).alias("expected"),
    )
    extracted = page.select(
        "doc_id",
        web.html_title(F.col("html")).alias("title"),
        web.html_to_text(F.col("html")).alias("extracted"),
        "expected",
    )
    return extracted.select(
        "doc_id",
        "title",
        F.length("extracted").alias("n_chars_extracted"),
        (F.col("extracted") == F.col("expected")).alias("matches_expected"),
    )


def q161_warc_roundtrip_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC encode -> parse ROUND TRIP (sources/warc.py): documents are
    packed 32 crawl files wide (one ``applyInPandas`` blob build per
    group), the blobs re-parsed record-by-record with the byte-exact
    ``Content-Length`` walker, and each crawl file graded by record
    count, payload byte total, and an order-canonical digest (md5 of the
    per-record md5s sorted by record id).  The DuckDB oracle computes
    the same three values straight from the parquet — any corruption in
    either direction (wrong lengths, shifted offsets, lost records,
    mojibake) changes a digest and fails the hash."""
    from pr2_transformation_spark.sources import warc

    docs = _t(spark, sf_dir, "documents")
    tagged = docs.select(
        F.pmod(F.col("doc_id"), F.lit(32)).cast("string").alias("crawl_file"),
        F.concat(
            F.lit("https://crawl.example/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("uri"),
        "doc_id",
        "text",
    )
    blobs = warc.encode_warc_frame(tagged, "crawl_file", "uri", "doc_id", "text")
    recs = warc.parse_warc_records(blobs)
    per = recs.select(
        "warc_id",
        F.struct(F.col("record_id"), F.md5("content").alias("h")).alias("rh"),
        F.length("content").alias("nb"),
    )
    return per.groupBy("warc_id").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum("nb").alias("payload_bytes"),
        F.md5(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list("rh")), lambda s: s["h"]
                ),
            )
        ).alias("content_digest"),
    )


def q162_url_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL feature parsing for crawl curation (functions/web.py): hosts
    (userinfo/port stripped), eTLD+1 approximation, path, query, path
    depth — all shared-regex chains replayed verbatim by the DuckDB
    oracle.  URLs are synthesized deterministically with rotating
    scheme/userinfo/port shapes so every stripping branch is exercised
    on every run."""
    from pr2_transformation_spark.functions import web

    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("http://")).otherwise(
            F.lit("https://")
        ),
        F.when(F.col("doc_id") % 5 == 0, F.lit("crawler:s3cr3t@")).otherwise(
            F.lit("")
        ),
        F.col("source"),
        F.lit("-"),
        F.col("lang"),
        F.lit(".Example.NET"),
        F.when(F.col("doc_id") % 4 == 0, F.lit(":8443")).otherwise(F.lit("")),
        F.lit("/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("?ref=r"), (F.col("doc_id") % 7).cast("string")),
        ).otherwise(F.lit("")),
        F.lit("#frag"),
    )
    with_url = docs.select("doc_id", url.alias("url"))
    host = web.url_host(F.col("url"))
    return with_url.select(
        "doc_id",
        "url",
        host.alias("host"),
        web.registered_domain(host).alias("domain"),
        web.url_path(F.col("url")).alias("path"),
        web.url_query(F.col("url")).alias("query"),
        web.url_depth(F.col("url")).alias("depth"),
    )


def q163_host_policy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl policy: drop blocklisted hosts, then keep at most
    K=3 documents per host ranked by length (ties broken by doc_id) —
    the standard per-domain frequency cap that stops a single boilerplate
    farm from dominating a training mix.  One window over the host
    partition; the blocklist is a literal IN-filter the parquet scan
    prunes with."""
    from pr2_transformation_spark.functions import web

    docs = _t(spark, sf_dir, "documents")
    host = web.url_host(
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit("-"),
            F.col("lang"),
            F.lit(".example.net/d/"),
            F.col("doc_id").cast("string"),
        )
    )
    blocked = ["src0-de.example.net", "src1-en.example.net"]
    ranked = (
        docs.select("doc_id", host.alias("host"), "n_chars")
        .filter(~F.col("host").isin(blocked))
        .withColumn(
            "host_rank",
            F.row_number().over(
                Window.partitionBy("host").orderBy(
                    F.col("n_chars").desc(), F.col("doc_id")
                )
            ),
        )
        .filter(F.col("host_rank") <= 3)
    )
    return ranked.select("doc_id", "host", "n_chars", "host_rank")


def q164_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase): each later
    stage must happen STRICTLY AFTER the user's earliest prior-stage
    event.  Three conditional-min aggregations, each keyed on user_id —
    the stage joins all reuse the same hash partitioning, so the funnel
    costs one logical shuffle key regardless of stage count.  Emits the
    classic funnel report: users per stage + average inter-stage delay."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("t")
    )
    views = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("t").alias("t_view")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("t") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_click"), F.first("t_view").alias("t_view"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("t") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_purchase"), F.first("t_click").alias("t_click"))
    )
    return (
        views.agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("1_view").alias("stage"), "n", F.lit(None).cast("double").alias("avg_delay_sec"))
        .unionByName(
            clicks.agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.avg(F.col("t_click") - F.col("t_view")), 2).alias(
                    "avg_delay_sec"
                ),
            ).select(F.lit("2_click").alias("stage"), "n", "avg_delay_sec")
        )
        .unionByName(
            purchases.agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.avg(F.col("t_purchase") - F.col("t_click")), 2).alias(
                    "avg_delay_sec"
                ),
            ).select(F.lit("3_purchase").alias("stage"), "n", "avg_delay_sec")
        )
    )


def q165_ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test over a deterministic 50/50
    user-id split (the A/B readout every data pipeline ends in).  Wholly
    algebraic — per-arm (n, mean, sample variance) from one aggregation
    pass, then the t statistic and Welch-Satterthwaite degrees of
    freedom as scalar arithmetic — so the 100 TB cost is one map-side-
    combined shuffle of 2 rows."""
    ev = _t(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("spend"))
        .select((F.col("user_id") % 2).alias("arm"), "spend")
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("spend").alias("mean"),
        F.var_samp("spend").alias("var"),
    )
    a = arms.filter(F.col("arm") == 0).select(
        F.col("n").alias("n_a"), F.col("mean").alias("m_a"), F.col("var").alias("v_a")
    )
    b = arms.filter(F.col("arm") == 1).select(
        F.col("n").alias("n_b"), F.col("mean").alias("m_b"), F.col("var").alias("v_b")
    )
    se2 = F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b")
    t = (F.col("m_a") - F.col("m_b")) / F.sqrt(se2)
    df_w = (se2 * se2) / (
        (F.col("v_a") / F.col("n_a")) * (F.col("v_a") / F.col("n_a"))
        / (F.col("n_a") - 1)
        + (F.col("v_b") / F.col("n_b")) * (F.col("v_b") / F.col("n_b"))
        / (F.col("n_b") - 1)
    )
    return a.crossJoin(b).select(
        "n_a",
        "n_b",
        F.round("m_a", 4).alias("mean_a"),
        F.round("m_b", 4).alias("mean_b"),
        F.round(t, 4).alias("t_stat"),
        F.round(df_w, 2).alias("welch_df"),
        (F.abs(t) > 1.96).alias("significant_95"),
    )


def q166_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT processing (Spark 4's open variant type):
    each event's JSON ``props`` is embedded into a bigger synthesized
    document, parsed ONCE into a variant, then shredded with typed
    ``variant_get`` paths (object fields + array indexing) and
    aggregated.  The DuckDB oracle recomputes every extracted value
    straight from the raw columns — independent of any JSON machinery —
    so a path or cast drift fails the hash."""
    ev = _t(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"meta": {"type": "'),
        F.col("event_type"),
        F.lit('", "arr": ['),
        (F.col("user_id") % 10).cast("string"),
        F.lit(", "),
        (F.col("event_id") % 100).cast("string"),
        F.lit(']}, "props": '),
        F.col("props"),
        F.lit("}"),
    )
    shredded = ev.select(
        F.parse_json(doc).alias("v"),
    ).select(
        F.variant_get("v", "$.meta.type", "string").alias("typ"),
        F.variant_get("v", "$.meta.arr[1]", "bigint").alias("second_arr"),
        F.variant_get("v", "$.props.k", "bigint").alias("k"),
    )
    return shredded.groupBy("typ").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("second_arr").alias("sum_arr1"),
        F.sum("k").alias("sum_k"),
    )


def q167_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML interchange (Spark 4 native ``to_xml``/``from_xml``): every
    order is serialized to an XML fragment and parsed back with a typed
    schema; the emitted columns come from the PARSED side only, while the
    DuckDB oracle selects the raw parquet columns — any serializer/parser
    asymmetry (type coercion, date formatting, escaping) diverges the
    values and fails the hash.  Both directions run JVM-side per row, no
    Python in the loop."""
    orders = _t(spark, sf_dir, "orders")
    xml = F.to_xml(
        F.struct(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_orderpriority",
        )
    )
    parsed = orders.select(
        F.from_xml(
            xml,
            "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE, "
            "o_orderdate STRING, o_orderpriority STRING",
        ).alias("p")
    )
    return parsed.select(
        F.col("p.o_orderkey").alias("orderkey"),
        F.col("p.o_orderstatus").alias("status"),
        F.round(F.col("p.o_totalprice"), 2).alias("totalprice"),
        F.col("p.o_orderdate").alias("orderdate"),
        F.col("p.o_orderpriority").alias("priority"),
    )


def q168_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: brand co-occurrence within
    orders with support and lift.  The pair fan-out is per-order
    (bounded by distinct brands per basket, ~items/order), the part
    dimension broadcasts, and the corpus-size scalar rides a 1-row
    broadcast cross — the shuffled volume is O(baskets x pairs-per-
    basket), never O(brands^2 x orders)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    tot = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    a = ob.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_a"))
    b = ob.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("pair_orders"))
    )
    marg = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("brand_orders"))
    ma = marg.select(
        F.col("p_brand").alias("brand_a"), F.col("brand_orders").alias("orders_a")
    )
    mb = marg.select(
        F.col("p_brand").alias("brand_b"), F.col("brand_orders").alias("orders_b")
    )
    return (
        pairs.join(F.broadcast(ma), "brand_a")
        .join(F.broadcast(mb), "brand_b")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("pair_orders") >= 50)
        .select(
            "brand_a",
            "brand_b",
            "pair_orders",
            F.round(F.col("pair_orders") / F.col("n_orders"), 6).alias("support"),
            F.round(
                F.col("pair_orders")
                * F.col("n_orders")
                / (F.col("orders_a") * F.col("orders_b")),
                4,
            ).alias("lift"),
        )
    )


def q169_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily-revenue series at lags 1-7
    (the seasonality pre-check before any forecasting model).  The
    series is first reduced to one row per day — the unordered 100 TB
    fact table collapses map-side before the single tiny ordered window
    runs — then the seven lag products and the variance come from ONE
    aggregation pass over the daily frame."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy("o_orderdate").agg(F.sum("o_totalprice").alias("x"))
    w = Window.orderBy("o_orderdate")
    lagged = daily.select(
        "x", *[F.lag("x", k).over(w).alias(f"l{k}") for k in range(1, 8)]
    )
    mu_frame = daily.agg(
        F.avg("x").alias("mu"), F.count(F.lit(1)).alias("n_days")
    )
    cent = lagged.crossJoin(F.broadcast(mu_frame))
    dev = F.col("x") - F.col("mu")
    return cent.agg(
        F.first("n_days").alias("n_days"),
        *[
            F.round(
                F.sum(dev * (F.col(f"l{k}") - F.col("mu")))
                / F.sum(dev * dev),
                4,
            ).alias(f"acf_{k}")
            for k in range(1, 8)
        ],
    )


def q170_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    anomaly screen for fabricated monetary data.  The first significant
    digit comes from integer-cents string arithmetic (``floor(x*100 +
    0.5)``), NOT ``log10``, so there is no float-boundary divergence
    between engines at exact powers of ten; one groupBy(digit) shuffle
    of 9 rows plus the 1-row total cross."""
    orders = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    digits = orders.select(
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = digits.agg(F.count(F.lit(1)).alias("total"))
    obs = F.col("n") / F.col("total")
    exp = F.log10(1 + 1 / F.col("digit"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(obs, 6).alias("observed_freq"),
            F.round(exp, 6).alias("benford_freq"),
            F.round(
                F.col("total") * (obs - exp) * (obs - exp) / exp, 4
            ).alias("chi2_term"),
        )
    )


def q171_jaro_winkler_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage by Jaro-Winkler similarity (functions/linkage.py):
    candidate pairs from DISTINCT part names blocked on the name's noun,
    scored by an Arrow-batched pandas UDF whose arithmetic was matched
    0/15000 against DuckDB's ``jaro_winkler_similarity`` — which is what
    lets a Python-side string metric be oracle-graded at all.  The
    quadratic term is (distinct names per block)^2, never rows^2."""
    from pr2_transformation_spark.functions import linkage

    part = _t(spark, sf_dir, "part")
    return linkage.blocked_name_pairs(
        part, "p_name", F.split(F.col("p_name"), " ").getItem(1), 0.7
    )


def q172_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to the
    user's most recent preceding click/view campaign via one
    ``last(ignorenulls)`` running window per user — a single shuffle on
    user_id, no self-join, with (t, event_id) ordering so timestamp ties
    resolve identically on any engine."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_timestamp("ts").alias("t"),
        F.concat(
            F.lit("camp_"),
            (
                F.get_json_object("props", "$.k").cast("bigint") % 4
            ).cast("string"),
        ).alias("camp"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(
        F.col("event_type").isin("click", "view"), F.col("camp")
    )
    attributed = ev.withColumn("attributed", F.last(touch, ignorenulls=True).over(w))
    return (
        attributed.filter(
            (F.col("event_type") == "purchase")
            & F.col("attributed").isNotNull()
        )
        .groupBy(F.col("attributed").alias("campaign"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("revenue"),
        )
    )


def q173_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization at exact p5/p95 (outlier clamping before
    model features).  Exact interpolated percentiles per priority class
    (one partial-aggregated shuffle of 5 groups), broadcast back, clamp
    with least/greatest at scan speed — the 100 TB fact rows never
    shuffle."""
    orders = _t(spark, sf_dir, "orders")
    bounds = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.05)).alias("p5"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
    )
    clamped = orders.join(F.broadcast(bounds), "o_orderpriority").select(
        "o_orderpriority",
        "o_totalprice",
        F.least(F.greatest(F.col("o_totalprice"), F.col("p5")), F.col("p95")).alias(
            "w"
        ),
        "p5",
        "p95",
    )
    return clamped.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("o_totalprice"), 2).alias("raw_avg"),
        F.round(F.avg("w"), 2).alias("winsorized_avg"),
        F.round(F.first("p5"), 2).alias("p5"),
        F.round(F.first("p95"), 2).alias("p95"),
    )


def q174_haversine_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial nearest-neighbor: every customer is assigned its closest
    nation 'capital' by great-circle (haversine) distance.  Coordinates
    are synthesized from keys with pure integer arithmetic (engine-
    identical), the 25-row capital dim broadcasts against the fact scan,
    and the per-customer argmin ranks on the ROUNDED distance so float
    noise can't flip an ordering between engines."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")

    def lat(key, mult):
        return ((key * mult) % 17000) / 100.0 - 85.0

    def lon(key, mult):
        return ((key * mult) % 36000) / 100.0 - 180.0

    c = cust.select(
        "c_custkey",
        lat(F.col("c_custkey"), 37).alias("c_lat"),
        lon(F.col("c_custkey"), 73).alias("c_lon"),
    )
    n = nation.select(
        "n_nationkey",
        "n_name",
        lat(F.col("n_nationkey") + 1, 997).alias("n_lat"),
        lon(F.col("n_nationkey") + 1, 1471).alias("n_lon"),
    )
    dphi = F.radians(F.col("n_lat") - F.col("c_lat")) / 2
    dlmb = F.radians(F.col("n_lon") - F.col("c_lon")) / 2
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians("c_lat"))
        * F.cos(F.radians("n_lat"))
        * F.sin(dlmb)
        * F.sin(dlmb)
    )
    dist_km = F.round(2 * 6371.0 * F.asin(F.sqrt(a)), 3)
    scored = c.crossJoin(F.broadcast(n)).select(
        "c_custkey", "n_name", dist_km.alias("dist_km")
    )
    w = Window.partitionBy("c_custkey").orderBy("dist_km", "n_name")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("c_custkey", F.col("n_name").alias("nearest_nation"), "dist_km")
    )


def q175_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop BFS: minimum hop distance (<= 3) from a seed set over
    the synthetic customer graph (q63's edge pattern).  Fixed unrolled
    frontier expansion — each hop is one join of the CURRENT frontier
    (small) against the edge list plus an anti-join against the visited
    set, so per-hop shuffle volume is O(frontier), and the oracle can
    replay the exact same three steps in SQL."""
    cust = _t(spark, sf_dir, "customer")
    e = cust.filter(F.col("c_custkey") % 7 != 0).select(
        F.col("c_custkey").alias("a"), (F.col("c_custkey") + 3).alias("b")
    )
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    frontier = cust.filter(F.col("c_custkey") % 997 == 1).select(
        F.col("c_custkey").alias("id")
    ).distinct()
    visited = frontier.select("id", F.lit(0).alias("dist"))
    for hop in (1, 2, 3):
        nxt = (
            sym.join(frontier, sym.a == frontier.id)
            .select(F.col("b").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
        )
        visited = visited.union(nxt.select("id", F.lit(hop).alias("dist")))
        frontier = nxt
    return visited


def q176_scd2_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: each purchase is joined to the
    SCD2 state interval (built from the user's NON-purchase events, the
    q152 pattern) valid at purchase time — the classic fact-to-history
    join.  The interval predicate rides a user_id equi-join (sort-merge
    on the key, range filter after), so the 100 TB cost is one co-
    partitioned join, never an all-pairs range scan."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "value",
        F.col("ts").cast("long").alias("t"),
    )
    dim_events = ev.filter(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    dim = dim_events.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("t").alias("valid_from"),
        F.lead("t").over(w).alias("valid_to"),
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "value", F.col("t").alias("pt")
    )
    joined = facts.join(dim, "user_id").filter(
        (F.col("pt") >= F.col("valid_from"))
        & ((F.col("pt") < F.col("valid_to")) | F.col("valid_to").isNull())
    )
    return joined.groupBy("state").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("value"), 2).alias("revenue"),
    )


def q177_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day.  COUNT(DISTINCT)
    over a sliding range is not windowable directly, so each (user, day)
    activity row contributes itself to the 7 window-ends it falls in
    (one explode of a 7-element sequence — linear fan-out), then one
    distinct-count per window end.  No per-day self-joins, no
    re-scanning trailing data."""
    ev = _events(spark, sf_dir)
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    expl = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("wend"),
    )
    days = ud.select(F.col("day").alias("wend")).distinct()
    return (
        expl.join(F.broadcast(days), "wend")
        .groupBy("wend")
        .agg(F.count_distinct("user_id").alias("active_7d"))
        .select(F.col("wend").cast("string").alias("window_end"), "active_7d")
    )


def q178_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: EXACTLY ceil(10%) of each
    market segment, rows elected by hash rank (stable across runs,
    engines, and partitionings — no RNG).  One window per stratum; at
    100 TB the per-stratum rank is the same shuffle any top-k needs
    (md5 here for oracle replay; xxhash64 is the production hasher).
    Emits per-stratum audit counts plus the sampled-row balance check."""
    from pr2_transformation_spark.functions.dedup import md5_long

    cust = _t(spark, sf_dir, "customer")
    h = md5_long(F.col("c_custkey").cast("string"))
    w = Window.partitionBy("c_mktsegment").orderBy(h, "c_custkey")
    sized = cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1))
        .over(Window.partitionBy("c_mktsegment"))
        .alias("stratum_n"),
    )
    take = F.ceil(F.col("stratum_n") * 0.1)
    picked = sized.filter(F.col("rk") <= take)
    return picked.groupBy("c_mktsegment").agg(
        F.first("stratum_n").alias("stratum_n"),
        F.count(F.lit(1)).alias("sampled_n"),
        F.round(F.avg("c_acctbal"), 2).alias("sample_avg_bal"),
        F.min("c_custkey").alias("min_sampled_key"),
    )


def q179_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per group: |x - median| > 3.5 * MAD
    (median absolute deviation) — the screen that survives the heavy
    tails that break z-scores.  Two exact-median passes (group medians,
    then deviation medians), both partial-aggregated on the same group
    key, bounds broadcast back over the scan."""
    orders = _t(spark, sf_dir, "orders")
    med = orders.groupBy("o_orderpriority").agg(
        F.median("o_totalprice").alias("med")
    )
    dev = (
        orders.join(F.broadcast(med), "o_orderpriority")
        .select(
            "o_orderpriority",
            "med",
            F.abs(F.col("o_totalprice") - F.col("med")).alias("adev"),
        )
        .groupBy("o_orderpriority")
        .agg(F.first("med").alias("med"), F.median("adev").alias("mad"))
    )
    flagged = orders.join(F.broadcast(dev), "o_orderpriority").select(
        "o_orderpriority",
        "med",
        "mad",
        (
            F.abs(F.col("o_totalprice") - F.col("med")) > 3.5 * F.col("mad")
        ).alias("is_outlier"),
    )
    return flagged.groupBy("o_orderpriority").agg(
        F.round(F.first("med"), 2).alias("median_price"),
        F.round(F.first("mad"), 2).alias("mad"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
    )


def q180_hll_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct counting (Spark 4 datasketches): ONE HLL
    sketch per day, rolling 7-day actives by MERGING the daily sketches
    (``hll_union_agg``) instead of re-scanning raw events — the 100 TB
    pattern where per-partition sketches are precomputed once and any
    date range is answered from kilobytes.  Graded against the exact
    explode-based count (q177's logic) with a 5% error contract: the
    estimate itself is engine-specific, the BOOLEAN is not."""
    ev = _events(spark, sf_dir)
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    daily = ud.groupBy("day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    expl = daily.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias(
            "wend"
        ),
        "sk",
    )
    days = ud.select(F.col("day").alias("wend")).distinct()
    approx = (
        expl.join(F.broadcast(days), "wend")
        .groupBy("wend")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx"))
    )
    exact = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
            ).alias("wend"),
        )
        .join(F.broadcast(days), "wend")
        .groupBy("wend")
        .agg(F.count_distinct("user_id").alias("exact_active_7d"))
    )
    return (
        approx.join(exact, "wend")
        .select(
            F.col("wend").cast("string").alias("window_end"),
            "exact_active_7d",
            (
                F.abs(F.col("approx") - F.col("exact_active_7d"))
                <= 0.05 * F.col("exact_active_7d")
            ).alias("hll_within_5pct"),
        )
    )


def q181_theta_segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-expression sketches: distinct-customer overlap between every
    market-segment pair via Theta sketch intersection.  Below the sketch
    capacity (2^12 retained hashes) Theta is EXACT, so at the graded
    scales the estimate equals the true overlap and the oracle replays
    it as a plain COUNT(DISTINCT) self-join — while the plan stays the
    mergeable-sketch plan that scales to 100 TB (segments sketched once,
    all pairwise overlaps answered sketch-side)."""
    cust = _t(spark, sf_dir, "customer")
    sk = cust.groupBy("c_mktsegment").agg(
        F.theta_sketch_agg("c_nationkey").alias("sk"),
        F.count_distinct("c_nationkey").alias("seg_nations"),
    )
    a = sk.select(
        F.col("c_mktsegment").alias("seg_a"),
        F.col("sk").alias("sk_a"),
        F.col("seg_nations").alias("nations_a"),
    )
    b = sk.select(
        F.col("c_mktsegment").alias("seg_b"), F.col("sk").alias("sk_b")
    )
    pairs = a.join(F.broadcast(b), F.col("seg_a") < F.col("seg_b"))
    return pairs.select(
        "seg_a",
        "seg_b",
        "nations_a",
        F.round(
            F.theta_sketch_estimate(
                F.theta_intersection(F.col("sk_a"), F.col("sk_b"))
            )
        )
        .cast("long")
        .alias("overlap_nations"),
    )


def q182_kll_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles: per-priority KLL sketches of order totals,
    merged into one global sketch whose p50/p90 are then read out — the
    re-aggregation pattern that answers any-slice quantiles without
    re-scanning.  Graded by a 2% relative-error contract against the
    exact interpolated percentiles (sketch outputs are retained data
    items, engine-specific; the booleans and exact values are not)."""
    orders = _t(spark, sf_dir, "orders")
    per_group = orders.groupBy("o_orderpriority").agg(
        F.kll_sketch_agg_double("o_totalprice").alias("sk")
    )
    merged = per_group.agg(
        F.kll_sketch_get_quantile_double(
            F.kll_merge_agg_double("sk"), F.lit(0.5)
        ).alias("kll_p50"),
        F.kll_sketch_get_quantile_double(
            F.kll_merge_agg_double("sk"), F.lit(0.9)
        ).alias("kll_p90"),
    )
    exact = orders.agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )
    return merged.crossJoin(F.broadcast(exact)).select(
        "n",
        F.round("p50", 2).alias("exact_p50"),
        F.round("p90", 2).alias("exact_p90"),
        (F.abs(F.col("kll_p50") - F.col("p50")) <= 0.02 * F.col("p50")).alias(
            "kll_p50_within_2pct"
        ),
        (F.abs(F.col("kll_p90") - F.col("p90")) <= 0.02 * F.col("p90")).alias(
            "kll_p90_within_2pct"
        ),
    )


def q183_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization for crawl dedup: lowercase host, strip the
    default :443 port, drop the fragment, remove tracking parameters
    (utm_*, ref) and SORT the survivors — then count raw URLs per
    canonical form.  All array/regex built-ins at scan speed; the
    synthetic URLs embed doc_id only in tracking params and a modular
    path/size pair so canonicalization genuinely collapses them
    (500 raw -> 150 canonical at sf0.01)."""
    docs = _t(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://WWW.Shop"),
            F.lit(".Example.COM:443/p/"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit("?utm_campaign=c"),
            F.col("doc_id").cast("string"),
            F.lit("&size="),
            (F.col("doc_id") % 3).cast("string"),
            F.lit("&utm_source=feed&ref=tracker#top"),
        ).alias("url"),
    )
    no_frag = F.regexp_replace(F.col("url"), "#.*$", "")
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    base = F.regexp_replace(no_frag, r"\?.*$", "")
    base = F.regexp_replace(
        base, "^(https?)://([^/]*)", ""
    )  # peel scheme://authority, keep path
    scheme_host = F.lower(
        F.regexp_replace(
            F.regexp_extract(F.col("url"), "^(https?://[^/?#]*)", 1),
            ":443$",
            "",
        )
    )
    kept = F.array_join(
        F.sort_array(
            F.filter(
                F.split(query, "&"),
                lambda p: ~(
                    p.startswith("utm_") | p.startswith("ref=") | (p == F.lit(""))
                ),
            )
        ),
        "&",
    )
    canonical = F.concat(
        scheme_host,
        base,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )
    return (
        raw.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


def q184_centroid_similarity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-centroid cosine matrix: per-label mean embedding via one
    posexplode + (label, pos) aggregation — fully partial-aggregated,
    never a per-label collect — then pairwise cosine over the tiny
    centroid frame.  The inter-class similarity audit run before
    contrastive training; the oracle replays the position algebra with
    list indexing."""
    emb = _t(spark, sf_dir, "embeddings")
    pe = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    cent = pe.groupBy("label", "pos").agg(F.avg("v").alias("v"))
    a = cent.select(
        F.col("label").alias("label_a"), "pos", F.col("v").alias("va")
    )
    b = cent.select(
        F.col("label").alias("label_b"), "pos", F.col("v").alias("vb")
    )
    dots = (
        a.join(b, "pos")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("va") * F.col("vb")).alias("dot"),
            F.sum(F.col("va") * F.col("va")).alias("na"),
            F.sum(F.col("vb") * F.col("vb")).alias("nb"),
        )
    )
    return dots.select(
        "label_a",
        "label_b",
        F.round(
            F.col("dot") / (F.sqrt("na") * F.sqrt("nb")), 4
        ).alias("cosine"),
    )


def q185_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy subtree aggregation WITHOUT recursion: in the synthetic
    org tree (parent(k) = k/2, the binary-heap encoding), every node's
    ancestor chain is just ``k >> i`` — so each row explodes into its
    O(log n) ancestors in one pass and a single groupBy sums every
    subtree.  The shape recursive CTEs need O(depth) iterations for,
    done in exactly one shuffle; ancestor chains of arbitrary parent
    tables are precomputable the same way (pointer doubling) in
    O(log depth) rounds."""
    cust = _t(spark, sf_dir, "customer")
    anc = cust.select(
        "c_acctbal",
        F.explode(
            F.expr(
                "transform(sequence(0, 17), i -> shiftright(c_custkey, i))"
            )
        ).alias("ancestor"),
    ).filter(F.col("ancestor") >= 1)
    return (
        anc.groupBy("ancestor")
        .agg(
            F.count(F.lit(1)).alias("subtree_nodes"),
            F.round(F.sum("c_acctbal"), 2).alias("subtree_bal"),
        )
        .filter(F.col("ancestor") < 64)
    )


def q186_decile_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/decile analysis: customers ntile'd into 10 account-balance
    deciles (ties broken by key for engine-stable assignment), joined to
    their order revenue, emitting each decile's share of total.  One
    global ntile window over the small dim + a key-partitioned join to
    the fact; the revenue total rides a broadcast cross."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    deciles = cust.select(
        "c_custkey", F.ntile(10).over(w).alias("decile")
    )
    rev = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("rev")
    )
    per_decile = (
        deciles.join(rev, deciles.c_custkey == rev.o_custkey, "left")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.coalesce(F.sum("rev"), F.lit(0.0)), 2).alias("revenue"),
        )
    )
    total = per_decile.agg(F.sum("revenue").alias("total_rev"))
    return per_decile.crossJoin(F.broadcast(total)).select(
        "decile",
        "n_customers",
        "revenue",
        F.round(F.col("revenue") / F.col("total_rev"), 4).alias("rev_share"),
    )


def q187_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: resample each user's events onto an
    hourly grid and forward-fill the last observed value — the
    pandas ``resample().ffill()`` pattern done Spark-native.  The grid
    generates from each user's own [first, last] hour (sequence
    explode, linear), observations left-join on (user, hour), and the
    fill is one ``last(ignorenulls)`` running window per user.  Emits a
    per-user audit: grid size, observed hours, filled hours."""
    ev = _events(spark, sf_dir)
    hours = ev.select(
        "user_id",
        F.date_trunc("hour", "ts").alias("h"),
        "value",
    )
    obs = hours.groupBy("user_id", "h").agg(
        F.round(F.avg("value"), 4).alias("v")
    )
    span = obs.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("h"),
    )
    joined = grid.join(obs, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = joined.select(
        "user_id",
        "h",
        F.col("v").isNotNull().alias("observed"),
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    )
    # exact integer ten-thousandths: double summation order differs
    # between engines, and ~1000-term sums drift at the cent boundary
    return filled.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("grid_hours"),
        F.sum(F.col("observed").cast("long")).alias("observed_hours"),
        # exact integer ten-thousandths all the way out: a final /10000
        # round lands on half-boundaries where engines' double rounding
        # disagrees
        F.sum(F.round(F.col("v_filled") * 10000).cast("long")).alias(
            "sum_filled_e4"
        ),
    )


def q188_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival over user lifetimes (first->last event,
    whole hours): right-censored when the user is still active in the
    observation window's final 6 hours.  The risk table (n at risk,
    events) is pure aggregation + one ordered window over DISTINCT
    lifetimes; the survival curve is the running product computed as
    ``exp(sum(ln(1 - d/n)))`` — the same float path on both engines,
    rounded to 4."""
    ev = _events(spark, sf_dir)
    bounds = ev.agg(F.max(F.col("ts").cast("long")).alias("t_end"))
    lives = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.col("ts").cast("long")).alias("t0"),
            F.max(F.col("ts").cast("long")).alias("t1"),
        )
        .crossJoin(F.broadcast(bounds))
        .select(
            F.floor((F.col("t1") - F.col("t0")) / 3600).alias("life_h"),
            (F.col("t1") >= F.col("t_end") - 6 * 3600).alias("censored"),
        )
    )
    risk = lives.groupBy("life_h").agg(
        F.count(F.lit(1)).alias("n_here"),
        F.sum((~F.col("censored")).cast("long")).alias("d"),
    )
    w_after = Window.orderBy("life_h").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    w_upto = Window.orderBy("life_h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tab = risk.select(
        "life_h",
        F.sum("n_here").over(w_after).alias("n_at_risk"),
        "d",
    )
    return tab.select(
        "life_h",
        "n_at_risk",
        "d",
        F.round(
            F.exp(
                F.sum(
                    F.log(1 - F.col("d") / F.col("n_at_risk"))
                ).over(w_upto)
            ),
            4,
        ).alias("survival"),
    ).filter(F.col("d") > 0)


def q189_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the categorical profile columns (order status,
    priority, segment-by-nation) — the data-profiling signal for
    near-constant or leaky columns.  One groupBy per column unioned into
    a long (column, value) frame first, so a single aggregation pass
    computes every entropy; -sum(p log2 p) in plain expressions."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    long_frame = (
        orders.select(
            F.lit("o_orderstatus").alias("col"),
            F.col("o_orderstatus").alias("val"),
        )
        .unionByName(
            orders.select(
                F.lit("o_orderpriority").alias("col"),
                F.col("o_orderpriority").alias("val"),
            )
        )
        .unionByName(
            cust.select(
                F.lit("c_mktsegment").alias("col"),
                F.col("c_mktsegment").alias("val"),
            )
        )
    )
    counts = long_frame.groupBy("col", "val").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("col").agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_values")
    )
    p = F.col("n") / F.col("total")
    return (
        counts.join(totals, "col")
        .groupBy("col")
        .agg(
            F.first("n_values").alias("n_values"),
            F.round(-F.sum(p * F.log2(p)), 4).alias("entropy_bits"),
        )
    )


def q190_mp4_roundtrip_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP4 round trip — q156's ISO-BMFF twin: the same seeded
    2-frame MJPEG content MUXED into a standards-shaped MP4 (moov box
    tree with genuine stts/stsc/stsz/stco sample tables) and read back
    through sample-table navigation + JPEG decode.  The oracle replays
    the block arithmetic; a box-offset slip or sample-size error breaks
    the hash."""
    import numpy as np
    import pandas as pd

    from pr2_transformation_spark.functions import multimodal

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        yy, xx = np.mgrid[0:16, 0:16]
        block = (yy // 8) * 2 + (xx // 8)
        for pdf in batches:
            rows = {"doc_id": [], "n_frames": [], "width": [], "height": [],
                    "pixel_sum": [], "pixel_wsum": []}
            for did in pdf["doc_id"]:
                frames = [
                    ((int(did) * 5 + 101 * f + block) % 256).astype(np.uint8)
                    for f in range(2)
                ]
                mp4 = multimodal.mp4_encode(frames, fps=25)
                meta = multimodal.mp4_decode(mp4)
                decoded = multimodal.mp4_frames(mp4)
                flat = np.concatenate(
                    [d[:, :, 0].reshape(-1) for d in decoded]
                ).astype(np.int64)
                rows["doc_id"].append(int(did))
                rows["n_frames"].append(int(meta["n_frames"]))
                rows["width"].append(int(meta["width"]))
                rows["height"].append(int(meta["height"]))
                rows["pixel_sum"].append(int(flat.sum()))
                rows["pixel_wsum"].append(
                    int((flat * (np.arange(flat.size) + 1)).sum())
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen,
        "doc_id long, n_frames int, width int, height int, "
        "pixel_sum long, pixel_wsum long",
    )


def q191_mulaw_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL G.711 mu-law codec under an INDEPENDENT oracle: Spark runs
    the numpy encode->decode round trip over synthesized 16-bit samples,
    while DuckDB re-derives the decoded values from the closed-form
    integer companding law (threshold segments, mantissa, expand) —
    two separate implementations of ITU-T G.711 that must agree
    bit-for-bit on every sample."""
    import numpy as np
    import pandas as pd

    from pr2_transformation_spark.functions import multimodal

    ev = dedup.ensure_parallelism(_t(spark, sf_dir, "events").select("event_id"))

    def gen(batches):
        for pdf in batches:
            ids = pdf["event_id"].to_numpy()
            s = ((ids * 37) % 65536 - 32768).astype(np.int16)
            d = multimodal.mulaw_decode(multimodal.mulaw_encode(s))
            yield pd.DataFrame(
                {
                    "event_id": ids,
                    "sample": s.astype(np.int64),
                    "decoded": d.astype(np.int64),
                }
            )

    return ev.mapInPandas(gen, "event_id long, sample long, decoded long")


def q192_mp3_metadata_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-corpus metadata extraction: per-doc mp3 blobs (valid
    MPEG-1 Layer III frame headers, zero bodies — the container fixture;
    audio decode is the documented seam) walked sync-to-sync with the
    standard bitrate/sample-rate tables.  The oracle recomputes frame
    count, duration, and mean bitrate from the construction parameters
    and the same tables — a table typo or a frame-length slip breaks
    the hash."""
    import pandas as pd

    from pr2_transformation_spark.functions import multimodal

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        for pdf in batches:
            rows = {"doc_id": [], "n_frames": [], "sample_rate": [],
                    "duration_sec": [], "mean_bitrate": []}
            for did in pdf["doc_id"]:
                did = int(did)
                n = 2 + did % 3
                specs = [
                    (1 + (did + f) % 14, did % 3, (did + f) % 2)
                    for f in range(n)
                ]
                blob = multimodal.mp3_build_frames(specs)
                st = multimodal.mp3_stats(blob)
                rows["doc_id"].append(did)
                rows["n_frames"].append(st["n_frames"])
                rows["sample_rate"].append(st["sample_rate"])
                rows["duration_sec"].append(st["duration_sec"])
                rows["mean_bitrate"].append(st["mean_bitrate"])
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen,
        "doc_id long, n_frames int, sample_rate int, "
        "duration_sec double, mean_bitrate long",
    )


def q193_ima_adpcm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 4:1 lossy audio compression (IMA ADPCM, WAV codec 0x11):
    per-doc sine mixtures encode through the stateful predictor and
    decode back.  Lossy + stateful means no closed-form SQL replay, so
    the grading is the q146 pattern: the oracle pins the EXACT input
    checksum (replayed from the synthesis arithmetic via integer
    rounding) plus compression-ratio and RMS-error contracts a broken
    codec can't satisfy; exact codec values are pinned in
    test_multimodal."""
    import numpy as np
    import pandas as pd

    from pr2_transformation_spark.functions import multimodal

    docs = dedup.ensure_parallelism(_t(spark, sf_dir, "documents").select("doc_id"))

    def gen(batches):
        t = np.arange(1000)
        for pdf in batches:
            rows = {"doc_id": [], "input_checksum": [], "ratio_ok": [],
                    "rms_ok": [], "n_bytes": []}
            for did in pdf["doc_id"]:
                did = int(did)
                s = np.floor(
                    8000 * np.sin(t / (10 + did % 7))
                    + 2000 * np.sin(t / (3 + did % 3))
                ).astype(np.int16)
                enc = multimodal.ima_adpcm_encode(s)
                dec = multimodal.ima_adpcm_decode(enc, len(s))
                err = dec.astype(np.int64) - s.astype(np.int64)
                rms = float(np.sqrt((err * err).mean()))
                rows["doc_id"].append(did)
                rows["input_checksum"].append(int(s.astype(np.int64).sum()))
                rows["ratio_ok"].append(len(enc) * 4 == 2 * len(s))
                rows["rms_ok"].append(rms < 1000.0)
                rows["n_bytes"].append(len(enc))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen,
        "doc_id long, input_checksum long, ratio_ok boolean, "
        "rms_ok boolean, n_bytes int",
    )


def q194_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top navigation paths: events sessionize on a 30-minute gap (the
    q14 islands pattern), each session's ordered event types concatenate
    into a path string, and common paths aggregate out.  Ordering inside
    a session is made engine-stable by sorting (t, event_id) structs —
    one user-keyed window plus one path groupBy."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("t"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    sessioned = ev.withColumn(
        "new_session",
        F.when(
            F.col("t") - F.lag("t").over(w) > 1800, 1
        ).otherwise(F.when(F.lag("t").over(w).isNull(), 1).otherwise(0)),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = (
        sessioned.groupBy("user_id", "session_id")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct("t", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .filter(F.col("n_sessions") >= 5)
    )


def q195_windowed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed funnel (the ClickHouse ``windowFunnel`` shape): stages
    view -> click -> purchase must ALL land within 1 hour of the user's
    anchoring first view.  Same single-shuffle-key chain as q164 with
    the window predicate added per stage; emits users reaching each
    depth."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("t")
    )
    views = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("t").alias("t_view")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(
            (F.col("t") > F.col("t_view"))
            & (F.col("t") <= F.col("t_view") + 3600)
        )
        .groupBy("user_id")
        .agg(F.min("t").alias("t_click"), F.first("t_view").alias("t_view"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(
            (F.col("t") > F.col("t_click"))
            & (F.col("t") <= F.col("t_view") + 3600)
        )
        .groupBy("user_id")
        .agg(F.min("t").alias("t_purchase"))
    )
    return (
        views.agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.lit(1).alias("depth"), "n_users")
        .unionByName(
            clicks.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(2).alias("depth"), "n_users"
            )
        )
        .unionByName(
            purchases.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(3).alias("depth"), "n_users"
            )
        )
    )


def q196_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): score every document by the
    hashed-bigram log-likelihood ratio of an English-target model vs the
    raw pool's own model, then keep the global top 20% (rank on the
    ROUNDED weight + doc_id tiebreak so selection is engine-portable).
    The two bucket models are <=256-row aggregates joined into one
    broadcast delta dim — at 100 TB the raw pool shuffles only its
    (doc_id, bucket) partial aggregate.  md5 bucket mode so DuckDB
    replays hashing, smoothing, and the ln-ratio arithmetic exactly."""
    from pr2_transformation_spark.functions import selection as sel

    docs = _t(spark, sf_dir, "documents")
    weights = sel.dsir_log_weights(
        docs,
        docs.filter(F.col("lang") == "en"),
        n_buckets=256,
        hasher="md5",
    ).select(
        "doc_id", "n_feats", F.round("log_weight", 4).alias("log_weight")
    )
    picked = sel.dsir_select_topk(weights, frac=0.2)
    return picked.select(
        "doc_id",
        "n_feats",
        "log_weight",
        F.col("rk").cast("long").alias("rk"),
        "selected",
    )


def q197_count_min_heavy_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch as a mergeable DataFrame (depth 4 x width 64,
    deliberately collision-heavy): build the sketch in one bounded
    shuffle (<=256 counters regardless of key cardinality), point-query
    the 10 exactly-heaviest users, and emit estimate vs truth with the
    CMS one-sided-error invariant (``cms_est >= exact_n`` always).
    md5-salted buckets so DuckDB replays build + probes bit-for-bit."""
    from pr2_transformation_spark.functions import sketches as sk

    ev = _events(spark, sf_dir).select("user_id")
    kw = dict(depth=4, width=64, hasher="md5")
    sketch = sk.count_min_sketch_table(ev, "user_id", **kw)
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "user_id")
        .limit(10)
    )
    est = sk.count_min_estimate(sketch, top, "user_id", **kw)
    return est.select(
        "user_id",
        "exact_n",
        "cms_est",
        (F.col("cms_est") >= F.col("exact_n")).alias("is_overestimate"),
        (F.col("cms_est") - F.col("exact_n")).alias("err"),
    )


def q198_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis weighted sampling without replacement, RNG-free:
    top-40 orders per priority by ln(u)/w with u a 52-bit-exact hash
    uniform and w = o_totalprice — big orders are proportionally likelier
    but any order can win.  Fully deterministic, so the DuckDB oracle
    replays the exact selection (same u bits, same ln, same ranking)."""
    from pr2_transformation_spark.operators.sampling import weighted_sample_topk

    orders = _t(spark, sf_dir, "orders")
    picked = weighted_sample_topk(
        orders.select("o_orderpriority", "o_orderkey", "o_totalprice"),
        "o_orderkey",
        "o_totalprice",
        40,
        partition_cols=("o_orderpriority",),
    )
    return picked.select(
        "o_orderpriority", "o_orderkey", "o_totalprice", F.col("rk").cast("long").alias("rk")
    )


def q199_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jegou et al. 2011), SELF-VERIFYING like
    q24: corpus encoded to m=8 x k=16 codes (~32x memory compression —
    the path that fits a 100 TB embedding set in executor memory),
    queries scored full-precision via ADC lookup tables, top-50
    shortlist re-ranked exactly (rerank=50 — the two-stage production
    design); the in-query join against the exact brute-force top-k
    emits the recall assertion the DuckDB oracle pins.  Measured recall
    at sf0.001/0.01/0.1: 1.0/0.98/0.84 — floor 0.6."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    books = similarity.train_pq_codebooks(corpus, m=8, k=256)
    approx = similarity.cosine_topk_pq(
        corpus, queries, k=5, codebooks=books, rerank=50
    )
    exact = similarity.cosine_topk_bruteforce_pandas(corpus, queries, k=5)
    joined = exact.select("query_id", "vec_id").join(
        approx.select("query_id", "vec_id", F.lit(1).alias("__hit")),
        ["query_id", "vec_id"],
        "left",
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.lit(0.6).alias("recall_floor"),
        (
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))) / F.count(F.lit(1))
            >= 0.6
        ).alias("meets_recall_floor"),
    )


def q200_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: q171's blocked Jaro-Winkler pairs
    (threshold 0.85) become an edge list, connected components (string
    vertex ids — the operator is id-type generic) merge transitive
    matches, and every matched name collapses to its min-name canonical
    entity.  The composition the reference's merge stage implies but
    never ships: pairwise linkage alone leaves A~B, B~C unresolved.
    Oracle replays JW pairs + a recursive-CTE min-label propagation."""
    from pr2_transformation_spark.functions import linkage
    from pr2_transformation_spark.operators.graph import connected_components

    part = _t(spark, sf_dir, "part")
    pairs = linkage.blocked_name_pairs(
        part, "p_name", F.split(F.col("p_name"), " ").getItem(1), 0.85
    )
    edges = pairs.select(
        F.col("name_a").alias("src"), F.col("name_b").alias("dst")
    )
    comp = connected_components(edges)
    return (
        comp.groupBy("comp")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.concat_ws("|", F.array_sort(F.collect_list("id"))).alias(
                "members"
            ),
        )
        .filter(F.col("n_members") >= 2)
        .select(F.col("comp").alias("canonical"), "n_members", "members")
    )


def q201_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift monitor — the data-quality gate a
    continuously-ingesting pipeline runs before trusting a new batch:
    per event type, bin `value` into 10 equal-width bins fitted on the
    REFERENCE half of the time range, compare the current half's bin
    distribution, PSI = sum (p_cur - p_ref) * ln(p_cur / p_ref) with
    0.5-per-bin Laplace smoothing.  One scan, two broadcast dims (time
    midpoint, per-type ref min/max); bins partial-aggregate map-side,
    so at 100 TB only type x bin rows shuffle."""
    ev = (
        _events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_type", "value", F.unix_timestamp("ts").alias("t"))
    )
    bounds = ev.agg(F.min("t").alias("tmin"), F.max("t").alias("tmax"))
    tagged = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "value",
        (F.col("t") * 2 < F.col("tmin") + F.col("tmax")).alias("is_ref"),
    )
    stats = (
        tagged.filter("is_ref")
        .groupBy("event_type")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    )
    binned = tagged.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "is_ref",
        F.least(
            F.lit(9),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col("value") - F.col("mn"))
                    / ((F.col("mx") - F.col("mn")) / 10)
                ).cast("int"),
            ),
        ).alias("bin"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("ref_n"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("cur_n"),
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("ref_n").alias("ref_t"), F.sum("cur_n").alias("cur_t")
    )
    p_ref = (F.col("ref_n") + 0.5) / (F.col("ref_t") + 5)
    p_cur = (F.col("cur_n") + 0.5) / (F.col("cur_t") + 5)
    psi = (
        counts.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            ((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("term"),
            "ref_n",
            "cur_n",
        )
        .groupBy("event_type")
        .agg(
            F.round(F.sum("term"), 4).alias("psi"),
            F.sum("ref_n").alias("n_ref"),
            F.sum("cur_n").alias("n_cur"),
        )
    )
    return psi.select(
        "event_type", "psi", "n_ref", "n_cur", (F.col("psi") > 0.2).alias("drifted")
    )


def q202_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-center greedy coreset (Sener & Savarese 2018): 6 maximally
    diverse embeddings picked by farthest-point traversal from the
    min-id seed — the deterministic diverse-subset selector for
    training-data curation.  Each greedy round is one shuffle-free scan
    (selected set rides the closure); the oracle replays all 5 picks as
    unrolled CTE stages with the same rounded cosine distances."""
    emb = _t(spark, sf_dir, "embeddings")
    picks = similarity.kcenter_greedy(emb, k=6, round_digits=4)
    return spark.createDataFrame(
        [(s, i, d) for s, i, d in picks], "step int, vec_id long, d double"
    )


def q203_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ftfy-lite unicode hygiene, round-trip verified IN-QUERY: every doc
    is deterministically dirtied (BOM + curly quotes wrapped, spaces ->
    NBSP, zero-width + em-dash appended), then ``clean_unicode`` must
    fold it back to the quoted clean form.  Pure regexp_replace chain —
    one codegen'd projection, scan-speed at 100 TB; the oracle re-runs
    the identical literal-character patterns under RE2."""
    from pr2_transformation_spark.functions.textstats import clean_unicode

    docs = _t(spark, sf_dir, "documents")
    dirty = F.concat(
        F.lit("﻿“"),
        F.regexp_replace(F.col("text"), " ", " "),
        F.lit("”​—"),
    )
    cleaned = clean_unicode(dirty)
    expected = F.concat(F.lit('"'), clean_unicode(F.col("text")), F.lit('"-'))
    return docs.select(
        "doc_id",
        F.md5(cleaned).alias("clean_md5"),
        (cleaned == expected).alias("recovered"),
        (F.length(dirty) - F.length(cleaned)).alias("squeezed"),
    )


def q204_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate burst detection: hourly counts per event type, rolling
    trailing-24h baseline, z > 3 flags a burst.  The variance comes from
    EXPLICIT integer window sums (sum, sum-of-squares, n) instead of
    stddev_samp — integer sums are order-exact in IEEE doubles, so the
    z-scores are bit-identical across engines and partial-agg orders
    (Welford-style stddev is not).  One shuffle on the type key."""
    ev = _events(spark, sf_dir).select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    )
    hourly = ev.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-24, -1)
    stats = hourly.select(
        "event_type",
        "cnt",
        F.sum("cnt").over(w).alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("ss"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    mean = F.col("s") / F.col("n")
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (
        F.col("n") - 1
    )
    z = F.when(
        (F.col("n") == 24) & (var > 0), (F.col("cnt") - mean) / F.sqrt(var)
    )
    return (
        stats.select("event_type", z.alias("z"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(F.when(F.col("z") > 3, 1).otherwise(0)).alias("n_bursts"),
            F.round(F.max("z"), 4).alias("max_z"),
        )
    )


def q205_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation harness for the stopword language-ID: the
    labeled `lang` column vs `language_guess` as a confusion matrix with
    per-cell hit marking — the eval loop any heuristic filter needs
    before it gates a corpus.  One scan, one (label, guess) groupBy."""
    from pr2_transformation_spark.functions.textstats import language_guess

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("lang", language_guess(F.col("text")).alias("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(
                F.when(F.col("lang") == F.col("lang_guess"), 1).otherwise(0)
            ).alias("is_correct"),
        )
    )


def q206_portable_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable HyperLogLog: md5 register table (p=8, 256
    registers, string-bit rho — no float log2), harmonic-mean estimate
    with linear-counting correction, compared in-query against the exact
    distinct count.  Unlike q64's opaque JVM HLL++ this build is plain
    data — mergeable by GROUP BY max and replayed REGISTER-FOR-REGISTER
    by the DuckDB oracle, turning approx-distinct into a hash-graded
    query.  Estimate rounds to 2; the 3-sigma bound (sigma=1.04/16) is
    asserted as a boolean."""
    from pr2_transformation_spark.functions import sketches as sk

    ev = _events(spark, sf_dir).select("user_id")
    regs = sk.hll_register_table(ev, "user_id", p=8)
    est = sk.hll_estimate(regs, p=8)
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            F.lit(256).alias("m"),
            "n_exact",
            F.round("estimate", 2).alias("estimate"),
            (
                F.abs(F.col("estimate") - F.col("n_exact"))
                <= F.lit(3 * 1.04 / 16) * F.col("n_exact")
            ).alias("within_3_sigma"),
        )
    )


def q207_data_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract gate (Great-Expectations shape) over orders: key
    not-null + unique, price positive, status in domain, date in the
    TPC-H window, minimum row count — six assertions priced as ONE scan
    (single aggregate, stacked verdict rows).  The per-batch quality
    gate an ingest pipeline runs before merging."""
    from pr2_transformation_spark.profiling import data_contract

    orders = _t(spark, sf_dir, "orders")
    return data_contract(
        orders,
        [
            {"name": "orderkey_not_null", "kind": "not_null", "column": "o_orderkey"},
            {"name": "orderkey_unique", "kind": "unique", "column": "o_orderkey"},
            {"name": "price_positive", "kind": "predicate", "expr": "o_totalprice > 0"},
            {
                "name": "status_in_domain",
                "kind": "predicate",
                "expr": "o_orderstatus IN ('O', 'F', 'P')",
            },
            {
                "name": "date_in_window",
                "kind": "predicate",
                "expr": "o_orderdate BETWEEN DATE '1992-01-01' AND DATE '1998-12-31'",
            },
            {"name": "min_rows", "kind": "min_rows", "threshold": 100},
        ],
    )


def q208_functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery (the Deequ-style profiling check):
    A -> B holds iff every A-group maps to one B, i.e. COUNT(DISTINCT
    (A,B)) == COUNT(DISTINCT A).  Four candidate FDs over customer and
    nation priced as grouped distinct aggregates; the violation count
    (pairs minus lhs groups) localizes how broken a dependency is.  The
    schema-inference signal a wide-table cleaner wants before choosing
    merge keys."""
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")

    def fd(df, lhs, rhs):
        return df.agg(
            F.lit(lhs).alias("lhs"),
            F.lit(rhs).alias("rhs"),
            F.countDistinct(F.col(lhs)).alias("n_lhs"),
            F.countDistinct(F.col(lhs), F.col(rhs)).alias("n_pairs"),
            (
                F.countDistinct(F.col(lhs), F.col(rhs))
                - F.countDistinct(F.col(lhs))
            ).alias("violations"),
            (
                F.countDistinct(F.col(lhs), F.col(rhs))
                == F.countDistinct(F.col(lhs))
            ).alias("holds"),
        )

    return (
        fd(cust, "c_custkey", "c_nationkey")
        .unionByName(fd(cust, "c_nationkey", "c_mktsegment"))
        .unionByName(fd(nat, "n_nationkey", "n_regionkey"))
        .unionByName(fd(nat, "n_regionkey", "n_name"))
    )


def q209_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprint (anti-entropy check between
    replicas/engines): per-row canonical string (null-marked, unit-
    separated) -> 60-bit md5 -> BIT_XOR + SUM + COUNT.  Any engine can
    recompute it without sorting or shuffling anything but three scalars
    — the cheap way to answer 'are these two 100 TB copies identical?'
    before walking a Merkle tree.  XOR and modular SUM catch different
    corruption classes (XOR misses duplicated+dropped pairs, SUM
    doesn't)."""
    from pr2_transformation_spark.functions.dedup import md5_long

    orders = _t(spark, sf_dir, "orders")
    row = F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("<NULL>"))
            for c in [
                "o_orderkey",
                "o_custkey",
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            ]
        ],
    )
    h = md5_long(row)
    # sum in decimal(38,0): 15k x 60-bit hashes overflow a plain long sum
    return orders.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor("h").alias("xor_digest"),
        (F.sum(F.col("h").cast("decimal(38,0)")) % F.lit(1 << 60))
        .cast("long")
        .alias("sum_digest"),
    )


def q210_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a per-priority revenue
    aggregate built from the pre-1996 base is UPDATED by merging the
    1996+ delta batch's partial aggregate — count/sum/min/max combine
    associatively, so refresh cost tracks the DELTA size, never the
    100 TB base (the same algebra Spark uses for map-side partial
    aggregation, lifted to pipeline granularity).  AVG is re-derived
    from merged sum/count, NOT averaged across batches (the classic
    incremental-view bug).  Self-verifying: every merged row is compared
    against the full recompute in-query."""
    orders = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1996-01-01").cast("date")

    def partial(df):
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("rev"),
            F.min("o_orderdate").alias("first_d"),
            F.max("o_orderdate").alias("last_d"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n").alias("n"),
            F.sum("rev").alias("rev"),
            F.min("first_d").alias("first_d"),
            F.max("last_d").alias("last_d"),
        )
    )
    full = partial(orders).select(
        "o_orderpriority",
        F.col("n").alias("n_full"),
        F.col("rev").alias("rev_full"),
    )
    return (
        merged.join(full, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n",
            F.round("rev", 2).alias("rev"),
            F.round(F.col("rev") / F.col("n"), 2).alias("avg_rev"),
            "first_d",
            "last_d",
            (
                (F.col("n") == F.col("n_full"))
                & (F.round("rev", 2) == F.round("rev_full", 2))
            ).alias("matches_full_recompute"),
        )
    )


def q211_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual mixture (the mT5/XLM-R recipe):
    language sampling probability q_l proportional to p_l^alpha with
    alpha=0.7 — low-resource languages get upsampled, the head gets
    tamed.  Emits per language the raw share, the tempered share, the
    up/down-sampling factor, and the expected document draw for a
    10k-doc budget.  Two 1-row broadcast scalars (corpus total, tempered
    normalizer) — metadata-sized at any corpus scale."""
    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("__total"))
    with_p = counts.crossJoin(F.broadcast(total)).select(
        "lang",
        "n_docs",
        (F.col("n_docs") / F.col("__total")).alias("p"),
        F.pow(F.col("n_docs") / F.col("__total"), F.lit(0.7)).alias("w"),
    )
    norm = with_p.agg(F.sum("w").alias("__z"))
    return with_p.crossJoin(F.broadcast(norm)).select(
        "lang",
        "n_docs",
        F.round("p", 4).alias("p_raw"),
        F.round(F.col("w") / F.col("__z"), 4).alias("p_tempered"),
        F.round((F.col("w") / F.col("__z")) / F.col("p"), 4).alias(
            "upsample_factor"
        ),
        F.round(F.lit(10000) * F.col("w") / F.col("__z"), 1).alias(
            "expected_docs"
        ),
    )


def q212_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per language: words (whitespace tokens),
    sentences (terminal-punctuation runs, floor 1), syllables (vowel-
    group runs — the standard heuristic), folded through the published
    206.835 − 1.015·(W/S) − 84.6·(Syl/W) formula.  Scan-side
    regexp_extract_all counts, one groupBy — the readability-band
    filter a curriculum builder runs at 100 TB."""
    docs = _t(spark, sf_dir, "documents")
    words = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    sents = F.greatest(
        F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
    )
    sylls = F.size(
        F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (words / sents)
        - F.lit(84.6) * (sylls / words)
    )
    return (
        docs.select("lang", flesch.alias("f"), words.alias("w"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("f"), 2).alias("avg_flesch"),
            F.round(F.avg("w"), 2).alias("avg_words"),
        )
    )


def q213_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus diagnostics: shingle-set Jaccard BETWEEN SOURCES — which
    feeds are near-copies of each other (mirror detection before dedup
    spends compute on their pairs).  Distinct (source, 3-gram) sets,
    posting-list join on the shingle (same bounded fan-out argument as
    q21, but the pair space is sources², not docs²), exact Jaccard per
    source pair, top-10 by overlap."""
    docs = _t(spark, sf_dir, "documents")
    sh = docs.select(
        "source",
        F.explode(
            textstats.word_shingles(F.col("text"), 3)
        ).alias("g"),
    ).distinct()
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "g")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = (
        inter.join(
            F.broadcast(sizes.select(F.col("source").alias("src_a"), F.col("sz").alias("sz_a"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("src_b"), F.col("sz").alias("sz_b"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
                4,
            ).alias("jaccard"),
        )
    )
    return jac.orderBy(F.desc("jaccard"), "src_a", "src_b").limit(10)


def q214_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement score per user: score =
    Σ value · exp(−λ·Δdays) with λ = ln(2)/30 (30-day half-life),
    anchored to the corpus max timestamp (deterministic, no now()).
    The decay factors fold into the SAME partial aggregation any sum
    gets — the incremental-refresh-friendly engagement metric (old
    scores re-decay by a scalar multiplier, new events just add).
    Top-15 users, score rounded; one shuffle on user_id."""
    ev = _events(spark, sf_dir).select(
        "user_id", "value", F.unix_timestamp("ts").alias("t")
    )
    anchor = ev.agg(F.max("t").alias("t_max"))
    lam = 0.0231049060186648  # ln(2)/30 — decimal literal, same in SQL
    scored = ev.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        (
            F.col("value")
            * F.exp(
                -F.lit(lam) * (F.col("t_max") - F.col("t")) / F.lit(86400.0)
            )
        ).alias("dv"),
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.round(F.sum("dv"), 4).alias("decayed_score"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy(F.desc("decayed_score"), "user_id")
        .limit(15)
    )


def q215_string_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-profiling pass: per STRING column of customer, length min/
    max/avg, null count, distinct count — ALL columns in one scan by
    stacking (column, length) pairs before the aggregate, the same
    one-pass-over-N-columns shape as the reference's profiling driver
    (`/root/reference/core/utils.py` COUNTIF batching), lifted to a
    long-frame groupBy so adding columns never adds scans."""
    cust = _t(spark, sf_dir, "customer")
    cols = ["c_name", "c_mktsegment", "c_custkey", "c_nationkey"]
    stacked = cust.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select(F.col("p.column").alias("column"), F.col("p.v").alias("v"))
    return (
        stacked.groupBy("column")
        .agg(
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("n_null"),
            F.countDistinct("v").alias("n_distinct"),
            F.min(F.length("v")).alias("min_len"),
            F.max(F.length("v")).alias("max_len"),
            F.round(F.avg(F.length("v")), 2).alias("avg_len"),
        )
    )


def q216_wow_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week metric regression report: per event type, this
    ISO-week vs previous-week event count and value sum, relative
    deltas, and a >20%-swing flag — the pipeline-health dashboard row.
    LAG over a (type, week) aggregate: the scan reduces map-side to
    types x weeks rows before any window moves.  Weeks are keyed by
    ``date_trunc('week', ts)`` (the ISO Monday start date), NOT by the
    (calendar year, ISO week-number) pair: Dec 29-31 falling in ISO
    week 1 of the NEXT year would sort (yr, 1) before (yr, 2) and
    split the boundary week into two groups."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        "value",
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_start"),
    )
    weekly = ev.groupBy("event_type", "week_start").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("val"),
    )
    w = Window.partitionBy("event_type").orderBy("week_start")
    return (
        weekly.select(
            "event_type",
            "week_start",
            "n",
            "val",
            F.lag("n").over(w).alias("n_prev"),
        )
        .filter(F.col("n_prev").isNotNull())
        .select(
            "event_type",
            "week_start",
            "n",
            "n_prev",
            F.round((F.col("n") - F.col("n_prev")) / F.col("n_prev"), 4).alias(
                "wow_delta"
            ),
            (
                F.abs((F.col("n") - F.col("n_prev")) / F.col("n_prev")) > 0.2
            ).alias("regressed"),
        )
    )


def q217_pii_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-density profile per source, round-trip style: the corpus is
    PII-free, so emails and US-phone strings are deterministically
    injected for doc_id % 5 == 0 / % 7 == 0, then the SAME regexes that
    back ``textstats.redact_pii`` must count them back out exactly —
    proving the detector patterns cross-engine before they gate a real
    crawl.  Scan-side regexp_extract_all; one groupBy on source."""
    docs = _t(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0, F.lit(" call 555-867-5309")
        ).otherwise(F.lit("")),
    )
    emails = F.size(
        F.expr(
            r"regexp_extract_all(__dirty,"
            r" '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', 0)"
        )
    )
    phones = F.size(
        F.expr(
            r"regexp_extract_all(__dirty,"
            r" '\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b', 0)"
        )
    )
    return (
        docs.select("source", "doc_id", dirty.alias("__dirty"))
        .select("source", "doc_id", emails.alias("e"), phones.alias("p"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("e").alias("n_emails"),
            F.sum("p").alias("n_phones"),
            (
                F.sum("e")
                == F.sum(F.when(F.col("doc_id") % 5 == 0, 1).otherwise(0))
            ).alias("emails_recovered"),
            (
                F.sum("p")
                == F.sum(F.when(F.col("doc_id") % 7 == 0, 1).otherwise(0))
            ).alias("phones_recovered"),
        )
    )


def q218_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test leakage audit — the check every LM data pipeline owes
    its eval: hash-assign train(80%)/test(20%) splits, find near-dup
    pairs (bigram Jaccard >= 0.05, q21's posting-list plan), and report
    pairs BY SPLIT COMBINATION — a 'train-test' row with n_pairs > 0 is
    quantified leakage that document-level dedup inside each split
    cannot see.  Composition of assign_splits + ngram_jaccard_pairs;
    everything shuffles on keys already justified by its parts."""
    from pr2_transformation_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents")
    splits = sampling.assign_splits(
        docs, "doc_id", {"train": 0.8, "test": 0.2}
    ).select(F.col("doc_id"), F.col("split"))
    pairs = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", n=2, min_jaccard=0.05,
        bucket_cols=["lang", "source"],
    ).select("id_a", "id_b", "jaccard")
    typed = (
        pairs.join(
            splits.select(
                F.col("doc_id").alias("id_a"), F.col("split").alias("sa")
            ),
            "id_a",
        )
        .join(
            splits.select(
                F.col("doc_id").alias("id_b"), F.col("split").alias("sb")
            ),
            "id_b",
        )
        .select(
            F.concat_ws(
                "-", F.least("sa", "sb"), F.greatest("sa", "sb")
            ).alias("pair_type"),
            "jaccard",
        )
    )
    return typed.groupBy("pair_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.max("jaccard"), 4).alias("max_jaccard"),
        (F.first(F.col("pair_type")) == "test-train").alias("is_leak"),
    )


def q219_minhash_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE PATH for q213's mirror detection, verified against it:
    one 32-perm MinHash signature PER SOURCE (constant size no matter
    how many shingles the source has), estimated Jaccard = matching-
    component fraction, compared in-query to the exact set Jaccard.
    At 100 TB the signature aggregation replaces q213's distinct-set
    shuffle with 20 x 32 longs; the md5+affine arithmetic is the same
    the q22 oracle replays, so DuckDB re-derives every signature
    component bit-for-bit.  Emits top-10 exact pairs with estimate,
    error, and the 3-sigma-ish bound flag (sigma = 1/sqrt(32))."""
    from pr2_transformation_spark.functions.dedup import (
        MINHASH_P,
        md5_long,
        minhash_affine_constants,
    )

    docs = _t(spark, sf_dir, "documents")
    sh = docs.select(
        "source",
        F.explode(textstats.word_shingles(F.col("text"), 3)).alias("g"),
    ).distinct()
    hashed = sh.select(
        "source", (md5_long(F.col("g")) % MINHASH_P).alias("h")
    )
    perms = minhash_affine_constants(32)
    sig = hashed.groupBy("source").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(
                f"s{i}"
            )
            for i, (a, b) in enumerate(perms)
        ]
    )
    sig_arr = sig.select(
        "source", F.array(*[f"s{i}" for i in range(32)]).alias("sig")
    )
    est = (
        sig_arr.alias("a")
        .join(sig_arr.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
            (
                F.aggregate(
                    F.zip_with(
                        F.col("a.sig"),
                        F.col("b.sig"),
                        lambda x, y: (x == y).cast("int"),
                    ),
                    F.lit(0),
                    lambda acc, v: acc + v,
                )
                / F.lit(32.0)
            ).alias("est_jaccard"),
        )
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), "g")
        .filter(F.col("x.source") < F.col("y.source"))
        .groupBy(
            F.col("x.source").alias("src_a"), F.col("y.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    exact = (
        inter.join(
            F.broadcast(
                sizes.select(F.col("source").alias("src_a"), F.col("sz").alias("sz_a"))
            ),
            "src_a",
        )
        .join(
            F.broadcast(
                sizes.select(F.col("source").alias("src_b"), F.col("sz").alias("sz_b"))
            ),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            (
                F.col("n_common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common"))
            ).alias("exact_j"),
        )
    )
    out = exact.join(F.broadcast(est), ["src_a", "src_b"]).select(
        "src_a",
        "src_b",
        F.round("exact_j", 4).alias("exact_jaccard"),
        F.round("est_jaccard", 4).alias("est_jaccard"),
        (
            F.abs(F.col("est_jaccard") - F.col("exact_j")) <= F.lit(0.55)
        ).alias("within_bound"),
    )
    return out.orderBy(F.desc("exact_jaccard"), "src_a", "src_b").limit(10)


def q220_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per customer recency (days since last
    order, anchored to corpus max date — no now()), frequency (order
    count), monetary (total spend), each cut into quintiles by ntile,
    then the classic segment labels (champion / loyal / at-risk /
    hibernating / other).  One shuffle to the per-customer rollup;
    three ntile windows over the 1 500-row summary, not the fact
    table.  Emits the segment census."""
    orders = _t(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("d_max"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_d"),
            F.count(F.lit(1)).alias("freq"),
            F.sum("o_totalprice").alias("spend"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("d_max", "last_d").alias("recency_days"),
            "freq",
            "spend",
        )
    )
    r = F.ntile(5).over(Window.orderBy(F.col("recency_days"), F.col("o_custkey")))
    fq = F.ntile(5).over(
        Window.orderBy(F.col("freq").desc(), F.col("o_custkey"))
    )
    m = F.ntile(5).over(
        Window.orderBy(F.col("spend").desc(), F.col("o_custkey"))
    )
    scored = per_cust.select(
        "o_custkey",
        "recency_days",
        r.alias("r_q"),
        fq.alias("f_q"),
        m.alias("m_q"),
    )
    seg = (
        F.when((F.col("r_q") <= 2) & (F.col("f_q") <= 2) & (F.col("m_q") <= 2), "champion")
        .when((F.col("f_q") <= 2) & (F.col("m_q") <= 2), "loyal")
        .when((F.col("r_q") >= 4) & (F.col("m_q") <= 2), "at_risk")
        .when(F.col("r_q") >= 4, "hibernating")
        .otherwise("other")
    )
    return (
        scored.select(seg.alias("segment"))
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def q221_degree_tail_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution tail analysis of the co-purchase graph: node
    degree per part (distinct co-ordered partner parts), then the Hill
    estimator alpha = 1 + k / sum(ln(d_i / d_min)) over the top-k=50
    degrees — the power-law-tail diagnostic that predicts whether
    hot-key mitigation (salting, AQE skew split) will be needed before
    a join on this key ever runs.  Degrees partial-aggregate; only the
    50-row tail is windowed."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("p"), F.col("b.l_partkey").alias("q")
        )
        .distinct()
    )
    deg = pairs.groupBy("p").agg(F.count(F.lit(1)).alias("d"))
    topk = deg.orderBy(F.desc("d"), "p").limit(50)
    dmin = topk.agg(F.min("d").alias("d_min"))
    hill = (
        topk.crossJoin(F.broadcast(dmin))
        .select((F.log(F.col("d") / F.col("d_min"))).alias("l"))
        .agg(
            F.lit(50).alias("k"),
            F.round(
                F.lit(1.0) + F.lit(50) / F.sum("l"), 4
            ).alias("hill_alpha"),
        )
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.max("d").alias("max_degree"),
        F.round(F.avg("d"), 2).alias("avg_degree"),
    )
    return hill.crossJoin(F.broadcast(stats))


def q222_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (completes q39's backward direction): each
    click gets the value of the user's NEXT view at-or-after the click
    — same union+descending-window trick, one shuffle, zero joins;
    oracle is DuckDB's native ASOF LEFT JOIN with the <= comparison."""
    from pr2_transformation_spark.operators.joins import asof_join

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("next_view_value")
    )
    out = asof_join(
        clicks, views, ["user_id"], "ts", ["next_view_value"],
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.round(F.col("next_view_value"), 2).alias("next_view_value"),
    )


def q223_zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit, fully graded: Morton-interleave (nationkey,
    8-bit-quantized acctbal), cut the curve into 16 ntile shards, and
    emit each shard's bounding rectangle plus BOTH layouts' pruning
    cost for a `c_nationkey = 13` probe — shards touched under z-order
    vs under an acctbal-sorted layout (which cannot prune nationkey at
    all).  The z-value is a pure bit expression, so DuckDB replays the
    interleave bit-for-bit; this grades operators/zorder.py end-to-end."""
    from pr2_transformation_spark.operators.zorder import quantize, z_value

    cust = _t(spark, sf_dir, "customer")
    z = z_value(
        F.col("c_nationkey"), quantize(F.col("c_acctbal"), -1000.0, 10000.0, 8),
        bits=8,
    )
    sharded = cust.select(
        "c_nationkey",
        "c_acctbal",
        F.ntile(16).over(Window.orderBy(z, F.col("c_custkey"))).alias("shard"),
    )
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("c_nationkey").alias("nk_min"),
        F.max("c_nationkey").alias("nk_max"),
        F.round(F.min("c_acctbal"), 2).alias("bal_min"),
        F.round(F.max("c_acctbal"), 2).alias("bal_max"),
        (
            (F.min("c_nationkey") <= 13) & (F.max("c_nationkey") >= 13)
        ).alias("scanned_for_nk13"),
    )


def q224_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (and weighted p90) of unit price weighted by
    quantity, per return flag — the 'typical traded price' statistic a
    plain median gets wrong when line sizes vary.  Classic cumulative-
    weight window: sort by value within the group, take the first row
    whose running weight crosses half the total.  One shuffle on the
    group key; no percentile UDAF needed."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").alias("w"),
    )
    wspec = (
        Window.partitionBy("l_returnflag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("l_returnflag")
    cum = li.select(
        "l_returnflag",
        "v",
        F.sum("w").over(wspec).alias("cw"),
        F.sum("w").over(tot).alias("tw"),
    )

    def wq(frac):
        return F.min(
            F.when(F.col("cw") >= F.col("tw") * frac, F.col("v"))
        )

    return cum.groupBy("l_returnflag").agg(
        F.round(wq(0.5), 2).alias("weighted_median"),
        F.round(wq(0.9), 2).alias("weighted_p90"),
        F.round(F.first("tw"), 2).alias("total_weight"),
    )


def q225_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-to-purchase latency distribution: per user, seconds from
    first click to first subsequent purchase, summarized as exact
    p50/p90/max over converting users — the time-to-convert report
    behind every funnel.  Two tiny per-user aggregates on one shuffle
    key; exact medians on the 1 500-row user frame."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("t")
    )
    first_click = ev.filter(F.col("event_type") == "click").groupBy(
        "user_id"
    ).agg(F.min("t").alias("t_click"))
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .filter(F.col("t") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min(F.col("t") - F.col("t_click")).alias("latency_s"))
    )
    return purch.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.median("latency_s").alias("p50_s"),
        F.percentile("latency_s", F.lit(0.9)).alias("p90_s"),
        F.max("latency_s").alias("max_s"),
    )


def q226_prefix_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered set-similarity self-join (PPJoin/AllPairs family):
    thresholded Jaccard >= 0.4 over word bigrams with only each doc's
    |s|-ceil(0.4|s|)+1 rarest shingles indexed — lossless by the prefix
    pigeonhole (see ngram_jaccard_pairs_prefix), candidates verified
    exactly.  The oracle is the ORDINARY full set-similarity SQL: the
    whole point is that the pruned plan returns byte-identical results
    to the brute-force definition."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs_prefix(
        docs, "text", "doc_id", n=2, min_jaccard=0.4,
        bucket_cols=["lang", "source"],
    )


def q227_rare_label_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-tail label collapsing (the categorical-feature prep step):
    keep part brands until the running frequency share reaches 60%,
    fold the tail into '__other__', and emit the collapsed census plus
    how many raw labels each collapsed one absorbs.  Cumulative-share
    window over the (tiny) label dimension, broadcast back over the
    scan — the fact table never re-shuffles."""
    part = _t(spark, sf_dir, "part")
    counts = part.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("p_brand"))
    tot = Window.partitionBy()
    share = counts.select(
        "p_brand",
        "n",
        (
            (F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, -1)))
            / F.sum("n").over(tot)
        ).alias("share_before"),
    )
    mapped = share.select(
        "p_brand",
        "n",
        F.when(
            F.coalesce(F.col("share_before"), F.lit(0.0)) < 0.6,
            F.col("p_brand"),
        )
        .otherwise(F.lit("__other__"))
        .alias("label"),
    )
    return mapped.groupBy("label").agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_raw_labels"),
    )


def q228_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day via the FIRST-SEEN trick: one
    groupBy finds each user's first active day, a second counts
    first-appearances per day, and a running sum turns that into the
    cumulative-unique curve — no windowed COUNT(DISTINCT) (which Spark
    cannot express) and no day x user re-scan.  The standard growth-
    curve pattern; shuffles only user-sized then day-sized frames."""
    ev = _events(spark, sf_dir).select(
        "user_id", F.to_date("ts").alias("d")
    )
    first_seen = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    per_day = first_seen.groupBy("d0").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("d0").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.col("d0").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


def q229_luhn_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Check-digit validation (Luhn mod-10, the credit-card/IMEI
    algorithm) as a scan-side ID-integrity gate, round-trip style: a
    15-digit base is derived from each order key, the correct Luhn
    check digit appended, then keys where orderkey % 13 = 0 are
    CORRUPTED by bumping one digit — the validator must flag exactly
    those.  Pure digit arithmetic (substr + CASE doubling), identical
    in any SQL engine; emits the confusion counts."""
    orders = _t(spark, sf_dir, "orders")
    base = F.lpad(F.col("o_orderkey").cast("string"), 15, "0")

    def luhn_sum(col, n, parity):
        # sum over digit positions 1..n of d or double-with-carry
        total = F.lit(0)
        for i in range(1, n + 1):
            d = F.substring(col, i, 1).cast("int")
            if i % 2 == parity:
                dd = d * 2
                total = total + F.when(dd > 9, dd - 9).otherwise(dd)
            else:
                total = total + d
        return total

    # check digit c makes (sum + c) % 10 == 0, doubling odd positions
    # (1-indexed from the LEFT of the 15-digit base => positions 1,3,..15
    # are doubled when a 16th digit is appended)
    s = luhn_sum(base, 15, 1)
    check = F.pmod(-s, 10)
    good = F.concat(base, check.cast("string"))
    corrupted = F.when(
        F.col("o_orderkey") % 13 == 0,
        F.concat(
            F.substring(good, 1, 7),
            F.pmod(F.substring(good, 8, 1).cast("int") + 1, 10).cast("string"),
            F.substring(good, 9, 8),
        ),
    ).otherwise(good)
    with_id = orders.select(
        "o_orderkey", corrupted.alias("card_id"),
        (F.col("o_orderkey") % 13 == 0).alias("was_corrupted"),
    )
    v = luhn_sum(F.col("card_id"), 16, 1)
    validated = with_id.select(
        "was_corrupted", (F.pmod(v, 10) == 0).alias("passes_luhn")
    )
    return validated.groupBy("was_corrupted", "passes_luhn").agg(
        F.count(F.lit(1)).alias("n")
    )


def q230_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit: orphaned lineitems
    (no parent order), childless orders, and both directions' coverage
    — the join-key health check that belongs next to q207's single-
    table contract.  Two anti-join counts + totals, each a partial-
    aggregated key join; no wide rows move."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    li_stats = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"], "left"
    ).agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.sum(
            F.when(orders["o_orderkey"].isNull(), 1).otherwise(0)
        ).alias("orphan_lineitems"),
    )
    ld = li.distinct()
    ord_stats = orders.join(
        ld, orders["o_orderkey"] == ld["l_orderkey"], "left"
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(ld["l_orderkey"].isNull(), 1).otherwise(0)).alias(
            "childless_orders"
        ),
    )
    return li_stats.crossJoin(F.broadcast(ord_stats)).select(
        "n_lineitems",
        "orphan_lineitems",
        "n_orders",
        "childless_orders",
        F.round(
            1.0 - F.col("orphan_lineitems") / F.col("n_lineitems"), 4
        ).alias("lineitem_coverage"),
        F.round(
            1.0 - F.col("childless_orders") / F.col("n_orders"), 4
        ).alias("order_coverage"),
    )


def q231_streaming_counts_graded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING under the batch oracle: the events table is re-ingested
    through Structured Streaming (file source, availableNow trigger —
    the bounded-backfill mode a production stream uses to catch up),
    aggregated in complete mode into a memory sink, and the FINAL
    snapshot is returned for grading.  Exactly-once file-source
    semantics mean the snapshot must equal the batch GROUP BY — which
    is precisely what the DuckDB oracle asserts.  The one query where
    the engine under test is the streaming runtime itself."""
    import os as _os

    path = _os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # the file source wants a directory: a directory-layout table streams
    # directly; a single-file table streams its parent dir glob-limited
    # to that file (globbing the parent would otherwise silently match
    # nothing for directory layouts — 0 rows, not an error)
    if _os.path.isdir(path):
        sdf = spark.readStream.schema(schema).parquet(path)
    else:
        sdf = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    agg = sdf.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    name = "q231_snapshot"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name)


def q232_embedding_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level decontamination (the semantic complement of
    q108's 4-gram probe): flag training vectors whose cosine to ANY
    held-out eval vector (vec_id < 50) reaches 0.4 — near-duplicates
    of the eval set that token n-grams cannot catch after paraphrase.
    Eval side broadcasts (small by contract, like every query batch in
    similarity.py); one corpus scan, max-similarity aggregate per
    train vector."""
    emb = _t(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") < 50).select(
        F.col("embedding").cast("array<double>").alias("__ev")
    )
    tr = emb.filter(F.col("vec_id") >= 50).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("__tv")
    )
    sims = tr.crossJoin(F.broadcast(ev)).select(
        "vec_id",
        F.round(similarity.cosine(F.col("__tv"), F.col("__ev")), 4).alias(
            "sim"
        ),
    )
    per_train = sims.groupBy("vec_id").agg(F.max("sim").alias("max_sim"))
    return per_train.agg(
        F.count(F.lit(1)).alias("n_train"),
        F.sum(F.when(F.col("max_sim") >= 0.4, 1).otherwise(0)).alias(
            "n_flagged"
        ),
        F.round(F.max("max_sim"), 4).alias("max_sim"),
    )


def q233_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov: D = max |ECDF_a − ECDF_b|
    over order totals of URGENT vs LOW priority orders, with the
    classical alpha=0.05 rejection bound 1.358·sqrt((n+m)/(n·m)) — the
    distribution-shape drift test that PSI's fixed bins can miss.
    Distinct-value running counts (integer-exact), one sort-shuffle of
    the value dimension, scalars broadcast."""
    orders = _t(spark, sf_dir, "orders")
    tagged = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.col("o_totalprice").alias("v"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("is_a"),
    )
    per_v = tagged.groupBy("v").agg(
        F.sum("is_a").alias("na_v"),
        F.sum(1 - F.col("is_a")).alias("nb_v"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tot = tagged.agg(
        F.sum("is_a").alias("n_a"),
        F.sum(1 - F.col("is_a")).alias("n_b"),
    )
    cum = per_v.select(
        F.sum("na_v").over(w).alias("ca"), F.sum("nb_v").over(w).alias("cb")
    ).crossJoin(F.broadcast(tot))
    return cum.agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        F.round(
            F.max(
                F.abs(
                    F.col("ca") / F.col("n_a") - F.col("cb") / F.col("n_b")
                )
            ),
            4,
        ).alias("ks_d"),
        F.round(
            F.lit(1.358)
            * F.sqrt(
                (F.first("n_a") + F.first("n_b"))
                / (F.first("n_a").cast("double") * F.first("n_b"))
            ),
            4,
        ).alias("crit_05"),
        (
            F.max(
                F.abs(
                    F.col("ca") / F.col("n_a") - F.col("cb") / F.col("n_b")
                )
            )
            > F.lit(1.358)
            * F.sqrt(
                (F.first("n_a") + F.first("n_b"))
                / (F.first("n_a").cast("double") * F.first("n_b"))
            )
        ).alias("reject_h0"),
    )


def q234_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (KS's location-shift companion,
    q233): URGENT vs LOW order totals.  Average ranks computed WITHOUT
    a per-row sort: per distinct value, avg_rank = cum_before +
    (n_v + 1)/2, so R_a = sum(na_v * avg_rank) — integer-exact group
    arithmetic on the value dimension, ties handled correctly by
    construction.  Emits U, the normal-approximation z (no tie
    correction — documented; prices are effectively distinct), and the
    |z| > 1.96 verdict."""
    orders = _t(spark, sf_dir, "orders")
    tagged = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.col("o_totalprice").alias("v"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("is_a"),
    )
    per_v = tagged.groupBy("v").agg(
        F.sum("is_a").alias("na_v"),
        F.count(F.lit(1)).alias("n_v"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_v.select(
        "na_v",
        (
            F.coalesce(F.sum("n_v").over(w), F.lit(0))
            + (F.col("n_v") + 1) / 2.0
        ).alias("avg_rank"),
    )
    tot = tagged.agg(
        F.sum("is_a").alias("n_a"),
        F.sum(1 - F.col("is_a")).alias("n_b"),
    )
    stats = ranked.agg(
        F.sum(F.col("na_v") * F.col("avg_rank")).alias("r_a")
    ).crossJoin(F.broadcast(tot))
    u = F.col("r_a") - F.col("n_a") * (F.col("n_a") + 1) / 2.0
    mu = F.col("n_a") * F.col("n_b") / 2.0
    sigma = F.sqrt(
        F.col("n_a")
        * F.col("n_b")
        * (F.col("n_a") + F.col("n_b") + 1)
        / 12.0
    )
    z = (u - mu) / sigma
    return stats.select(
        "n_a",
        "n_b",
        F.round(u, 2).alias("u_stat"),
        F.round(z, 4).alias("z"),
        (F.abs(z) > 1.96).alias("reject_h0"),
    )


def q235_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration per nation: sum of squared
    customer revenue shares (x10000, the antitrust scale) — how
    dominated each nation's order book is by its largest customers
    (complements q152's Gini).  Two stacked aggregates on one key
    chain; shares squared map-side."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    per_cust = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    tot = per_cust.groupBy("c_nationkey").agg(F.sum("rev").alias("tot"))
    return (
        per_cust.join(F.broadcast(tot), "c_nationkey")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                F.sum(F.pow(F.col("rev") / F.col("tot"), 2)) * 10000, 2
            ).alias("hhi"),
        )
    )


def q236_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index per event type: average daily
    volume on each weekday divided by the type's overall daily average
    — the multiplicative profile a forecast or anomaly monitor divides
    out before comparing days.  Daily counts reduce map-side; the
    index join is a 5x7-row broadcast."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.to_date("ts").alias("d"),
        F.dayofweek("ts").alias("dow"),
    )
    daily = ev.groupBy("event_type", "d", "dow").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_dow = daily.groupBy("event_type", "dow").agg(
        F.avg("n").alias("dow_avg")
    )
    overall = daily.groupBy("event_type").agg(F.avg("n").alias("all_avg"))
    return per_dow.join(F.broadcast(overall), "event_type").select(
        "event_type",
        "dow",
        F.round("dow_avg", 4).alias("dow_avg"),
        F.round(F.col("dow_avg") / F.col("all_avg"), 4).alias(
            "seasonality_index"
        ),
    )


def q237_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level anti-entropy (q209 sharpened for repair): the
    same row digest, XOR-folded PER ORDER-MONTH — two replicas compare
    ~80 digest rows and re-sync only the months that differ instead of
    re-shipping the table.  Digest arithmetic identical to q209's, so
    the month digests XOR together to the table digest."""
    from pr2_transformation_spark.functions.dedup import md5_long

    orders = _t(spark, sf_dir, "orders")
    row = F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("<NULL>"))
            for c in [
                "o_orderkey",
                "o_custkey",
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            ]
        ],
    )
    return (
        orders.select(
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .alias("month"),
            md5_long(row).alias("h"),
        )
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor("h").alias("xor_digest"),
        )
    )


def q238_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: customers cohorted by first-order year, then
    cumulative revenue per customer tracked by order-age (years since
    first order) — the lifetime-value ramp underneath q109's retention
    grid.  First-order frame joins back broadcast-small; running sum
    over the (cohort, age) aggregate only."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", F.year("o_orderdate").alias("yr")
    )
    first = orders.groupBy("o_custkey").agg(F.min("yr").alias("cohort"))
    aged = orders.join(first, "o_custkey").select(
        "cohort", (F.col("yr") - F.col("cohort")).alias("age"), "o_totalprice"
    )
    cohort_sizes = first.groupBy("cohort").agg(
        F.countDistinct("o_custkey").alias("n_cust")
    )
    per_age = aged.groupBy("cohort", "age").agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.partitionBy("cohort").orderBy("age").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per_age.select(
            "cohort", "age", F.sum("rev").over(w).alias("cum_rev")
        )
        .join(F.broadcast(cohort_sizes), "cohort")
        .select(
            "cohort",
            "age",
            F.round(F.col("cum_rev") / F.col("n_cust"), 2).alias(
                "ltv_per_customer"
            ),
            "n_cust",
        )
    )


def q239_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot matching by CUMULATIVE-INTERVAL INTERSECTION — the
    running-total trick that turns an inherently sequential allocation
    into one declarative join: per part (deterministic 1-in-97 subset),
    returned units ('R' lines, the restock stream) are consumed FIFO by
    accepted demand ('A' lines); each stream gets cumulative [prev,cum)
    ranges ordered by (shipdate, orderkey, linenumber), and
    allocated = max(0, min(ends) − max(starts)) per overlapping pair.
    No loops, no recursion, no state — two windows and a range join
    whose fan-out is bounded by true overlap."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_partkey") % 97 == 0
    )

    def stream(flag, prefix):
        w = (
            Window.partitionBy("l_partkey")
            .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return (
            li.filter(F.col("l_returnflag") == flag)
            .select(
                "l_partkey",
                F.col("l_orderkey").alias(f"{prefix}_order"),
                F.col("l_linenumber").alias(f"{prefix}_line"),
                F.col("l_quantity").alias(f"{prefix}_qty"),
                F.sum("l_quantity").over(w).alias(f"{prefix}_cum"),
            )
            .withColumn(
                f"{prefix}_prev", F.col(f"{prefix}_cum") - F.col(f"{prefix}_qty")
            )
        )

    supply = stream("R", "s")
    demand = stream("A", "d")
    alloc = (
        supply.join(demand, "l_partkey")
        .select(
            "l_partkey",
            "s_order",
            "s_line",
            "d_order",
            "d_line",
            (
                F.least(F.col("s_cum"), F.col("d_cum"))
                - F.greatest(F.col("s_prev"), F.col("d_prev"))
            ).alias("allocated"),
        )
        .filter(F.col("allocated") > 0)
    )
    return alloc.select(
        "l_partkey",
        "s_order",
        "s_line",
        "d_order",
        "d_line",
        F.round("allocated", 2).alias("allocated"),
    )


def q240_attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-model attribution in ONE pass (extends q172's single
    last-touch model): every purchase's value is credited to the user's
    prior click/view touches under first-touch, last-touch, AND linear
    (1/n) models simultaneously — the side-by-side that shows how much
    'campaign performance' is a modeling choice.  Touch-purchase pairs
    fan out per user; per-purchase touch counts and min/max touch times
    come from one window pass."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_type",
        "value",
        F.unix_timestamp("ts").alias("t"),
        F.concat(
            F.lit("camp_"),
            (
                F.get_json_object("props", "$.k").cast("bigint") % 4
            ).cast("string"),
        ).alias("camp"),
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", F.col("t").alias("tt"), "camp"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("t").alias("pt"), F.col("value").alias("rev")
    )
    pairs = purchases.join(touches, "user_id").filter(
        F.col("tt") <= F.col("pt")
    )
    w = Window.partitionBy("user_id", "pt")
    annotated = pairs.select(
        "camp",
        "rev",
        "tt",
        F.count(F.lit(1)).over(w).alias("n_touch"),
        F.min("tt").over(w).alias("t_first"),
        F.max("tt").over(w).alias("t_last"),
    )
    return annotated.groupBy("camp").agg(
        F.round(
            F.sum(
                F.when(F.col("tt") == F.col("t_first"), F.col("rev"))
                .otherwise(0.0)
            ),
            2,
        ).alias("first_touch_rev"),
        F.round(
            F.sum(
                F.when(F.col("tt") == F.col("t_last"), F.col("rev"))
                .otherwise(0.0)
            ),
            2,
        ).alias("last_touch_rev"),
        F.round(F.sum(F.col("rev") / F.col("n_touch")), 2).alias(
            "linear_rev"
        ),
    )


def q241_asof_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q39's backward as-of computed through ``cogroup().applyInPandas``
    (per-user pandas merge_asof) instead of the union+window trick —
    the co-grouped map API graded under the SAME native DuckDB ASOF
    oracle, proving the two implementations and the oracle agree
    three ways."""
    from pr2_transformation_spark.operators.joins import asof_join_cogrouped

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("t")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.unix_timestamp("ts").alias("t"),
        F.col("value").alias("last_view_value"),
    )
    out = asof_join_cogrouped(
        clicks, views, ["user_id"], "t", ["last_view_value"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("t").alias("ts_epoch"),
        F.round(F.col("last_view_value"), 2).alias("last_view_value"),
    )


def q242_portable_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom filter (k=4 salted md5 hashes into 4096 bits,
    plain set-bit table — completes the CMS/HLL portable-sketch trio):
    built over customer keys, probed with every key plus its absent
    +10M shadow.  The oracle replays EVERY bit position, so the graded
    facts are exact: zero false negatives by construction, and the
    actual (deterministic) false-positive count on the absent probes."""
    from pr2_transformation_spark.functions import sketches as sk

    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    bits = sk.bloom_bits_table(cust, "c_custkey", k=4, m=4096, hasher="md5")
    probes = cust.select(
        F.col("c_custkey").alias("key"), F.lit(True).alias("present")
    ).unionByName(
        cust.select(
            (F.col("c_custkey") + 10_000_000).alias("key"),
            F.lit(False).alias("present"),
        )
    )
    checked = sk.bloom_contains(
        bits, probes, "key", k=4, m=4096, hasher="md5"
    )
    return checked.groupBy("present").agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.when(F.col("maybe_present"), 1).otherwise(0)).alias(
            "n_maybe_present"
        ),
        (
            F.sum(
                F.when(
                    F.col("present") & ~F.col("maybe_present"), 1
                ).otherwise(0)
            )
            == 0
        ).alias("no_false_negatives"),
    )


def q243_portable_hll_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q180's rolling-distinct pattern rebuilt on the PORTABLE HLL so the
    whole thing is hash-graded: per-day md5 register tables, trailing-
    3-day merge as a range window MAX per register (sketch merge IS
    max), harmonic estimate + linear-counting correction per day, and
    the 20% contract flag — every register and every estimate replayed
    bit-for-bit by DuckDB, which q180's opaque JVM sketch cannot offer.
    Raw events never re-shuffle across windows; only 256 registers per
    day move."""
    from pr2_transformation_spark.functions.dedup import md5_long

    m, width = 256, 52
    ev = _events(spark, sf_dir).select(
        F.to_date("ts").alias("d"),
        md5_long(F.col("user_id").cast("string")).alias("h"),
    )
    regs = (
        ev.select(
            "d",
            F.col("h").bitwiseAND(F.lit(m - 1)).alias("bucket"),
            F.when(F.shiftright("h", 8) == 0, F.lit(width + 1))
            .otherwise(
                F.instr(F.lpad(F.bin(F.shiftright("h", 8)), width, "0"), "1")
            )
            .cast("int")
            .alias("rho"),
        )
        .groupBy("d", "bucket")
        .agg(F.max("rho").alias("rho_max"))
    )
    # densify the (day x bucket) grid BEFORE the rolling merge: a bucket
    # seen on day d-1 but not day d must still reach day d's merged
    # sketch, and only an explicit row per (day, bucket) lets the range
    # window carry it
    days = ev.select("d").distinct()
    grid = days.crossJoin(
        spark.range(m).select(F.col("id").cast("int").alias("bucket"))
    )
    g = grid.join(regs, ["d", "bucket"], "left")
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.unix_date("d"))
        .rangeBetween(-2, 0)
    )
    merged = g.select(
        "d",
        "bucket",
        F.coalesce(F.max("rho_max").over(w), F.lit(0)).alias("rho"),
    )
    per_day = merged.groupBy("d").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("z"),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).alias("zeros"),
    )
    alpha_m2 = 0.7213 / (1.0 + 1.079 / m) * m * m
    raw = F.lit(alpha_m2) / F.col("z")
    est = F.when(
        (raw <= 2.5 * m) & (F.col("zeros") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros")),
    ).otherwise(raw)
    # exact trailing-3-day distinct for the contract flag
    exact = (
        days.alias("a")
        .join(
            ev.select(F.col("d").alias("d2"), "h").distinct().alias("b"),
            (F.unix_date(F.col("d2")) >= F.unix_date(F.col("a.d")) - 2)
            & (F.unix_date(F.col("d2")) <= F.unix_date(F.col("a.d"))),
        )
        .groupBy(F.col("a.d").alias("d"))
        .agg(F.countDistinct("h").alias("n_exact"))
    )
    return (
        per_day.select("d", est.alias("est"))
        .join(exact, "d")
        .select(
            "d",
            F.round("est", 2).alias("estimate"),
            "n_exact",
            (
                F.abs(F.col("est") - F.col("n_exact"))
                <= 0.2 * F.col("n_exact")
            ).alias("within_20pct"),
        )
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001 (driver smoke-checks rows > 0)."""
    return q01_pricing_summary(spark, DEFAULT_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": q01_pricing_summary,
        "q02_projection_rename_coalesce": q02_projection_rename_coalesce,
        "q03_case_recode": q03_case_recode,
        "q04_regex_extract": q04_regex_extract,
        "q05_guarded_cast": q05_guarded_cast,
        "q06_merge_versions": q06_merge_versions,
        "q07_profile_binary": q07_profile_binary,
        "q08_profile_false_array": q08_profile_false_array,
        "q09_sensitive_projection": q09_sensitive_projection,
        "q10_star_join_revenue": q10_star_join_revenue,
        "q11_window_topk": q11_window_topk,
        "q12_unwrap_singleton": q12_unwrap_singleton,
        "q13_events_tumbling": q13_events_tumbling,
        "q14_sessionize": q14_sessionize,
        "q15_json_extract": q15_json_extract,
        "q16_dedup_exact": q16_dedup_exact,
        "q17_text_stats": q17_text_stats,
        "q18_lang_id": q18_lang_id,
        "q19_fingerprint": q19_fingerprint,
        "q20_ann_bruteforce": q20_ann_bruteforce,
        "q21_ngram_jaccard": q21_ngram_jaccard,
        "q22_minhash_lsh": q22_minhash_lsh,
        "q23_simhash": q23_simhash,
        "q26_clean_columns_pipeline": q26_clean_columns_pipeline,
        "q27_clean_rows_pipeline": q27_clean_rows_pipeline,
        "q28_merge_three_versions": q28_merge_three_versions,
        "q29_rollup": q29_rollup,
        "q30_set_ops": q30_set_ops,
        "q31_sliding_window": q31_sliding_window,
        "q32_session_window_native": q32_session_window_native,
        "q33_multimodal_features": q33_multimodal_features,
        "q34_bpe_tokens": q34_bpe_tokens,
        "q36_duplicate_stats": q36_duplicate_stats,
        "q37_table_profile": q37_table_profile,
        "q38_quality_profile": q38_quality_profile,
        "q39_asof_join": q39_asof_join,
        "q40_frame_sample": q40_frame_sample,
        "q41_pivot": q41_pivot,
        "q42_word_count": q42_word_count,
        "q43_percentiles": q43_percentiles,
        "q44_time_features": q44_time_features,
        "q45_stats": q45_stats,
        "q46_fuzzy_match": q46_fuzzy_match,
        "q47_cube": q47_cube,
        "q48_zscore": q48_zscore,
        "q49_map_functions": q49_map_functions,
        "q50_date_arithmetic": q50_date_arithmetic,
        "q51_semi_anti_join": q51_semi_anti_join,
        "q52_union_by_name": q52_union_by_name,
        # in the driver's 50-slot graded window (slot 50): the one §2.6
        # operator that previously had only unit-test coverage
        "q127_salted_skew_join": q127_salted_skew_join,
        "q53_string_functions": q53_string_functions,
        "q54_grouping_sets": q54_grouping_sets,
        "q55_rolling_avg": q55_rolling_avg,
        "q56_rank_features": q56_rank_features,
        "q57_unpivot": q57_unpivot,
        "q58_array_functions": q58_array_functions,
        "q59_range_band_join": q59_range_band_join,
        "q60_scalar_subquery": q60_scalar_subquery,
        "q61_histogram": q61_histogram,
        "q62_quality_filter": q62_quality_filter,
        "q63_connected_components": q63_connected_components,
        "q65_median_mode": q65_median_mode,
        "q66_sorted_list_agg": q66_sorted_list_agg,
        "q67_embedding_centroid": q67_embedding_centroid,
        "q68_first_last_window": q68_first_last_window,
        "q69_hash_split": q69_hash_split,
        "q70_sequence_packing": q70_sequence_packing,
        "q71_source_share": q71_source_share,
        "q72_normalized_dedup": q72_normalized_dedup,
        "q73_snapshot_diff": q73_snapshot_diff,
        "q74_validity_intervals": q74_validity_intervals,
        "q75_tfidf": q75_tfidf,
        "q76_bigrams": q76_bigrams,
        "q77_lexical_diversity": q77_lexical_diversity,
        "q78_range_frame": q78_range_frame,
        "q79_stratified_sample": q79_stratified_sample,
        "q80_deterministic_shuffle": q80_deterministic_shuffle,
        "q81_chunking": q81_chunking,
        "q82_reaggregate": q82_reaggregate,
        "q83_funnel": q83_funnel,
        "q84_dq_report": q84_dq_report,
        "q85_zvalue_parity": q85_zvalue_parity,
        "q86_shipping_priority": q86_shipping_priority,
        "q87_local_supplier_volume": q87_local_supplier_volume,
        "q88_late_shipment_priority": q88_late_shipment_priority,
        "q89_top_supplier": q89_top_supplier,
        "q90_concurrent_sessions": q90_concurrent_sessions,
        "q91_event_entropy": q91_event_entropy,
        "q92_markov_transitions": q92_markov_transitions,
        "q93_heavy_hitters": q93_heavy_hitters,
        "q94_near_dup_canonicalize": q94_near_dup_canonicalize,
        "q95_topk_per_group": q95_topk_per_group,
        "q96_gap_islands": q96_gap_islands,
        "q98_weighted_sample": q98_weighted_sample,
        "q99_nation_pair_volume": q99_nation_pair_volume,
        "q100_market_share": q100_market_share,
        "q101_product_profit": q101_product_profit,
        "q102_large_orders": q102_large_orders,
        "q103_sole_late_supplier": q103_sole_late_supplier,
        "q104_idle_rich_customers": q104_idle_rich_customers,
        "q105_cheapest_supplier": q105_cheapest_supplier,
        "q106_important_parts": q106_important_parts,
        "q107_repetition_ratio": q107_repetition_ratio,
        "q108_decontamination": q108_decontamination,
        "q109_cohort_retention": q109_cohort_retention,
        "q110_mixture_epochs": q110_mixture_epochs,
        "q111_group_integrity_split": q111_group_integrity_split,
        "q112_token_budget_trim": q112_token_budget_trim,
        "q113_forecast_revenue": q113_forecast_revenue,
        "q114_returned_items": q114_returned_items,
        "q115_priority_shipment_classes": q115_priority_shipment_classes,
        "q116_order_count_distribution": q116_order_count_distribution,
        "q117_promo_revenue": q117_promo_revenue,
        "q118_small_quantity_revenue": q118_small_quantity_revenue,
        "q119_disjunctive_predicate_join": q119_disjunctive_predicate_join,
        "q120_segment_dedup_fraction": q120_segment_dedup_fraction,
        "q121_winnowing_fingerprints": q121_winnowing_fingerprints,
        "q122_semantic_dedup": q122_semantic_dedup,
        "q123_bigram_perplexity": q123_bigram_perplexity,
        "q124_supplier_part_classes": q124_supplier_part_classes,
        "q125_dominant_suppliers": q125_dominant_suppliers,
        "q126_ann_bruteforce_vectorized": q126_ann_bruteforce_vectorized,
        "q128_connected_components_two_phase": q128_connected_components_two_phase,
        "q129_corpus_prep": q129_corpus_prep,
        "q130_segment_dedup_rewrite": q130_segment_dedup_rewrite,
        "q131_chunk_documents": q131_chunk_documents,
        "q132_png_roundtrip_checksums": q132_png_roundtrip_checksums,
        "q133_gif_roundtrip_checksums": q133_gif_roundtrip_checksums,
        "q134_jpeg_roundtrip_checksums": q134_jpeg_roundtrip_checksums,
        "q135_bm25_scores": q135_bm25_scores,
        "q136_vocab_oov_coverage": q136_vocab_oov_coverage,
        "q137_incremental_dedup": q137_incremental_dedup,
        "q138_webp_roundtrip_checksums": q138_webp_roundtrip_checksums,
        "q139_resize_pipeline_checksums": q139_resize_pipeline_checksums,
        "q140_wav_roundtrip_checksums": q140_wav_roundtrip_checksums,
        "q141_audio_features": q141_audio_features,
        "q142_triangle_count": q142_triangle_count,
        "q143_ppmi_bigrams": q143_ppmi_bigrams,
        "q144_kneser_ney_bigrams": q144_kneser_ney_bigrams,
        "q145_pagerank": q145_pagerank,
        "q146_compression_quality": q146_compression_quality,
        "q147_spectral_features": q147_spectral_features,
        "q148_key_skew_report": q148_key_skew_report,
        "q149_histogram": q149_histogram,
        "q150_correlation_matrix": q150_correlation_matrix,
        "q151_mutual_information": q151_mutual_information,
        "q152_scd2_intervals": q152_scd2_intervals,
        "q153_bpe_tokenizer": q153_bpe_tokenizer,
        "q154_grouped_regression": q154_grouped_regression,
        "q155_gini_concentration": q155_gini_concentration,
        "q156_video_roundtrip_checksums": q156_video_roundtrip_checksums,
        "q157_hard_negative_mining": q157_hard_negative_mining,
        "q158_curriculum_buckets": q158_curriculum_buckets,
        "q159_containment_pairs": q159_containment_pairs,
        "q160_html_text_extraction": q160_html_text_extraction,
        "q161_warc_roundtrip_checksums": q161_warc_roundtrip_checksums,
        "q162_url_features": q162_url_features,
        "q163_host_policy_filter": q163_host_policy_filter,
        "q164_funnel_conversion": q164_funnel_conversion,
        "q165_ab_test_welch": q165_ab_test_welch,
        "q166_variant_shred": q166_variant_shred,
        "q167_xml_roundtrip": q167_xml_roundtrip,
        "q168_basket_lift": q168_basket_lift,
        "q169_autocorrelation": q169_autocorrelation,
        "q170_benford_profile": q170_benford_profile,
        "q171_jaro_winkler_linkage": q171_jaro_winkler_linkage,
        "q172_attribution": q172_attribution,
        "q173_winsorize": q173_winsorize,
        "q174_haversine_nearest": q174_haversine_nearest,
        "q175_bfs_distances": q175_bfs_distances,
        "q176_scd2_interval_join": q176_scd2_interval_join,
        "q177_rolling_distinct_users": q177_rolling_distinct_users,
        "q178_stratified_sample": q178_stratified_sample,
        "q179_mad_outliers": q179_mad_outliers,
        "q180_hll_rolling_distinct": q180_hll_rolling_distinct,
        "q181_theta_segment_overlap": q181_theta_segment_overlap,
        "q182_kll_quantile_merge": q182_kll_quantile_merge,
        "q183_url_canonicalize": q183_url_canonicalize,
        "q184_centroid_similarity_matrix": q184_centroid_similarity_matrix,
        "q185_hierarchy_rollup": q185_hierarchy_rollup,
        "q186_decile_revenue_share": q186_decile_revenue_share,
        "q187_resample_ffill": q187_resample_ffill,
        "q188_kaplan_meier": q188_kaplan_meier,
        "q189_column_entropy": q189_column_entropy,
        "q190_mp4_roundtrip_checksums": q190_mp4_roundtrip_checksums,
        "q191_mulaw_roundtrip": q191_mulaw_roundtrip,
        "q192_mp3_metadata_scan": q192_mp3_metadata_scan,
        "q193_ima_adpcm_roundtrip": q193_ima_adpcm_roundtrip,
        "q194_session_paths": q194_session_paths,
        "q195_windowed_funnel": q195_windowed_funnel,
        "q196_dsir_importance": q196_dsir_importance,
        "q197_count_min_heavy_keys": q197_count_min_heavy_keys,
        "q198_weighted_sample": q198_weighted_sample,
        "q199_ann_pq": q199_ann_pq,
        "q200_entity_resolution": q200_entity_resolution,
        "q201_psi_drift": q201_psi_drift,
        "q202_kcenter_coreset": q202_kcenter_coreset,
        "q203_unicode_normalize": q203_unicode_normalize,
        "q204_burst_detection": q204_burst_detection,
        "q205_langid_confusion": q205_langid_confusion,
        "q206_portable_hll": q206_portable_hll,
        "q207_data_contract": q207_data_contract,
        "q208_functional_dependencies": q208_functional_dependencies,
        "q209_table_checksum": q209_table_checksum,
        "q210_incremental_agg": q210_incremental_agg,
        "q211_temperature_sampling": q211_temperature_sampling,
        "q212_readability": q212_readability,
        "q213_cross_source_overlap": q213_cross_source_overlap,
        "q214_decayed_engagement": q214_decayed_engagement,
        "q215_string_length_profile": q215_string_length_profile,
        "q216_wow_regression": q216_wow_regression,
        "q217_pii_density": q217_pii_density,
        "q218_split_leakage_audit": q218_split_leakage_audit,
        "q219_minhash_source_overlap": q219_minhash_source_overlap,
        "q220_rfm_segmentation": q220_rfm_segmentation,
        "q221_degree_tail_estimate": q221_degree_tail_estimate,
        "q222_asof_join_forward": q222_asof_join_forward,
        "q223_zorder_layout_audit": q223_zorder_layout_audit,
        "q224_weighted_median": q224_weighted_median,
        "q225_conversion_latency": q225_conversion_latency,
        "q226_prefix_similarity_join": q226_prefix_similarity_join,
        "q227_rare_label_collapse": q227_rare_label_collapse,
        "q228_cumulative_distinct_users": q228_cumulative_distinct_users,
        "q229_luhn_validation": q229_luhn_validation,
        "q230_referential_integrity": q230_referential_integrity,
        "q231_streaming_counts_graded": q231_streaming_counts_graded,
        "q232_embedding_decontamination": q232_embedding_decontamination,
        "q233_ks_test": q233_ks_test,
        "q234_mann_whitney": q234_mann_whitney,
        "q235_hhi_concentration": q235_hhi_concentration,
        "q236_dow_seasonality": q236_dow_seasonality,
        "q237_partition_checksums": q237_partition_checksums,
        "q238_cohort_ltv": q238_cohort_ltv,
        "q239_fifo_allocation": q239_fifo_allocation,
        "q240_attribution_models": q240_attribution_models,
        "q241_asof_cogrouped": q241_asof_cogrouped,
        "q242_portable_bloom": q242_portable_bloom,
        "q243_portable_hll_rolling": q243_portable_hll_rolling,
        # rows-only queries (no SQL-expressible oracle: recall<1 LSH/IVF,
        # engine-specific sketches) sit last so the driver's graded
        # 50-query window contains only oracle-backed entries.
        "q24_ann_lsh": q24_ann_lsh,
        "q25_embedding_near_dup": q25_embedding_near_dup,
        "q35_ann_ivf": q35_ann_ivf,
        "q64_approx_distinct": q64_approx_distinct,
        "q97_approx_quantiles": q97_approx_quantiles,
    }


#: Portable 60-bit md5 hash (see functions/dedup.py:md5_long) as DuckDB SQL.
_MD5L = "CAST(('0x' || substring(md5({x}), 1, 15)) AS BIGINT)"

#: Affine-permutation constants for the q22 MinHash oracle — the SAME
#: (i, a, b) rows dedup.minhash_signature(hasher="md5") uses in Spark.
_MINHASH_PERMS = ", ".join(
    f"({i}, {a}, {b})"
    for i, (a, b) in enumerate(dedup.minhash_affine_constants(16))
)

#: 32-permutation variant for the q129 pipeline oracle (pipeline uses the
#: near_dup_pairs_minhash defaults: 32 perms, 8 bands).
_MINHASH_PERMS32 = ", ".join(
    f"({i}, {a}, {b})"
    for i, (a, b) in enumerate(dedup.minhash_affine_constants(32))
)

#: 16-bit SimHash bit-vote fold over a per-token hash column ``h`` —
#: the exact arithmetic dedup.simhash(hasher="md5") runs in Spark.
_SIMHASH_FOLD = " + ".join(
    f"(CASE WHEN sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) > 0"
    f" THEN {1 << i} ELSE 0 END)"
    for i in range(16)
)

_EN = "'the','and','of','to','in'"
_DE = "'der','die','das','und','ist'"
_FR = "'le','les','une','est','dans'"
_ES = "'el','los','una','que','por'"




def _clean_unicode_sql(expr: str) -> str:
    """DuckDB replay of textstats.clean_unicode: the SAME literal-character
    patterns, nested regexp_replace with the 'g' flag (Spark's is global
    by default), trim last."""
    from pr2_transformation_spark.functions.textstats import CLEAN_UNICODE_STEPS

    for pat, rep in CLEAN_UNICODE_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return f"trim({expr})"


_Q203_DIRTY = (
    "concat(chr(65279), chr(8220), replace(text, ' ', chr(160)),"
    " chr(8221), chr(8203), chr(8212))"
)

_Q203_SQL = f"""
    WITH d AS (
        SELECT doc_id,
               {_clean_unicode_sql(_Q203_DIRTY)} AS cleaned,
               {_Q203_DIRTY} AS dirty,
               concat('"', {_clean_unicode_sql('text')}, '"-') AS expected
        FROM documents
    )
    SELECT doc_id, md5(cleaned) AS clean_md5,
           cleaned = expected AS recovered,
           length(dirty) - length(cleaned) AS squeezed
    FROM d
"""

def oracle_sql() -> dict[str, str]:
    return {
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q02_projection_rename_coalesce": """
            SELECT p_partkey AS part_key,
                   coalesce(nullif(p_brand, 'Brand#13'), p_type) AS brand_or_type,
                   lower(p_name) AS name_lc,
                   p_size AS size_num
            FROM part
        """,
        "q03_case_recode": """
            SELECT CASE WHEN o_orderstatus = 'F' THEN '353358909'
                        WHEN o_orderstatus = 'O' THEN '104430631'
                        ELSE NULL END AS status_cid,
                   count(*) AS n_orders
            FROM orders GROUP BY 1
        """,
        "q04_regex_extract": """
            SELECT regexp_extract(o_orderpriority, '^([0-9])', 1) AS priority_num,
                   regexp_replace(o_orderpriority, '^[0-9]-', '') AS priority_name,
                   count(*) AS n
            FROM orders
            WHERE regexp_matches(o_orderpriority, '^[0-9]-')
            GROUP BY 1, 2
        """,
        "q05_guarded_cast": """
            WITH d AS (
                SELECT regexp_extract(p_brand, '#([0-9]+)$', 1) AS digits FROM part
            )
            SELECT CASE WHEN regexp_matches(digits, '^[0-9]{1,3}$')
                             AND TRY_CAST(digits AS BIGINT) BETWEEN 0 AND 125
                        THEN TRY_CAST(digits AS BIGINT) ELSE NULL END AS brand_num,
                   count(*) AS n_parts
            FROM d GROUP BY 1
        """,
        "q06_merge_versions": """
            WITH v1 AS (
                SELECT CAST(c_custkey AS VARCHAR) AS Connect_ID,
                       CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_name END AS c_name,
                       c_mktsegment,
                       CAST(c_nationkey AS VARCHAR) AS nat_v1
                FROM customer WHERE c_custkey % 3 != 0
            ), v2 AS (
                SELECT CAST(c_custkey AS VARCHAR) AS Connect_ID,
                       c_name,
                       CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment,
                       CAST(c_nationkey + 100 AS VARCHAR) AS nat_v2
                FROM customer WHERE c_custkey % 2 = 0
            )
            SELECT coalesce(v1.c_mktsegment, v2.c_mktsegment) AS c_mktsegment,
                   coalesce(v1.c_name, v2.c_name) AS c_name,
                   coalesce(v1.Connect_ID, v2.Connect_ID) AS Connect_ID,
                   v1.nat_v1 AS nat_v1,
                   v2.nat_v2 AS nat_v2
            FROM v1 FULL OUTER JOIN v2 ON v1.Connect_ID = v2.Connect_ID
        """,
        "q07_profile_binary": """
            WITH d AS (
                SELECT l_returnflag,
                       CASE WHEN l_linestatus = 'F' THEN '1' ELSE '0' END AS flag01
                FROM lineitem
            )
            SELECT count(*) FILTER (WHERE NOT (l_returnflag = '0' OR l_returnflag = '1'
                                               OR l_returnflag IS NULL OR l_returnflag = '')) = 0
                       AS returnflag_is_binary,
                   count(*) FILTER (WHERE NOT (flag01 = '0' OR flag01 = '1'
                                               OR flag01 IS NULL OR flag01 = '')) = 0
                       AS flag01_is_binary
            FROM d
        """,
        "q08_profile_false_array": """
            WITH d AS (
                SELECT CASE WHEN l_returnflag = 'A' THEN '[]'
                            WHEN l_returnflag = 'N' THEN '[178420302]'
                            ELSE '[958239616]' END AS fa
                FROM lineitem
            )
            SELECT count(DISTINCT fa) AS n_distinct,
                   count(*) FILTER (WHERE fa IS NOT NULL
                                    AND fa NOT IN ('[]', '[178420302]', '[958239616]'))
                       AS n_outside_domain,
                   count(DISTINCT CASE WHEN regexp_matches(fa, '^\\[[0-9]{9}\\]$')
                                       THEN fa END) AS n_bracketed_distinct
            FROM d
        """,
        "q09_sensitive_projection": """
            SELECT c_custkey AS connect_key, c_name AS name, c_nationkey AS nation_key
            FROM customer WHERE c_mktsegment = 'BUILDING'
        """,
        "q10_star_join_revenue": """
            SELECT r_name,
                   round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
                   count(*) AS n_lineitems
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "q11_window_topk": """
            SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_orderpriority
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rank
                FROM orders
            ) WHERE rank <= 3
        """,
        "q12_unwrap_singleton": """
            WITH d AS (
                SELECT CASE WHEN l_returnflag = 'A' THEN '[]'
                            WHEN l_returnflag = 'N' THEN '[178420302]'
                            ELSE '[958239616]' END AS fa
                FROM lineitem
            ), u AS (
                SELECT CASE WHEN fa = '[]' THEN NULL
                            WHEN regexp_matches(fa, '\\[[0-9]{9}\\]')
                                THEN regexp_replace(fa, '\\[([0-9]{9})\\]', '\\1')
                            WHEN fa IS NULL THEN NULL
                            ELSE CAST(NULL AS VARCHAR) END AS unwrapped
                FROM d
            )
            SELECT unwrapped, count(*) AS n FROM u GROUP BY unwrapped
        """,
        "q13_events_tumbling": """
            SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS window_start,
                   event_type,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "q14_sessionize": """
            WITH g AS (
                SELECT user_id,
                       CASE WHEN lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w IS NULL
                                 OR CAST(floor(epoch(ts)) AS BIGINT)
                                    - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 1800
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            )
            SELECT user_id,
                   CAST(sum(new_session) AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM g GROUP BY user_id
        """,
        "q15_json_extract": """
            SELECT json_extract_string(props, '$.k') AS k,
                   count(*) AS n,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1
        """,
        "q16_dedup_exact": """
            SELECT source, min(doc_id) AS keep_id FROM documents GROUP BY source
        """,
        "q17_text_stats": """
            SELECT doc_id,
                   array_length(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
                   length(text) AS n_chars_c,
                   length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct,
                   round(
                       len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                       t -> t IN ('the','and','of','to','in')))
                       / greatest(array_length(regexp_split_to_array(trim(text), '\\s+')), 1),
                       4) AS stopword_ratio
            FROM documents
        """,
        "q18_lang_id": f"""
            WITH c AS (
                SELECT len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                       t -> t IN ({_EN}))) AS en,
                       len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                       t -> t IN ({_DE}))) AS de,
                       len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                       t -> t IN ({_FR}))) AS fr,
                       len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                       t -> t IN ({_ES}))) AS es
                FROM documents
            ), g AS (
                SELECT CASE WHEN greatest(en, de, fr, es) = 0 THEN 'und'
                            WHEN en = greatest(en, de, fr, es) THEN 'en'
                            WHEN de = greatest(en, de, fr, es) THEN 'de'
                            WHEN fr = greatest(en, de, fr, es) THEN 'fr'
                            ELSE 'es' END AS lang_guess
                FROM c
            )
            SELECT lang_guess, count(*) AS n_docs FROM g GROUP BY lang_guess
        """,
        "q19_fingerprint": """
            SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
            FROM documents
        """,
        "q20_ann_bruteforce": """
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                FROM embeddings WHERE vec_id < 10
            ), c AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
                FROM embeddings WHERE vec_id >= 10
            ), scored AS (
                SELECT q.query_id, c.vec_id,
                       round(list_cosine_similarity(q.qv, c.cv), 4) + 0 AS score
                FROM q CROSS JOIN c
            )
            SELECT query_id, vec_id, score, rank FROM (
                SELECT query_id, vec_id, score,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, vec_id) AS rank
                FROM scored
            ) WHERE rank <= 5
        """,
        "q21_ngram_jaccard": """
            WITH toks AS (
                SELECT doc_id, lang, source,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                FROM documents
            ), sh AS (
                SELECT doc_id, lang, source,
                       list_distinct(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) AS s
                FROM toks
            ), e AS (
                SELECT doc_id, lang, source, len(s) AS sz, unnest(s) AS g FROM sh
            ), inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       a.sz AS sz_a, b.sz AS sz_b, count(*) AS n_common
                FROM e a JOIN e b
                  ON a.g = b.g AND a.doc_id < b.doc_id
                 AND a.lang = b.lang AND a.source = b.source
                GROUP BY 1, 2, 3, 4
            )
            SELECT id_a, id_b,
                   round(n_common / (sz_a + sz_b - n_common), 4) AS jaccard
            FROM inter
            WHERE n_common / (sz_a + sz_b - n_common) >= 0.01
        """,
        # q22/q23 run their md5 hasher mode (dedup.md5_long) so DuckDB can
        # replay the signature arithmetic bit-for-bit.  q24/q25: recall<1
        # LSH pipelines — legitimately rows-only (recall-floor tests in
        # tests/test_ext_ops.py).
        "q22_minhash_lsh": f"""
            WITH toks AS (
                SELECT doc_id,
                       string_split_regex(lower(trim(text)), '\\s+') AS t
                FROM documents
            ), sh AS (
                SELECT doc_id,
                       list_distinct(list_transform(range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS s
                FROM toks
            ), hashed AS (
                SELECT doc_id, ({_MD5L.format(x="u.g")}) % 2147483647 AS h
                FROM sh, UNNEST(sh.s) AS u(g)
            ), sig AS (
                SELECT doc_id, p.i AS perm,
                       min((p.a * hashed.h + p.b) % 2147483647) AS m
                FROM hashed, (VALUES {_MINHASH_PERMS}) p(i, a, b)
                GROUP BY doc_id, p.i
            ), sigarr AS (
                SELECT doc_id, list(m ORDER BY perm) AS sig
                FROM sig GROUP BY doc_id
            ), banded AS (
                SELECT doc_id, bb.b AS band,
                       md5(concat_ws('|',
                           CAST(sig[bb.b * 4 + 1] AS VARCHAR),
                           CAST(sig[bb.b * 4 + 2] AS VARCHAR),
                           CAST(sig[bb.b * 4 + 3] AS VARCHAR),
                           CAST(sig[bb.b * 4 + 4] AS VARCHAR))) AS bucket
                FROM sigarr, (SELECT unnest(range(4)) AS b) bb
            ), pairs AS (
                SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
                FROM banded a
                JOIN banded c
                  ON a.band = c.band AND a.bucket = c.bucket
                 AND a.doc_id < c.doc_id
            ), jac AS (
                SELECT p.id_a, p.id_b,
                       round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                             / len(list_distinct(list_concat(sa.s, sb.s))),
                             4) AS jaccard
                FROM pairs p
                JOIN sh sa ON sa.doc_id = p.id_a
                JOIN sh sb ON sb.doc_id = p.id_b
            )
            SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.2
        """,
        "q23_simhash": f"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(list_distinct(
                           string_split_regex(lower(trim(text)), '\\s+'))) AS tok
                FROM documents
            ), h AS (
                SELECT doc_id, {_MD5L.format(x="tok")} AS h FROM toks
            )
            SELECT doc_id, CAST({_SIMHASH_FOLD} AS BIGINT) AS simhash
            FROM h GROUP BY doc_id
        """,
        "q29_rollup": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                   round(sum(o_totalprice), 2) AS total
            FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        "q30_set_ops": """
            WITH b AS (SELECT c_custkey AS k, c_nationkey AS nk FROM customer
                       WHERE c_mktsegment = 'BUILDING'),
                 l AS (SELECT c_custkey AS k, c_nationkey AS nk FROM customer
                       WHERE c_nationkey < 13),
                 e AS (SELECT c_custkey AS k, c_nationkey AS nk FROM customer
                       WHERE c_custkey % 2 = 0)
            (SELECT * FROM b INTERSECT SELECT * FROM l)
            EXCEPT ALL
            SELECT * FROM e
        """,
        "q31_sliding_window": """
            WITH e AS (
                SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS s1,
                       event_type, value
                FROM events
            ), x AS (
                SELECT unnest([s1, s1 - 300]) AS window_start, event_type, value
                FROM e
            )
            SELECT window_start, event_type,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM x GROUP BY 1, 2
        """,
        "q32_session_window_native": """
            WITH t AS (
                SELECT user_id, epoch_us(ts) AS eu FROM events
            ), g AS (
                SELECT user_id, eu,
                       CASE WHEN lag(eu) OVER w IS NULL
                                 OR eu - lag(eu) OVER w >= 1800000000
                            THEN 1 ELSE 0 END AS ns
                FROM t WINDOW w AS (PARTITION BY user_id ORDER BY eu)
            ), s AS (
                SELECT user_id, eu,
                       sum(ns) OVER (PARTITION BY user_id ORDER BY eu
                                     ROWS UNBOUNDED PRECEDING) AS sid
                FROM g
            )
            SELECT user_id,
                   CAST(floor(min(eu) / 1000000) AS BIGINT) AS session_start,
                   CAST(floor((max(eu) + 1800000000) / 1000000) AS BIGINT) AS session_end,
                   count(*) AS n_events
            FROM s GROUP BY user_id, sid
        """,
        "q33_multimodal_features": """
            SELECT CAST(doc_id AS VARCHAR) AS asset_id,
                   sha256(text) AS sha256,
                   CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                   8 AS feat_dim,
                   substr(sha256(text), 1, 16) AS feature_crc
            FROM documents
        """,
        "q34_bpe_tokens": """
            SELECT doc_id,
                   array_length(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,
                   len(regexp_extract_all(text,
                       '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+'))
                       AS bpe_tokens
            FROM documents
        """,
        # Self-verifying recall oracles (q24/q25/q35): DuckDB cannot replay
        # the LSH tables / IVF quantizer, but it CAN pin everything
        # deterministic — the exact-side cardinalities and the contract
        # that measured recall clears the floor.  The Spark query computes
        # recall against its own in-query exact result; if it ever dips
        # below the floor the boolean flips and the value hash fails.
        "q24_ann_lsh": """
            SELECT CAST(COUNT(*) AS BIGINT) * 5 AS n_exact,
                   CAST(0.7 AS DOUBLE) AS recall_floor,
                   TRUE AS meets_recall_floor
            FROM embeddings WHERE vec_id < 10
        """,
        "q25_embedding_near_dup": """
            WITH e AS (
                SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id < 500
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
                   CAST(0.6 AS DOUBLE) AS recall_floor,
                   TRUE AS meets_recall_floor
            FROM e a JOIN e b ON a.id < b.id
            WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.25
        """,
        "q35_ann_ivf": """
            SELECT CAST(COUNT(*) AS BIGINT) * 5 AS n_exact,
                   CAST(0.5 AS DOUBLE) AS recall_floor,
                   TRUE AS meets_recall_floor
            FROM embeddings WHERE vec_id < 10
        """,
        "q52_union_by_name": """
            (SELECT CAST(c_custkey AS VARCHAR) AS Connect_ID,
                    c_name AS a, NULL AS b
             FROM customer WHERE c_custkey % 2 = 0)
            UNION ALL
            (SELECT CAST(c_custkey AS VARCHAR) AS Connect_ID,
                    NULL AS a, c_mktsegment AS b
             FROM customer WHERE c_custkey % 2 = 1)
        """,
        "q53_string_functions": """
            SELECT concat_ws('-', 'C',
                             lpad(CAST(c_custkey AS VARCHAR), 8, '0'),
                             translate(c_mktsegment, 'AEIOU', 'aeiou'))
                       AS customer_code
            FROM customer
        """,
        "q51_semi_anti_join": """
            WITH w AS (
                SELECT c_mktsegment, count(*) AS n_with_orders
                FROM customer
                WHERE c_custkey IN (SELECT o_custkey FROM orders)
                GROUP BY c_mktsegment
            ), wo AS (
                SELECT c_mktsegment, count(*) AS n_without_orders
                FROM customer
                WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
                GROUP BY c_mktsegment
            )
            SELECT coalesce(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
                   coalesce(w.n_with_orders, 0) AS n_with_orders,
                   coalesce(wo.n_without_orders, 0) AS n_without_orders
            FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment
        """,
        "q49_map_functions": """
            WITH t AS (
                SELECT unnest(json_keys(props)) AS k,
                       json_extract_string(props, '$.' ||
                           unnest(json_keys(props))) AS v
                FROM events
            )
            SELECT k, count(*) AS n,
                   count(DISTINCT v) AS n_distinct_values
            FROM t GROUP BY k
        """,
        "q50_date_arithmetic": """
            SELECT o_orderpriority,
                   round(avg(date_diff('day', CAST(o_orderdate AS DATE),
                                       CAST(l_shipdate AS DATE))), 4)
                       AS avg_days_to_ship,
                   count(*) AS n
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "q48_zscore": """
            SELECT o_orderkey, o_orderpriority,
                   round(CASE WHEN stddev_samp(o_totalprice)
                                   OVER (PARTITION BY o_orderpriority) > 0
                              THEN (o_totalprice
                                    - avg(o_totalprice)
                                      OVER (PARTITION BY o_orderpriority))
                                   / stddev_samp(o_totalprice)
                                     OVER (PARTITION BY o_orderpriority)
                              END, 4) + 0 AS zscore
            FROM orders
        """,
        "q47_cube": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                   round(avg(o_totalprice), 2) AS avg_price
            FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        """,
        "q44_time_features": """
            SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
                   CAST(hour(ts) AS INT) AS hh,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        """,
        "q45_stats": """
            SELECT l_linestatus,
                   round(stddev_samp(l_quantity), 4) AS qty_sd,
                   round(corr(l_quantity, l_extendedprice), 4) + 0 AS qty_price_corr,
                   round(covar_samp(l_quantity, l_discount), 4) + 0 AS qty_disc_cov
            FROM lineitem GROUP BY l_linestatus
        """,
        "q46_fuzzy_match": """
            WITH c AS (
                SELECT c_custkey AS k, c_nationkey AS nk, c_mktsegment AS seg,
                       right(c_name, 4) AS tail
                FROM customer
            )
            SELECT levenshtein(a.tail, b.tail) AS dist, count(*) AS n_pairs
            FROM c a JOIN c b
              ON a.nk = b.nk AND a.seg = b.seg AND a.k < b.k
            WHERE levenshtein(a.tail, b.tail) <= 1
            GROUP BY 1
        """,
        "q41_pivot": """
            SELECT c_mktsegment,
                   round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS total_f,
                   round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS total_o,
                   round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2) AS total_p
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "q42_word_count": r"""
            WITH t AS (
                SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
                FROM documents
            )
            SELECT word, count(*) AS n
            FROM t WHERE word != ''
            GROUP BY word
            ORDER BY n DESC, word
            LIMIT 100
        """,
        "q43_percentiles": """
            SELECT l_returnflag,
                   round(quantile_cont(l_quantity, 0.5), 4) AS qty_p50,
                   round(quantile_cont(l_quantity, 0.9), 4) AS qty_p90,
                   round(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50
            FROM lineitem GROUP BY l_returnflag
        """,
        "q39_asof_join": """
            SELECT l.event_id,
                   l.user_id,
                   CAST(floor(epoch(l.ts)) AS BIGINT) AS ts_epoch,
                   round(r.v2, 2) AS last_view_value
            FROM (SELECT * FROM events WHERE event_type = 'click') l
            ASOF LEFT JOIN (SELECT user_id AS u2, ts AS ts2, value AS v2
                            FROM events WHERE event_type = 'view') r
              ON l.user_id = r.u2 AND l.ts >= r.ts2
        """,
        "q38_quality_profile": r"""
            WITH b AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS toks,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS ltoks,
                       length(text) AS nchars,
                       length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS npunct
                FROM documents
            ), m AS (
                SELECT doc_id,
                       len(toks) AS ntok,
                       list_sum(list_transform(toks, t -> len(t))) AS sumlen,
                       npunct, nchars,
                       len(list_filter(ltoks,
                           t -> t IN ('the','and','of','to','in'))) AS nstop
                FROM b
            )
            SELECT doc_id,
                   round(sumlen / greatest(ntok, 1), 4) AS avg_token_len,
                   round(npunct / greatest(nchars, 1), 4) AS punct_ratio,
                   CAST(floor((0.5 * least(ntok / 100.0, 1.0)
                         + 0.3 * least(round(nstop / greatest(ntok, 1), 4) * 5.0, 1.0)
                         + 0.2 * (1.0 - least(round(npunct / greatest(nchars, 1), 4) * 10.0,
                                              1.0))) * 10000) AS BIGINT) AS quality_x1e4
            FROM m
        """,
        "q37_table_profile": """
            SELECT * FROM (
                SELECT 'o_orderkey' AS column, count(*) AS n_rows,
                       count(*) FILTER (WHERE o_orderkey IS NULL) AS n_nulls,
                       CAST(min(o_orderkey) AS VARCHAR) AS min_value,
                       CAST(max(o_orderkey) AS VARCHAR) AS max_value
                FROM orders
                UNION ALL
                SELECT 'o_orderstatus', count(*),
                       count(*) FILTER (WHERE o_orderstatus IS NULL),
                       CAST(min(o_orderstatus) AS VARCHAR),
                       CAST(max(o_orderstatus) AS VARCHAR)
                FROM orders
                UNION ALL
                SELECT 'o_orderpriority', count(*),
                       count(*) FILTER (WHERE o_orderpriority IS NULL),
                       CAST(min(o_orderpriority) AS VARCHAR),
                       CAST(max(o_orderpriority) AS VARCHAR)
                FROM orders
            )
        """,
        "q36_duplicate_stats": f"""
            SELECT count(*) AS total_rows,
                   count(DISTINCT {_MD5L.format(x="text")}) AS distinct_rows,
                   count(*) - count(DISTINCT {_MD5L.format(x="text")})
                       AS duplicate_rows
            FROM documents
        """,
        "q26_clean_columns_pipeline": """
            WITH survey AS (
                SELECT CAST(c_custkey AS VARCHAR) AS Connect_ID,
                       CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_name END AS src_rename,
                       CASE WHEN c_custkey % 4 = 0 THEN CAST(c_nationkey AS VARCHAR)
                            WHEN c_custkey % 4 = 1 THEN CAST(1900 + c_custkey % 150 AS VARCHAR)
                            WHEN c_custkey % 4 = 2 THEN 'abc'
                            ELSE NULL END AS d317,
                       c_mktsegment AS loop1,
                       'ph-' || CAST(c_custkey % 100 AS VARCHAR) AS loop2,
                       'ad-' || CAST(c_nationkey AS VARCHAR) AS ver1,
                       CASE WHEN c_custkey % 3 = 0 THEN NULL
                            ELSE 'cm-' || CAST(c_custkey % 17 AS VARCHAR) END AS multi_a,
                       'cb-' || CAST(c_custkey % 7 AS VARCHAR) AS multi_b,
                       CASE WHEN c_custkey % 2 = 0 THEN NULL
                            ELSE CAST(c_nationkey AS VARCHAR) END AS state_col,
                       CAST(c_nationkey + 1 AS VARCHAR) AS num_col
                FROM customer
            )
            SELECT Connect_ID,
                   src_rename AS d_150352141_d_623218391,
                   coalesce(state_col, num_col) AS d_934064808,
                   CASE WHEN regexp_matches(d317, '^[0-9]{1,3}$')
                             AND TRY_CAST(d317 AS BIGINT) BETWEEN 0 AND 125
                        THEN TRY_CAST(d317 AS BIGINT) ELSE NULL
                        END AS D_317093647_D_623218391,
                   CASE WHEN regexp_matches(d317, '^[0-9]{4}$')
                        THEN TRY_CAST(d317 AS BIGINT) ELSE NULL
                        END AS D_317093647_D_802622485,
                   loop1 AS d_110349197_1,
                   loop2 AS d_110349197_2,
                   ver1 AS d_285476655_1_v2,
                   coalesce(multi_a, multi_b) AS d_111111111_d_222222222_5,
                   d317 AS d_317093647
            FROM survey
        """,
        "q27_clean_rows_pipeline": """
            WITH f AS (
                SELECT CAST(o_orderkey AS VARCHAR) AS Connect_ID,
                       CASE WHEN o_orderkey % 5 = 0 THEN '1'
                            WHEN o_orderkey % 5 = 1 THEN '0'
                            WHEN o_orderkey % 5 = 2 THEN ''
                            ELSE NULL END AS d1,
                       CASE WHEN o_orderkey % 3 = 0 THEN '[]'
                            WHEN o_orderkey % 3 = 1 THEN '[178420302]'
                            ELSE NULL END AS d2,
                       o_orderpriority AS d_333333333
                FROM orders
            )
            SELECT CASE WHEN d1 = '1' THEN '353358909'
                        WHEN d1 = '0' THEN '104430631'
                        ELSE NULL END AS d_111111111,
                   CASE WHEN d2 = '[]' THEN NULL
                        WHEN regexp_matches(d2, '\\[[0-9]{9}\\]')
                            THEN regexp_replace(d2, '\\[([0-9]{9})\\]', '\\1')
                        WHEN d2 IS NULL THEN NULL
                        ELSE CAST(NULL AS VARCHAR) END AS d_222222222,
                   Connect_ID,
                   d_333333333
            FROM f
        """,
        "q54_grouping_sets": """
            SELECT o_orderstatus, o_orderpriority,
                   CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
                   CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
                   count(*) AS n,
                   round(sum(o_totalprice), 2) AS total
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
        "q55_rolling_avg": """
            WITH daily AS (
                SELECT CAST(o_orderdate AS DATE) AS d,
                       round(sum(o_totalprice), 2) AS rev
                FROM orders GROUP BY 1
            )
            SELECT CAST(d AS VARCHAR) AS day, rev,
                   round(avg(rev) OVER (ORDER BY datediff('day', DATE '1970-01-01', d)
                         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
            FROM daily
        """,
        "q56_rank_features": """
            SELECT o_orderkey, o_orderpriority,
                   ntile(4) OVER w AS quartile,
                   round(percent_rank() OVER w, 4) + 0 AS pct_rank,
                   round(cume_dist() OVER w, 4) AS cume
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice, o_orderkey)
        """,
        "q57_unpivot": """
            WITH m AS (
                SELECT l_returnflag,
                       round(sum(l_quantity), 2) AS qty,
                       round(sum(l_extendedprice), 2) AS price,
                       round(sum(l_discount), 2) AS disc
                FROM lineitem GROUP BY l_returnflag
            )
            SELECT l_returnflag, 'qty' AS measure, qty AS value FROM m
            UNION ALL
            SELECT l_returnflag, 'price', price FROM m
            UNION ALL
            SELECT l_returnflag, 'disc', disc FROM m
        """,
        "q58_array_functions": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            )
            SELECT vec_id,
                   round(sqrt(list_sum(list_transform(v, x -> x * x))), 4) AS l2_norm,
                   len(list_filter(v, x -> x > 0)) AS n_positive,
                   round(list_max(v), 4) + 0 AS max_val
            FROM e
        """,
        "q59_range_band_join": """
            SELECT band, count(*) AS n_orders,
                   round(avg(o_totalprice), 2) AS avg_price
            FROM orders
            JOIN (VALUES (0, 0.0, 100000.0), (1, 100000.0, 200000.0),
                         (2, 200000.0, 300000.0), (3, 300000.0, 1e12))
                 AS b(band, lo, hi)
              ON o_totalprice >= lo AND o_totalprice < hi
            GROUP BY band
        """,
        "q60_scalar_subquery": """
            WITH spend AS (
                SELECT o_custkey, sum(o_totalprice) AS spend
                FROM orders GROUP BY o_custkey
            )
            SELECT c_mktsegment,
                   count(*) AS n_big_spenders,
                   round(sum(spend), 2) AS total_spend
            FROM spend JOIN customer ON o_custkey = c_custkey
            WHERE spend > (SELECT avg(spend) FROM spend)
            GROUP BY c_mktsegment
        """,
        "q61_histogram": """
            SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
                   count(*) AS n,
                   round(min(o_totalprice), 2) AS min_price,
                   round(max(o_totalprice), 2) AS max_price
            FROM orders GROUP BY 1
        """,
        "q62_quality_filter": r"""
            WITH b AS (
                SELECT lang,
                       regexp_split_to_array(trim(text), '\s+') AS toks,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS ltoks,
                       length(text) AS nchars,
                       length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS npunct
                FROM documents
            ), m AS (
                SELECT lang,
                       len(toks) AS ntok,
                       round(list_sum(list_transform(toks, t -> len(t)))
                             / greatest(len(toks), 1), 4) AS avglen,
                       round(npunct / greatest(nchars, 1), 4) AS pr,
                       round(len(list_filter(ltoks,
                                 t -> t IN ('the','and','of','to','in')))
                             / greatest(len(toks), 1), 4) AS sr
                FROM b
            ), f AS (
                SELECT lang,
                       (ntok BETWEEN 5 AND 100000) AS p_tok,
                       (avglen BETWEEN 2.0 AND 12.0) AS p_len,
                       (pr <= 0.20) AS p_punct,
                       (sr >= 0.01) AS p_stop
                FROM m
            )
            SELECT lang,
                   count(*) AS n_docs,
                   count(*) FILTER (WHERE p_tok AND p_len AND p_punct AND p_stop)
                       AS n_keep,
                   CAST(sum(CASE WHEN p_tok THEN 0 ELSE 1 END) AS BIGINT)
                       AS n_fail_tokens,
                   CAST(sum(CASE WHEN p_len THEN 0 ELSE 1 END) AS BIGINT)
                       AS n_fail_avg_len,
                   CAST(sum(CASE WHEN p_punct THEN 0 ELSE 1 END) AS BIGINT)
                       AS n_fail_punct,
                   CAST(sum(CASE WHEN p_stop THEN 0 ELSE 1 END) AS BIGINT)
                       AS n_fail_stopword
            FROM f GROUP BY lang
        """,
        "q63_connected_components": """
            WITH RECURSIVE e AS (
                SELECT c_custkey AS a, c_custkey + 3 AS b
                FROM customer WHERE c_custkey % 7 != 0
            ), sym AS (
                SELECT a, b FROM e UNION SELECT b, a FROM e
            ), v AS (
                SELECT DISTINCT a AS id FROM sym
            ), reach(id, r) AS (
                SELECT id, id FROM v
                UNION
                SELECT s.a, reach.r FROM sym s JOIN reach ON s.b = reach.id
            )
            SELECT id, min(r) AS comp FROM reach GROUP BY id
        """,
        "q129_corpus_prep": rf"""
            WITH RECURSIVE train AS (
                SELECT * FROM documents WHERE doc_id % 97 <> 0
            ), qb AS (
                SELECT doc_id, lang, source, text,
                       regexp_split_to_array(trim(text), '\s+') AS toks,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS ltoks,
                       length(text) AS nchars,
                       length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS npunct
                FROM train
            ), q AS (
                SELECT doc_id, lang, source, text FROM qb
                WHERE (len(toks) BETWEEN 5 AND 100000)
                  AND (round(list_sum(list_transform(toks, t -> len(t)))
                             / greatest(len(toks), 1), 4) BETWEEN 2.0 AND 12.0)
                  AND (round(npunct / greatest(nchars, 1), 4) <= 0.20)
                  AND (round(len(list_filter(ltoks,
                               t -> t IN ('the','and','of','to','in')))
                             / greatest(len(toks), 1), 4) >= 0.01)
            ), ed AS (
                SELECT doc_id, lang, source, text FROM q
                QUALIFY row_number() OVER (
                    PARTITION BY {_MD5L.format(x="text")} ORDER BY doc_id) = 1
            ), toks2 AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(lower(text)), '\s+') AS t
                FROM ed
            ), sh AS (
                SELECT doc_id,
                       list_distinct(list_transform(range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS s
                FROM toks2
            ), hashed AS (
                SELECT doc_id, ({_MD5L.format(x="u.g")}) % 2147483647 AS h
                FROM sh, UNNEST(sh.s) AS u(g)
            ), sig AS (
                SELECT doc_id, p.i AS perm,
                       min((p.a * hashed.h + p.b) % 2147483647) AS m
                FROM hashed, (VALUES {_MINHASH_PERMS32}) p(i, a, b)
                GROUP BY doc_id, p.i
            ), sigarr AS (
                SELECT doc_id, list(m ORDER BY perm) AS sig
                FROM sig GROUP BY doc_id
            ), banded AS (
                SELECT doc_id, bb.b AS band,
                       md5(concat_ws('|',
                           CAST(sig[bb.b * 4 + 1] AS VARCHAR),
                           CAST(sig[bb.b * 4 + 2] AS VARCHAR),
                           CAST(sig[bb.b * 4 + 3] AS VARCHAR),
                           CAST(sig[bb.b * 4 + 4] AS VARCHAR))) AS bucket
                FROM sigarr, (SELECT unnest(range(8)) AS b) bb
            ), cand AS (
                SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
                FROM banded a JOIN banded c
                  ON a.band = c.band AND a.bucket = c.bucket
                 AND a.doc_id < c.doc_id
            ), jac AS (
                SELECT p.id_a, p.id_b
                FROM cand p
                JOIN sh sa ON sa.doc_id = p.id_a
                JOIN sh sb ON sb.doc_id = p.id_b
                WHERE round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                            / len(list_distinct(list_concat(sa.s, sb.s))), 4)
                      >= 0.2
            ), sym AS (
                SELECT id_a AS a, id_b AS b FROM jac
                UNION SELECT id_b, id_a FROM jac
            ), reach(id, r) AS (
                SELECT a, a FROM (SELECT DISTINCT a FROM sym)
                UNION
                SELECT s.a, reach.r FROM sym s JOIN reach ON s.b = reach.id
            ), comp AS (
                SELECT id, min(r) AS comp FROM reach GROUP BY id
            ), nd AS (
                SELECT ed.doc_id, ed.lang, ed.source, ed.text
                FROM ed LEFT JOIN comp ON ed.doc_id = comp.id
                WHERE comp.id IS NULL OR comp.comp = ed.doc_id
            ), ndg AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           generate_series(1, len(t) - 3),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                || ' ' || t[i+3])) AS g4
                FROM (SELECT doc_id,
                             regexp_split_to_array(lower(trim(text)), '\s+') AS t
                      FROM nd)
                WHERE len(t) >= 4
            ), evg AS (
                SELECT DISTINCT unnest(list_distinct(list_transform(
                           generate_series(1, len(t) - 3),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                || ' ' || t[i+3]))) AS gram
                FROM (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS t
                      FROM documents WHERE doc_id % 97 = 0)
                WHERE len(t) >= 4
            ), contaminated AS (
                SELECT DISTINCT doc_id
                FROM (SELECT doc_id, unnest(g4) AS gram FROM ndg) tg
                JOIN evg USING (gram)
            )
            SELECT doc_id, lang, source FROM nd
            WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        """,
        "q130_segment_dedup_rewrite": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), segs AS (
                SELECT doc_id, p.i AS pos,
                       array_to_string(
                           list_slice(t, p.i * 10 + 1, p.i * 10 + 10), ' ') AS seg
                FROM toks,
                     LATERAL (SELECT unnest(generate_series(
                              0, CAST(ceil(len(t) / 10.0) AS INT) - 1)) AS i) p
            ), hashed AS (
                SELECT doc_id, pos, seg,
                       CAST('0x' || substring(md5(seg), 1, 15) AS BIGINT) AS h
                FROM segs
            ), winners AS (
                SELECT doc_id, pos, seg
                FROM (SELECT *, row_number() OVER (
                          PARTITION BY h ORDER BY doc_id, pos) AS rn
                      FROM hashed)
                WHERE rn = 1
            ), totals AS (
                SELECT doc_id, COUNT(*) AS n_segments FROM segs GROUP BY doc_id
            )
            SELECT w.doc_id,
                   CAST(t.n_segments AS INT) AS n_segments,
                   CAST(COUNT(*) AS INT) AS n_kept,
                   string_agg(w.seg, ' ' ORDER BY w.pos) AS text
            FROM winners w JOIN totals t USING (doc_id)
            GROUP BY w.doc_id, t.n_segments
        """,
        "q131_chunk_documents": r"""
            WITH toks AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents
            )
            SELECT doc_id,
                   CAST(p.i / 12 AS INT) AS chunk_id,
                   CAST(p.i AS INT) AS start_token,
                   CAST(least(16, len(t) - p.i) AS INT) AS n_tokens,
                   array_to_string(list_slice(t, p.i + 1, p.i + 16), ' ')
                       AS chunk_text
            FROM toks,
                 LATERAL (SELECT unnest(generate_series(
                          0, greatest(len(t) - 1, 0), 12)) AS i) p
        """,
        "q132_png_roundtrip_checksums": """
            SELECT CAST(doc_id AS VARCHAR) AS asset_id,
                   8 AS width, 8 AS height, 3 AS channels,
                   CAST(SUM((doc_id * 31 + p.i) % 251) AS BIGINT)
                       AS pixel_sum,
                   CAST(SUM((p.i + 1) * ((doc_id * 31 + p.i) % 251)) AS BIGINT)
                       AS pixel_wsum
            FROM documents,
                 LATERAL (SELECT unnest(generate_series(0, 191)) AS i) p
            GROUP BY doc_id
        """,
        "q133_gif_roundtrip_checksums": """
            SELECT CAST(doc_id AS VARCHAR) AS asset_id,
                   8 AS width, 8 AS height, 3 AS channels,
                   CAST(SUM(  (((doc_id + p.i) % 64) * 3) % 256
                            + (((doc_id + p.i) % 64) * 5) % 256
                            + (((doc_id + p.i) % 64) * 7) % 256) AS BIGINT)
                       AS pixel_sum,
                   CAST(SUM(  (3 * p.i + 1) * ((((doc_id + p.i) % 64) * 3) % 256)
                            + (3 * p.i + 2) * ((((doc_id + p.i) % 64) * 5) % 256)
                            + (3 * p.i + 3) * ((((doc_id + p.i) % 64) * 7) % 256))
                        AS BIGINT) AS pixel_wsum
            FROM documents,
                 LATERAL (SELECT unnest(generate_series(0, 63)) AS i) p
            GROUP BY doc_id
            UNION ALL
            SELECT CAST(doc_id AS VARCHAR) || ':b' AS asset_id,
                   8 AS width, 8 AS height, 3 AS channels,
                   CAST(SUM(  (((doc_id + p.i) % 5) * 3) % 256
                            + (((doc_id + p.i) % 5) * 5) % 256
                            + (((doc_id + p.i) % 5) * 7) % 256) AS BIGINT)
                       AS pixel_sum,
                   CAST(SUM(  (3 * p.i + 1) * ((((doc_id + p.i) % 5) * 3) % 256)
                            + (3 * p.i + 2) * ((((doc_id + p.i) % 5) * 5) % 256)
                            + (3 * p.i + 3) * ((((doc_id + p.i) % 5) * 7) % 256))
                        AS BIGINT) AS pixel_wsum
            FROM documents,
                 LATERAL (SELECT unnest(generate_series(0, 63)) AS i) p
            GROUP BY doc_id
        """,
        "q134_jpeg_roundtrip_checksums": """
            SELECT CAST(doc_id AS VARCHAR) AS asset_id,
                   16 AS width, 16 AS height, 1 AS channels,
                   CAST(SUM((doc_id * 7 + 2 * ((p.i // 16) // 8)
                             + ((p.i % 16) // 8)) % 256) AS BIGINT)
                       AS pixel_sum,
                   CAST(SUM((p.i + 1) * ((doc_id * 7 + 2 * ((p.i // 16) // 8)
                             + ((p.i % 16) // 8)) % 256)) AS BIGINT)
                       AS pixel_wsum
            FROM documents,
                 LATERAL (SELECT unnest(generate_series(0, 255)) AS i) p
            GROUP BY doc_id
        """,
        "q135_bm25_scores": r"""
            WITH toks AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents
            ), base AS (
                SELECT doc_id, len(t) AS dl,
                       len(list_filter(t, x -> x = 'table'))  AS tf0,
                       len(list_filter(t, x -> x = 'spark'))  AS tf1,
                       len(list_filter(t, x -> x = 'query'))  AS tf2,
                       len(list_filter(t, x -> x = 'vector')) AS tf3
                FROM toks
            ), stats AS (
                SELECT COUNT(*) AS n, AVG(dl) AS avgdl,
                       SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                       SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                       SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
                       SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3
                FROM base
            )
            SELECT doc_id, CAST(dl AS INT) AS dl,
                   round(
                     ln(1 + (n - df0 + 0.5) / (df0 + 0.5)) * tf0 * 2.2
                       / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                   + ln(1 + (n - df1 + 0.5) / (df1 + 0.5)) * tf1 * 2.2
                       / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                   + ln(1 + (n - df2 + 0.5) / (df2 + 0.5)) * tf2 * 2.2
                       / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                   + ln(1 + (n - df3 + 0.5) / (df3 + 0.5)) * tf3 * 2.2
                       / (tf3 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4)
                   AS score
            FROM base, stats
        """,
        "q136_vocab_oov_coverage": r"""
            WITH tok AS (
                SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+'))
                           AS token
                FROM documents
            ), vocab AS (
                SELECT token
                FROM (SELECT token, COUNT(*) AS n FROM tok GROUP BY token)
                ORDER BY n DESC, token
                LIMIT 10
            )
            SELECT t.doc_id,
                   CAST(COUNT(*) AS INT) AS n_tokens,
                   CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS INT)
                       AS n_oov,
                   round(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                         / CAST(COUNT(*) AS DOUBLE), 4) AS oov_rate
            FROM tok t LEFT JOIN vocab v USING (token)
            GROUP BY t.doc_id
        """,
        "q137_incremental_dedup": """
            WITH hashed AS (
                SELECT doc_id, lang, source,
                       CAST('0x' || substring(md5(text), 1, 15) AS BIGINT) AS h
                FROM documents
            ), seen AS (
                SELECT DISTINCT h FROM hashed WHERE doc_id % 5 = 0
            ), keepers AS (
                SELECT MIN(doc_id) AS doc_id
                FROM hashed
                GROUP BY h
                HAVING h NOT IN (SELECT h FROM seen)
            )
            SELECT d.doc_id, d.lang, d.source
            FROM hashed d JOIN keepers USING (doc_id)
        """,
        "q138_webp_roundtrip_checksums": """
            SELECT CAST(doc_id AS VARCHAR) AS asset_id,
                   8 AS width, 8 AS height, 4 AS channels,
                   CAST(SUM((doc_id * 13 + p.i) % 256) AS BIGINT) AS pixel_sum,
                   CAST(SUM((p.i + 1) * ((doc_id * 13 + p.i) % 256)) AS BIGINT)
                       AS pixel_wsum
            FROM documents,
                 LATERAL (SELECT unnest(generate_series(0, 255)) AS i) p
            GROUP BY doc_id
        """,
        "q139_resize_pipeline_checksums": """
            WITH px AS (
                SELECT doc_id, p.j,
                       (doc_id * 31
                        + ((2 * (p.j // 12) * 8 + 2 * ((p.j % 12) // 3)) * 3
                           + p.j % 3)) % 251 AS v
                FROM documents,
                     LATERAL (SELECT unnest(generate_series(0, 47)) AS j) p
            )
            SELECT CAST(doc_id AS VARCHAR) AS asset_id,
                   4 AS width, 4 AS height,
                   CAST(SUM(v) AS BIGINT) AS rgb_sum,
                   CAST(SUM((j + 1) * v) AS BIGINT) AS rgb_wsum
            FROM px GROUP BY doc_id
        """,
        "q140_wav_roundtrip_checksums": """
            SELECT doc_id,
                   64 AS n_frames, 16000 AS sample_rate_hz,
                   CAST(SUM((doc_id * 7 + p.i * 331) % 65536 - 32768) AS BIGINT)
                       AS sample_sum,
                   CAST(SUM((p.i + 1) *
                            ((doc_id * 7 + p.i * 331) % 65536 - 32768)) AS BIGINT)
                       AS sample_wsum
            FROM documents,
                 LATERAL (SELECT unnest(generate_series(0, 63)) AS i) p
            GROUP BY doc_id
        """,
        "q141_audio_features": """
            WITH s AS (
                SELECT doc_id, p.i,
                       CAST((doc_id * 7 + p.i * 331) % 65536 - 32768 AS DOUBLE)
                           AS v
                FROM documents,
                     LATERAL (SELECT unnest(generate_series(0, 63)) AS i) p
            ), lagged AS (
                SELECT doc_id, v,
                       lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
                FROM s
            )
            SELECT CAST(doc_id AS VARCHAR) AS asset_id,
                   1 AS n_channels, 16000 AS sample_rate_hz, 4 AS duration_ms,
                   printf('%.4f', sqrt(avg(v * v))) AS rms,
                   printf('%.4f',
                          SUM(CASE WHEN pv IS NOT NULL
                                    AND (v < 0) != (pv < 0) THEN 1.0
                              ELSE 0 END) / 63.0) AS zero_cross_rate,
                   CAST(MAX(abs(v)) AS INT) AS peak
            FROM lagged GROUP BY doc_id
        """,
        "q142_triangle_count": """
            WITH raw AS (
                SELECT c_custkey AS s, c_custkey + 1 AS t
                FROM customer WHERE c_custkey % 3 != 0
                UNION ALL
                SELECT c_custkey, c_custkey + 2
                FROM customer WHERE c_custkey % 2 = 0
            ), e AS (
                SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
                FROM raw WHERE s != t
            ), verts AS (
                SELECT COUNT(DISTINCT v) AS n_vertices
                FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
            )
            SELECT CAST(verts.n_vertices AS BIGINT) AS n_vertices,
                   CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
                   CAST((SELECT COUNT(*)
                         FROM e e1 JOIN e e2 ON e1.b = e2.a
                         JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS BIGINT)
                       AS n_triangles
            FROM verts
        """,
        "q143_ppmi_bigrams": r"""
            WITH t AS (
                SELECT regexp_split_to_array(trim(text), '\s+') AS tk
                FROM documents
            ), bi AS (
                SELECT tk[p.i] AS w1, tk[p.i + 1] AS w2
                FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk) - 1))
                                 AS i) p
            ), pairs AS (
                SELECT w1, w2, COUNT(*) AS n_pair FROM bi GROUP BY 1, 2
            ), l AS (
                SELECT w1, SUM(n_pair) AS n_left FROM pairs GROUP BY 1
            ), r AS (
                SELECT w2, SUM(n_pair) AS n_right FROM pairs GROUP BY 1
            ), tot AS (SELECT SUM(n_pair) AS n_total FROM pairs)
            SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair,
                   round(greatest(0.0,
                         ln(n_pair * n_total / (n_left * n_right))), 4) AS ppmi
            FROM pairs JOIN l USING (w1) JOIN r USING (w2), tot
            WHERE n_pair >= 5
        """,
        "q144_kneser_ney_bigrams": r"""
            WITH t AS (
                SELECT regexp_split_to_array(trim(text), '\s+') AS tk
                FROM documents
            ), bi AS (
                SELECT tk[p.i] AS w1, tk[p.i + 1] AS w2
                FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk) - 1))
                                 AS i) p
            ), pairs AS (
                SELECT w1, w2, COUNT(*) AS n_pair FROM bi GROUP BY 1, 2
            ), l AS (
                SELECT w1, SUM(n_pair) AS c_left, COUNT(*) AS n1p_left
                FROM pairs GROUP BY 1
            ), r AS (
                SELECT w2, COUNT(*) AS n1p_right FROM pairs GROUP BY 1
            ), tot AS (SELECT COUNT(*) AS n_bigram_types FROM pairs)
            SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair,
                   round(greatest(n_pair - 0.75, 0.0) / c_left
                         + (0.75 * n1p_left / c_left)
                           * (CAST(n1p_right AS DOUBLE) / n_bigram_types),
                         6) AS p_kn
            FROM pairs JOIN l USING (w1) JOIN r USING (w2), tot
            WHERE n_pair >= 5
        """,
        "q145_pagerank": """
            WITH e AS (
                SELECT c_custkey AS s, c_custkey + 1 AS t
                FROM customer WHERE c_custkey % 3 != 0
                UNION ALL
                SELECT c_custkey, c_custkey + 2
                FROM customer WHERE c_custkey % 2 = 0
            ), v AS (
                SELECT DISTINCT id
                FROM (SELECT s AS id FROM e UNION ALL SELECT t FROM e)
            ), od AS (SELECT s, COUNT(*) AS od FROM e GROUP BY s),
            nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
            r0 AS (SELECT id, 1.0 / nn.n AS rank FROM v, nn),
            c1 AS (SELECT e.t AS id, SUM(r0.rank / od.od) AS c
                   FROM e JOIN od USING (s) JOIN r0 ON r0.id = e.s GROUP BY e.t),
            r1 AS (SELECT v.id,
                          (1.0 - 0.85) / (SELECT n FROM nn)
                          + 0.85 * COALESCE(c1.c, 0) AS rank
                   FROM v LEFT JOIN c1 USING (id)),
            c2 AS (SELECT e.t AS id, SUM(r1.rank / od.od) AS c
                   FROM e JOIN od USING (s) JOIN r1 ON r1.id = e.s GROUP BY e.t),
            r2 AS (SELECT v.id,
                          (1.0 - 0.85) / (SELECT n FROM nn)
                          + 0.85 * COALESCE(c2.c, 0) AS rank
                   FROM v LEFT JOIN c2 USING (id)),
            c3 AS (SELECT e.t AS id, SUM(r2.rank / od.od) AS c
                   FROM e JOIN od USING (s) JOIN r2 ON r2.id = e.s GROUP BY e.t),
            r3 AS (SELECT v.id,
                          (1.0 - 0.85) / (SELECT n FROM nn)
                          + 0.85 * COALESCE(c3.c, 0) AS rank
                   FROM v LEFT JOIN c3 USING (id))
            SELECT id, round(rank, 8) AS rank FROM r3
        """,
        "q146_compression_quality": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(octet_length(encode(text))) AS BIGINT)
                       AS total_bytes,
                   TRUE AS all_ratios_bounded,
                   TRUE AS corpus_compresses
            FROM documents
        """,
        "q147_spectral_features": """
            SELECT CAST(doc_id AS VARCHAR) AS asset_id,
                   1024 AS n_frames,
                   CAST(125 * (1 + doc_id % 30) AS INT) AS dominant_hz,
                   CAST(125 * (1 + doc_id % 30) AS INT) AS spectral_centroid_hz,
                   CAST(125 * (1 + doc_id % 30) AS INT) AS spectral_rolloff_hz
            FROM documents
        """,
        "q148_key_skew_report": """
            WITH counts AS (
                SELECT CAST(l_suppkey AS VARCHAR) AS key,
                       COUNT(*) AS n_rows
                FROM lineitem GROUP BY 1
            ), tot AS (SELECT SUM(n_rows) AS t FROM counts)
            SELECT key, CAST(n_rows AS BIGINT) AS n_rows,
                   round(n_rows / (SELECT t FROM tot), 6) AS share,
                   CAST(row_number() OVER (ORDER BY n_rows DESC, key) AS INT)
                       AS rank
            FROM counts
            ORDER BY n_rows DESC, key LIMIT 10
        """,
        "q149_histogram": """
            SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(round(0.0 + (bucket - 1) * 30000.0, 6) AS DOUBLE)
                       AS lo_edge,
                   CAST(round(0.0 + bucket * 30000.0, 6) AS DOUBLE) AS hi_edge
            FROM (
                SELECT least(greatest(
                           CAST(floor(o_totalprice / 30000.0) AS INT) + 1,
                           1), 20) AS bucket
                FROM orders WHERE o_totalprice IS NOT NULL
            ) GROUP BY bucket
        """,
        "q150_correlation_matrix": """
            SELECT round(corr(l_quantity, l_extendedprice), 6)
                       AS corr_quantity_extendedprice,
                   round(corr(l_quantity, l_discount), 6)
                       AS corr_quantity_discount,
                   round(corr(l_extendedprice, l_discount), 6)
                       AS corr_extendedprice_discount,
                   round(corr(l_extendedprice, l_tax), 6)
                       AS corr_extendedprice_tax
            FROM lineitem
        """,
        "q151_mutual_information": """
            WITH joint AS (
                SELECT l_returnflag, l_linestatus, COUNT(*) AS n_ab
                FROM lineitem GROUP BY 1, 2
            ), ma AS (
                SELECT l_returnflag, SUM(n_ab) AS n_a FROM joint GROUP BY 1
            ), mb AS (
                SELECT l_linestatus, SUM(n_ab) AS n_b FROM joint GROUP BY 1
            ), tot AS (SELECT SUM(n_ab) AS n FROM joint)
            SELECT round(SUM(
                       n_ab / n * ln(n_ab * n / (n_a * n_b))
                   ), 6) AS mutual_information
            FROM joint JOIN ma USING (l_returnflag)
                       JOIN mb USING (l_linestatus), tot
        """,
        "q152_scd2_intervals": """
            SELECT user_id,
                   event_type AS state,
                   CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_epoch,
                   CAST(floor(epoch(lead(ts) OVER w)) AS BIGINT)
                       AS valid_to_epoch,
                   lead(ts) OVER w IS NULL AS is_current
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "q153_bpe_tokenizer": r"""
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
                        AS INT) AS n_words,
                   TRUE AS roundtrip_ok,
                   TRUE AS subword_count_bounded
            FROM documents
        """,
        "q154_grouped_regression": """
            SELECT l_returnflag,
                   round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
                   round(regr_intercept(l_extendedprice, l_quantity), 4)
                       AS intercept,
                   round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem GROUP BY l_returnflag
        """,
        "q155_gini_concentration": """
            WITH rev AS (
                SELECT l_suppkey,
                       round(SUM(l_extendedprice * (1 - l_discount)), 2)
                           AS revenue
                FROM lineitem GROUP BY l_suppkey
            ), ranked AS (
                SELECT revenue,
                       row_number() OVER (ORDER BY revenue, l_suppkey) AS i
                FROM rev
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_suppliers,
                   round(2.0 * SUM(i * revenue) / (COUNT(*) * SUM(revenue))
                         - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
            FROM ranked
        """,
        "q156_video_roundtrip_checksums": """
            SELECT doc_id, 2 AS n_frames, 16 AS width, 16 AS height,
                   CAST(SUM((doc_id * 5 + 101 * (p.i // 256)
                             + 2 * (((p.i % 256) // 16) // 8)
                             + (((p.i % 256) % 16) // 8)) % 256) AS BIGINT)
                       AS pixel_sum,
                   CAST(SUM((p.i + 1) * ((doc_id * 5 + 101 * (p.i // 256)
                             + 2 * (((p.i % 256) // 16) // 8)
                             + (((p.i % 256) % 16) // 8)) % 256)) AS BIGINT)
                       AS pixel_wsum
            FROM documents,
                 LATERAL (SELECT unnest(generate_series(0, 511)) AS i) p
            GROUP BY doc_id
        """,
        "q157_hard_negative_mining": """
            WITH a AS (
                SELECT vec_id AS anchor_id,
                       CAST(embedding AS DOUBLE[]) AS av,
                       label AS anchor_label
                FROM embeddings WHERE vec_id < 10
            ), c AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv,
                       label AS neg_label
                FROM embeddings WHERE vec_id >= 10
            ), scored AS (
                SELECT anchor_id, vec_id, anchor_label, neg_label,
                       round(list_cosine_similarity(av, cv), 4) + 0.0 AS score
                FROM a JOIN c ON anchor_label != neg_label
            )
            SELECT anchor_id, vec_id, anchor_label, neg_label, score,
                   CAST(rnk AS INT) AS rank
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY anchor_id
                      ORDER BY score DESC, vec_id) AS rnk
                  FROM scored)
            WHERE rnk <= 3
        """,
        "q158_curriculum_buckets": r"""
            WITH toks AS (
                SELECT doc_id, text,
                       regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents
            ), feats AS (
                SELECT doc_id,
                       least(len(t) / 100.0, 1.0) AS length_term,
                       least(round(
                           len(list_filter(regexp_split_to_array(
                               trim(lower(text)), '\s+'),
                               x -> x IN ('the','and','of','to','in')))
                           / greatest(len(t), 1)::DOUBLE, 4) * 5.0,
                           1.0) AS stop_term,
                       least(round(
                           length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                           / greatest(length(text), 1)::DOUBLE, 4) * 10.0,
                           1.0) AS punct_term
                FROM toks
            ), scored AS (
                SELECT doc_id,
                       CAST(floor((0.5 * length_term + 0.3 * stop_term
                                   + 0.2 * (1.0 - punct_term)) * 10000)
                            AS BIGINT) AS q10k
                FROM feats
            ), tiered AS (
                SELECT q10k,
                       ntile(4) OVER (ORDER BY q10k DESC, doc_id) AS tier
                FROM scored
            )
            SELECT CAST(tier AS INT) AS tier,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   MIN(q10k) AS min_q10k, MAX(q10k) AS max_q10k
            FROM tiered GROUP BY tier
        """,
        "q159_containment_pairs": r"""
            WITH toks AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(lower(text)), '\s+') AS t
                FROM documents
            ), sh AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           generate_series(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
                FROM toks WHERE len(t) >= 3
            ), expl AS (
                SELECT doc_id, len(s) AS sz, unnest(s) AS gram FROM sh
            ), pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       a.sz AS sz_a, b.sz AS sz_b, COUNT(*) AS n_common
                FROM expl a JOIN expl b
                  ON a.gram = b.gram AND a.doc_id < b.doc_id
                GROUP BY 1, 2, 3, 4
            )
            SELECT id_a, id_b,
                   round(n_common / CAST(sz_a AS DOUBLE), 4) AS containment_a,
                   round(n_common / CAST(sz_b AS DOUBLE), 4) AS containment_b
            FROM pairs
            WHERE round(n_common / CAST(sz_a AS DOUBLE), 4) >= 0.8
               OR round(n_common / CAST(sz_b AS DOUBLE), 4) >= 0.8
        """,
        "q160_html_text_extraction": r"""
            WITH esc AS (
                SELECT doc_id,
                       'Doc ' || CAST(doc_id AS VARCHAR) AS title,
                       source AS heading,
                       replace(replace(replace(replace(replace(
                           text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
                           '"', '&quot;'), chr(39), '&#39;') AS body_esc,
                       text
                FROM documents
            ), page AS (
                SELECT doc_id, title, heading, text,
                       '<html><head><title>' ||
                       replace(replace(replace(replace(replace(
                           title, '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
                           '"', '&quot;'), chr(39), '&#39;') ||
                       '</title><style>p { margin: 0; }</style>' ||
                       '<script type="text/javascript">var tracked = 1 < 2;</script>' ||
                       '</head><body><h1>' ||
                       replace(replace(replace(replace(replace(
                           heading, '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
                           '"', '&quot;'), chr(39), '&#39;') ||
                       '</h1><p>' || replace(body_esc, chr(10), '</p><p>') ||
                       '</p><!-- generated fixture --></body></html>' AS html
                FROM esc
            ), stripped AS (
                SELECT doc_id, title, heading, text, html,
                       regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(regexp_replace(html,
                           '(?s)<script\b[^>]*>.*?</script>', ' ', 'g'),
                           '(?s)<style\b[^>]*>.*?</style>', ' ', 'g'),
                           '(?s)<noscript\b[^>]*>.*?</noscript>', ' ', 'g'),
                           '(?s)<!--.*?-->', ' ', 'g'),
                           '<[^>]+>', ' ', 'g') AS detagged
                FROM page
            ), final AS (
                SELECT doc_id,
                       replace(replace(replace(replace(replace(
                           regexp_extract(html, '(?s)<title[^>]*>(.*?)</title>', 1),
                           '&#39;', chr(39)), '&quot;', '"'), '&gt;', '>'),
                           '&lt;', '<'), '&amp;', '&') AS title_out,
                       trim(regexp_replace(
                           replace(replace(replace(replace(replace(
                               detagged,
                               '&#39;', chr(39)), '&quot;', '"'), '&gt;', '>'),
                               '&lt;', '<'), '&amp;', '&'),
                           '\s+', ' ', 'g')) AS extracted,
                       trim(regexp_replace(
                           title || ' ' || heading || ' ' ||
                           replace(text, chr(10), ' '),
                           '\s+', ' ', 'g')) AS expected
                FROM stripped
            )
            SELECT doc_id, title_out AS title,
                   length(extracted) AS n_chars_extracted,
                   extracted = expected AS matches_expected
            FROM final
        """,
        "q161_warc_roundtrip_checksums": """
            WITH recs AS (
                SELECT CAST(doc_id % 32 AS VARCHAR) AS warc_id,
                       'urn:doc:' || CAST(doc_id AS VARCHAR) AS record_id,
                       md5(text) AS h,
                       octet_length(encode(text)) AS nb
                FROM documents
            )
            SELECT warc_id, count(*) AS n_records, sum(nb) AS payload_bytes,
                   md5(string_agg(h, '' ORDER BY record_id)) AS content_digest
            FROM recs GROUP BY warc_id
        """,
        "q162_url_features": r"""
            WITH u AS (
                SELECT doc_id,
                       (CASE WHEN doc_id % 3 = 0 THEN 'http://' ELSE 'https://' END) ||
                       (CASE WHEN doc_id % 5 = 0 THEN 'crawler:s3cr3t@' ELSE '' END) ||
                       source || '-' || lang || '.Example.NET' ||
                       (CASE WHEN doc_id % 4 = 0 THEN ':8443' ELSE '' END) ||
                       '/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) ||
                       (CASE WHEN doc_id % 2 = 0
                             THEN '?ref=r' || CAST(doc_id % 7 AS VARCHAR)
                             ELSE '' END) ||
                       '#frag' AS url
                FROM documents
            ), h AS (
                SELECT doc_id, url,
                       regexp_replace(regexp_replace(
                           lower(regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1)),
                           '^[^@]*@', ''), ':[0-9]*$', '') AS host,
                       regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
                       regexp_extract(url, '\?([^#]*)', 1) AS query
                FROM u
            )
            SELECT doc_id, url, host,
                   regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain,
                   path, query,
                   len(list_filter(string_split(path, '/'), s -> s != '')) AS depth
            FROM h
        """,
        "q163_host_policy_filter": """
            WITH hosted AS (
                SELECT doc_id,
                       source || '-' || lang || '.example.net' AS host,
                       n_chars
                FROM documents
            ), ranked AS (
                SELECT doc_id, host, n_chars,
                       row_number() OVER (
                           PARTITION BY host
                           ORDER BY n_chars DESC, doc_id) AS host_rank
                FROM hosted
                WHERE host NOT IN ('src0-de.example.net', 'src1-en.example.net')
            )
            SELECT doc_id, host, n_chars, host_rank
            FROM ranked WHERE host_rank <= 3
        """,
        "q164_funnel_conversion": """
            WITH e AS (
                SELECT user_id, event_type,
                       CAST(floor(epoch(ts)) AS BIGINT) AS t
                FROM events
            ), v AS (
                SELECT user_id, min(t) AS t_view
                FROM e WHERE event_type = 'view' GROUP BY 1
            ), c AS (
                SELECT e.user_id, min(e.t) AS t_click,
                       any_value(v.t_view) AS t_view
                FROM e JOIN v USING (user_id)
                WHERE e.event_type = 'click' AND e.t > v.t_view
                GROUP BY 1
            ), p AS (
                SELECT e.user_id, min(e.t) AS t_purchase,
                       any_value(c.t_click) AS t_click
                FROM e JOIN c USING (user_id)
                WHERE e.event_type = 'purchase' AND e.t > c.t_click
                GROUP BY 1
            )
            SELECT '1_view' AS stage, count(*) AS n,
                   CAST(NULL AS DOUBLE) AS avg_delay_sec FROM v
            UNION ALL
            SELECT '2_click', count(*),
                   round(avg(t_click - t_view), 2) FROM c
            UNION ALL
            SELECT '3_purchase', count(*),
                   round(avg(t_purchase - t_click), 2) FROM p
        """,
        "q165_ab_test_welch": """
            WITH pu AS (
                SELECT user_id, sum(value) AS spend
                FROM events WHERE event_type = 'purchase' GROUP BY 1
            ), arms AS (
                SELECT user_id % 2 AS arm, count(*) AS n,
                       avg(spend) AS mean, var_samp(spend) AS var
                FROM pu GROUP BY 1
            ), a AS (
                SELECT n AS n_a, mean AS m_a, var AS v_a FROM arms WHERE arm = 0
            ), b AS (
                SELECT n AS n_b, mean AS m_b, var AS v_b FROM arms WHERE arm = 1
            )
            SELECT n_a, n_b,
                   round(m_a, 4) AS mean_a, round(m_b, 4) AS mean_b,
                   round((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b), 4) AS t_stat,
                   round(pow(v_a / n_a + v_b / n_b, 2) /
                         ((v_a / n_a) * (v_a / n_a) / (n_a - 1)
                          + (v_b / n_b) * (v_b / n_b) / (n_b - 1)), 2) AS welch_df,
                   abs((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b)) > 1.96
                       AS significant_95
            FROM a, b
        """,
        "q166_variant_shred": """
            SELECT event_type AS typ, count(*) AS n,
                   sum(event_id % 100) AS sum_arr1,
                   sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS sum_k
            FROM events GROUP BY 1
        """,
        "q167_xml_roundtrip": """
            SELECT o_orderkey AS orderkey, o_orderstatus AS status,
                   round(o_totalprice, 2) AS totalprice,
                   CAST(o_orderdate AS VARCHAR) AS orderdate,
                   o_orderpriority AS priority
            FROM orders
        """,
        "q168_basket_lift": """
            WITH ob AS (
                SELECT DISTINCT l_orderkey, p_brand
                FROM lineitem JOIN part ON l_partkey = p_partkey
            ), tot AS (
                SELECT count(DISTINCT l_orderkey) AS n_orders FROM lineitem
            ), pairs AS (
                SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
                       count(*) AS pair_orders
                FROM ob a JOIN ob b
                  ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
                GROUP BY 1, 2
            ), marg AS (
                SELECT p_brand, count(*) AS brand_orders FROM ob GROUP BY 1
            )
            SELECT brand_a, brand_b, pair_orders,
                   round(pair_orders / CAST(n_orders AS DOUBLE), 6) AS support,
                   round(pair_orders * CAST(n_orders AS DOUBLE)
                         / (ma.brand_orders * mb.brand_orders), 4) AS lift
            FROM pairs
            CROSS JOIN tot
            JOIN marg ma ON brand_a = ma.p_brand
            JOIN marg mb ON brand_b = mb.p_brand
            WHERE pair_orders >= 50
        """,
        "q169_autocorrelation": """
            WITH daily AS (
                SELECT o_orderdate AS d, sum(o_totalprice) AS x
                FROM orders GROUP BY 1
            ), m AS (
                SELECT avg(x) AS mu, count(*) AS n_days FROM daily
            ), lagged AS (
                SELECT x,
                       lag(x, 1) OVER w AS l1, lag(x, 2) OVER w AS l2,
                       lag(x, 3) OVER w AS l3, lag(x, 4) OVER w AS l4,
                       lag(x, 5) OVER w AS l5, lag(x, 6) OVER w AS l6,
                       lag(x, 7) OVER w AS l7
                FROM daily WINDOW w AS (ORDER BY d)
            )
            SELECT any_value(n_days) AS n_days,
                   round(sum((x - mu) * (l1 - mu)) / sum((x - mu) * (x - mu)), 4) AS acf_1,
                   round(sum((x - mu) * (l2 - mu)) / sum((x - mu) * (x - mu)), 4) AS acf_2,
                   round(sum((x - mu) * (l3 - mu)) / sum((x - mu) * (x - mu)), 4) AS acf_3,
                   round(sum((x - mu) * (l4 - mu)) / sum((x - mu) * (x - mu)), 4) AS acf_4,
                   round(sum((x - mu) * (l5 - mu)) / sum((x - mu) * (x - mu)), 4) AS acf_5,
                   round(sum((x - mu) * (l6 - mu)) / sum((x - mu) * (x - mu)), 4) AS acf_6,
                   round(sum((x - mu) * (l7 - mu)) / sum((x - mu) * (x - mu)), 4) AS acf_7
            FROM lagged CROSS JOIN m
        """,
        "q170_benford_profile": """
            WITH digits AS (
                SELECT CAST(substring(CAST(CAST(floor(o_totalprice * 100 + 0.5)
                           AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
                FROM orders
            ), counts AS (
                SELECT digit, count(*) AS n FROM digits GROUP BY 1
            ), tot AS (
                SELECT count(*) AS total FROM digits
            )
            SELECT digit, n,
                   round(n / CAST(total AS DOUBLE), 6) AS observed_freq,
                   round(log10(1 + 1.0 / digit), 6) AS benford_freq,
                   round(total * (n / CAST(total AS DOUBLE) - log10(1 + 1.0 / digit))
                         * (n / CAST(total AS DOUBLE) - log10(1 + 1.0 / digit))
                         / log10(1 + 1.0 / digit), 4) AS chi2_term
            FROM counts CROSS JOIN tot
        """,
        "q171_jaro_winkler_linkage": """
            WITH names AS (
                SELECT DISTINCT split_part(p_name, ' ', 2) AS block,
                       p_name AS name
                FROM part
            )
            SELECT a.block, a.name AS name_a, b.name AS name_b,
                   round(jaro_winkler_similarity(a.name, b.name), 4) AS jw
            FROM names a JOIN names b
              ON a.block = b.block AND a.name < b.name
            WHERE round(jaro_winkler_similarity(a.name, b.name), 4) >= 0.7
        """,
        "q172_attribution": """
            WITH e AS (
                SELECT user_id, event_id, event_type, value,
                       CAST(floor(epoch(ts)) AS BIGINT) AS t,
                       'camp_' || CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 4
                                       AS VARCHAR) AS camp
                FROM events
            ), lt AS (
                SELECT event_type, value,
                       last_value(CASE WHEN event_type IN ('click', 'view')
                                       THEN camp END IGNORE NULLS)
                           OVER (PARTITION BY user_id ORDER BY t, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS attributed
                FROM e
            )
            SELECT attributed AS campaign, count(*) AS n_purchases,
                   round(sum(value), 2) AS revenue
            FROM lt
            WHERE event_type = 'purchase' AND attributed IS NOT NULL
            GROUP BY 1
        """,
        "q173_winsorize": """
            WITH bounds AS (
                SELECT o_orderpriority,
                       percentile_cont(0.05) WITHIN GROUP (ORDER BY o_totalprice) AS p5,
                       percentile_cont(0.95) WITHIN GROUP (ORDER BY o_totalprice) AS p95
                FROM orders GROUP BY 1
            )
            SELECT o.o_orderpriority, count(*) AS n,
                   round(avg(o_totalprice), 2) AS raw_avg,
                   round(avg(least(greatest(o_totalprice, p5), p95)), 2)
                       AS winsorized_avg,
                   round(any_value(p5), 2) AS p5,
                   round(any_value(p95), 2) AS p95
            FROM orders o JOIN bounds b ON o.o_orderpriority = b.o_orderpriority
            GROUP BY 1
        """,
        "q174_haversine_nearest": """
            WITH c AS (
                SELECT c_custkey,
                       (c_custkey * 37) % 17000 / 100.0 - 85.0 AS c_lat,
                       (c_custkey * 73) % 36000 / 100.0 - 180.0 AS c_lon
                FROM customer
            ), n AS (
                SELECT n_name,
                       ((n_nationkey + 1) * 997) % 17000 / 100.0 - 85.0 AS n_lat,
                       ((n_nationkey + 1) * 1471) % 36000 / 100.0 - 180.0 AS n_lon
                FROM nation
            ), scored AS (
                SELECT c_custkey, n_name,
                       round(2 * 6371.0 * asin(sqrt(
                           pow(sin(radians(n_lat - c_lat) / 2), 2)
                           + cos(radians(c_lat)) * cos(radians(n_lat))
                             * pow(sin(radians(n_lon - c_lon) / 2), 2))), 3)
                           AS dist_km
                FROM c CROSS JOIN n
            ), ranked AS (
                SELECT c_custkey, n_name, dist_km,
                       row_number() OVER (PARTITION BY c_custkey
                                          ORDER BY dist_km, n_name) AS rk
                FROM scored
            )
            SELECT c_custkey, n_name AS nearest_nation, dist_km
            FROM ranked WHERE rk = 1
        """,
        "q175_bfs_distances": """
            WITH e AS (
                SELECT c_custkey AS a, c_custkey + 3 AS b
                FROM customer WHERE c_custkey % 7 != 0
            ), sym AS (
                SELECT a, b FROM e UNION SELECT b, a FROM e
            ), d0 AS (
                SELECT DISTINCT c_custkey AS id FROM customer
                WHERE c_custkey % 997 = 1
            ), d1 AS (
                SELECT DISTINCT s.b AS id FROM sym s JOIN d0 ON s.a = d0.id
                WHERE s.b NOT IN (SELECT id FROM d0)
            ), d2 AS (
                SELECT DISTINCT s.b AS id FROM sym s JOIN d1 ON s.a = d1.id
                WHERE s.b NOT IN (SELECT id FROM d0)
                  AND s.b NOT IN (SELECT id FROM d1)
            ), d3 AS (
                SELECT DISTINCT s.b AS id FROM sym s JOIN d2 ON s.a = d2.id
                WHERE s.b NOT IN (SELECT id FROM d0)
                  AND s.b NOT IN (SELECT id FROM d1)
                  AND s.b NOT IN (SELECT id FROM d2)
            )
            SELECT id, 0 AS dist FROM d0
            UNION ALL SELECT id, 1 FROM d1
            UNION ALL SELECT id, 2 FROM d2
            UNION ALL SELECT id, 3 FROM d3
        """,
        "q176_scd2_interval_join": """
            WITH e AS (
                SELECT user_id, event_id, event_type, value,
                       CAST(floor(epoch(ts)) AS BIGINT) AS t
                FROM events
            ), dim AS (
                SELECT user_id, event_type AS state, t AS valid_from,
                       lead(t) OVER (PARTITION BY user_id
                                     ORDER BY t, event_id) AS valid_to
                FROM e WHERE event_type != 'purchase'
            ), facts AS (
                SELECT user_id, value, t AS pt FROM e
                WHERE event_type = 'purchase'
            )
            SELECT state, count(*) AS n_purchases,
                   round(sum(value), 2) AS revenue
            FROM facts f JOIN dim d
              ON f.user_id = d.user_id
             AND f.pt >= d.valid_from
             AND (f.pt < d.valid_to OR d.valid_to IS NULL)
            GROUP BY 1
        """,
        "q177_rolling_distinct_users": """
            WITH ud AS (
                SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
            ), expl AS (
                SELECT user_id, day + CAST(x AS INTEGER) AS wend
                FROM ud CROSS JOIN generate_series(0, 6) AS t(x)
            ), days AS (
                SELECT DISTINCT day AS wend FROM ud
            )
            SELECT CAST(e.wend AS VARCHAR) AS window_end,
                   count(DISTINCT user_id) AS active_7d
            FROM expl e JOIN days USING (wend)
            GROUP BY 1
        """,
        "q178_stratified_sample": """
            WITH sized AS (
                SELECT c_custkey, c_mktsegment, c_acctbal,
                       row_number() OVER (
                           PARTITION BY c_mktsegment
                           ORDER BY CAST(('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT), c_custkey
                       ) AS rk,
                       count(*) OVER (PARTITION BY c_mktsegment) AS stratum_n
                FROM customer
            ), picked AS (
                SELECT * FROM sized WHERE rk <= ceil(stratum_n * 0.1)
            )
            SELECT c_mktsegment, any_value(stratum_n) AS stratum_n,
                   count(*) AS sampled_n,
                   round(avg(c_acctbal), 2) AS sample_avg_bal,
                   min(c_custkey) AS min_sampled_key
            FROM picked GROUP BY 1
        """,
        "q179_mad_outliers": """
            WITH med AS (
                SELECT o_orderpriority, median(o_totalprice) AS med
                FROM orders GROUP BY 1
            ), dev AS (
                SELECT o.o_orderpriority, any_value(m.med) AS med,
                       median(abs(o_totalprice - m.med)) AS mad
                FROM orders o JOIN med m USING (o_orderpriority)
                GROUP BY 1
            )
            SELECT o.o_orderpriority,
                   round(any_value(d.med), 2) AS median_price,
                   round(any_value(d.mad), 2) AS mad,
                   count(*) AS n,
                   sum(CASE WHEN abs(o_totalprice - d.med) > 3.5 * d.mad
                            THEN 1 ELSE 0 END) AS n_outliers
            FROM orders o JOIN dev d USING (o_orderpriority)
            GROUP BY 1
        """,
        "q180_hll_rolling_distinct": """
            WITH ud AS (
                SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
            ), expl AS (
                SELECT user_id, day + CAST(x AS INTEGER) AS wend
                FROM ud CROSS JOIN generate_series(0, 6) AS t(x)
            ), days AS (
                SELECT DISTINCT day AS wend FROM ud
            )
            SELECT CAST(e.wend AS VARCHAR) AS window_end,
                   count(DISTINCT user_id) AS exact_active_7d,
                   TRUE AS hll_within_5pct
            FROM expl e JOIN days USING (wend)
            GROUP BY 1
        """,
        "q181_theta_segment_overlap": """
            WITH seg AS (
                SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
            ), marg AS (
                SELECT c_mktsegment, count(*) AS seg_nations FROM seg GROUP BY 1
            )
            SELECT a.c_mktsegment AS seg_a, b.c_mktsegment AS seg_b,
                   any_value(m.seg_nations) AS nations_a,
                   count(*) AS overlap_nations
            FROM seg a
            JOIN seg b ON a.c_nationkey = b.c_nationkey
                      AND a.c_mktsegment < b.c_mktsegment
            JOIN marg m ON m.c_mktsegment = a.c_mktsegment
            GROUP BY 1, 2
        """,
        "q182_kll_quantile_merge": """
            SELECT count(*) AS n,
                   round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 2)
                       AS exact_p50,
                   round(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 2)
                       AS exact_p90,
                   TRUE AS kll_p50_within_2pct,
                   TRUE AS kll_p90_within_2pct
            FROM orders
        """,
        "q183_url_canonicalize": r"""
            WITH raw AS (
                SELECT doc_id,
                       'https://WWW.Shop' ||
                       '.Example.COM:443/p/' || CAST(doc_id % 50 AS VARCHAR) ||
                       '?utm_campaign=c' || CAST(doc_id AS VARCHAR) ||
                       '&size=' || CAST(doc_id % 3 AS VARCHAR) ||
                       '&utm_source=feed&ref=tracker#top' AS url
                FROM documents
            ), parts AS (
                SELECT doc_id,
                       lower(regexp_replace(
                           regexp_extract(url, '^(https?://[^/?#]*)', 1),
                           ':443$', '')) AS scheme_host,
                       regexp_replace(regexp_replace(
                           regexp_replace(url, '#.*$', ''),
                           '\?.*$', ''),
                           '^(https?)://([^/]*)', '') AS path,
                       regexp_extract(regexp_replace(url, '#.*$', ''),
                                      '\?(.*)$', 1) AS query
                FROM raw
            ), canon AS (
                SELECT doc_id,
                       scheme_host || path ||
                       CASE WHEN kept != '' THEN '?' || kept ELSE '' END
                           AS canonical_url
                FROM (
                    SELECT doc_id, scheme_host, path,
                           array_to_string(list_sort(list_filter(
                               string_split(query, '&'),
                               p -> NOT (starts_with(p, 'utm_')
                                         OR starts_with(p, 'ref=')
                                         OR p = ''))), '&') AS kept
                    FROM parts
                )
            )
            SELECT canonical_url, count(*) AS n_raw, min(doc_id) AS min_doc_id
            FROM canon GROUP BY 1
        """,
        "q184_centroid_similarity_matrix": """
            WITH pe AS (
                SELECT label, x AS pos, embedding[CAST(x AS INTEGER) + 1] AS v
                FROM embeddings CROSS JOIN generate_series(0, 63) AS t(x)
            ), cent AS (
                SELECT label, pos, avg(v) AS v FROM pe GROUP BY 1, 2
            ), dots AS (
                SELECT a.label AS label_a, b.label AS label_b,
                       sum(a.v * b.v) AS dot,
                       sum(a.v * a.v) AS na, sum(b.v * b.v) AS nb
                FROM cent a JOIN cent b
                  ON a.pos = b.pos AND a.label < b.label
                GROUP BY 1, 2
            )
            SELECT label_a, label_b,
                   round(dot / (sqrt(na) * sqrt(nb)), 4) AS cosine
            FROM dots
        """,
        "q185_hierarchy_rollup": """
            WITH anc AS (
                SELECT c_acctbal,
                       c_custkey >> CAST(x AS INTEGER) AS ancestor
                FROM customer CROSS JOIN generate_series(0, 17) AS t(x)
            )
            SELECT ancestor, count(*) AS subtree_nodes,
                   round(sum(c_acctbal), 2) AS subtree_bal
            FROM anc WHERE ancestor >= 1
            GROUP BY 1 HAVING ancestor < 64
        """,
        "q186_decile_revenue_share": """
            WITH deciles AS (
                SELECT c_custkey,
                       ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey)
                           AS decile
                FROM customer
            ), rev AS (
                SELECT o_custkey, sum(o_totalprice) AS rev
                FROM orders GROUP BY 1
            ), per_decile AS (
                SELECT decile, count(*) AS n_customers,
                       round(coalesce(sum(rev), 0.0), 2) AS revenue
                FROM deciles d LEFT JOIN rev r ON d.c_custkey = r.o_custkey
                GROUP BY 1
            ), total AS (
                SELECT sum(revenue) AS total_rev FROM per_decile
            )
            SELECT decile, n_customers, revenue,
                   round(revenue / total_rev, 4) AS rev_share
            FROM per_decile CROSS JOIN total
        """,
        "q187_resample_ffill": """
            WITH obs AS (
                SELECT user_id, date_trunc('hour', ts) AS h,
                       round(avg(value), 4) AS v
                FROM events GROUP BY 1, 2
            ), span AS (
                SELECT user_id, min(h) AS h0, max(h) AS h1 FROM obs GROUP BY 1
            ), grid AS (
                SELECT user_id, unnest(generate_series(h0, h1,
                                       INTERVAL 1 HOUR)) AS h
                FROM span
            ), joined AS (
                SELECT g.user_id, g.h, o.v
                FROM grid g LEFT JOIN obs o
                  ON g.user_id = o.user_id AND g.h = o.h
            ), filled AS (
                SELECT user_id, h, v IS NOT NULL AS observed,
                       last_value(v IGNORE NULLS) OVER (
                           PARTITION BY user_id ORDER BY h
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS v_filled
                FROM joined
            )
            SELECT user_id, count(*) AS grid_hours,
                   sum(CASE WHEN observed THEN 1 ELSE 0 END) AS observed_hours,
                   sum(CAST(round(v_filled * 10000) AS BIGINT))
                       AS sum_filled_e4
            FROM filled GROUP BY 1
        """,
        "q188_kaplan_meier": """
            WITH bounds AS (
                SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS t_end
                FROM events
            ), lives AS (
                SELECT CAST(floor((max(CAST(floor(epoch(ts)) AS BIGINT))
                                   - min(CAST(floor(epoch(ts)) AS BIGINT)))
                                  / 3600) AS BIGINT) AS life_h,
                       max(CAST(floor(epoch(ts)) AS BIGINT))
                           >= (SELECT t_end FROM bounds) - 6 * 3600 AS censored
                FROM events GROUP BY user_id
            ), risk AS (
                SELECT life_h, count(*) AS n_here,
                       sum(CASE WHEN censored THEN 0 ELSE 1 END) AS d
                FROM lives GROUP BY 1
            ), tab AS (
                SELECT life_h,
                       sum(n_here) OVER (ORDER BY life_h
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                           AS n_at_risk,
                       d
                FROM risk
            )
            SELECT life_h, n_at_risk, d,
                   round(exp(sum(ln(1 - d / CAST(n_at_risk AS DOUBLE)))
                       OVER (ORDER BY life_h
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
                       4) AS survival
            FROM tab WHERE d > 0
        """,
        "q189_column_entropy": """
            WITH long_frame AS (
                SELECT 'o_orderstatus' AS col, o_orderstatus AS val FROM orders
                UNION ALL
                SELECT 'o_orderpriority', o_orderpriority FROM orders
                UNION ALL
                SELECT 'c_mktsegment', c_mktsegment FROM customer
            ), counts AS (
                SELECT col, val, count(*) AS n FROM long_frame GROUP BY 1, 2
            ), totals AS (
                SELECT col, sum(n) AS total, count(*) AS n_values
                FROM counts GROUP BY 1
            )
            SELECT c.col, any_value(n_values) AS n_values,
                   round(-sum((n / CAST(total AS DOUBLE))
                              * log2(n / CAST(total AS DOUBLE))), 4)
                       AS entropy_bits
            FROM counts c JOIN totals t ON c.col = t.col
            GROUP BY 1
        """,
        "q190_mp4_roundtrip_checksums": """
            SELECT doc_id, 2 AS n_frames, 16 AS width, 16 AS height,
                   CAST(SUM((doc_id * 5 + 101 * (p.i // 256)
                             + 2 * (((p.i % 256) // 16) // 8)
                             + (((p.i % 256) % 16) // 8)) % 256) AS BIGINT)
                       AS pixel_sum,
                   CAST(SUM((p.i + 1) * ((doc_id * 5 + 101 * (p.i // 256)
                             + 2 * (((p.i % 256) // 16) // 8)
                             + (((p.i % 256) % 16) // 8)) % 256)) AS BIGINT)
                       AS pixel_wsum
            FROM documents,
                 LATERAL (SELECT unnest(generate_series(0, 511)) AS i) p
            GROUP BY doc_id
        """,
        "q191_mulaw_roundtrip": """
            WITH src AS (
                SELECT event_id,
                       (event_id * 37) % 65536 - 32768 AS s
                FROM events
            ), enc AS (
                SELECT event_id, s,
                       least(abs(s), 32635) + 132 AS mag
                FROM src
            ), seg AS (
                SELECT event_id, s, mag,
                       (CASE WHEN mag >= 256 THEN 1 ELSE 0 END)
                       + (CASE WHEN mag >= 512 THEN 1 ELSE 0 END)
                       + (CASE WHEN mag >= 1024 THEN 1 ELSE 0 END)
                       + (CASE WHEN mag >= 2048 THEN 1 ELSE 0 END)
                       + (CASE WHEN mag >= 4096 THEN 1 ELSE 0 END)
                       + (CASE WHEN mag >= 8192 THEN 1 ELSE 0 END)
                       + (CASE WHEN mag >= 16384 THEN 1 ELSE 0 END) AS sg
                FROM enc
            )
            SELECT event_id, s AS sample,
                   (CASE WHEN s < 0 THEN -1 ELSE 1 END)
                   * ((((mag >> (sg + 3)) & 15) * 8 + 132) * (1 << sg) - 132)
                       AS decoded
            FROM seg
        """,
        "q192_mp3_metadata_scan": """
            WITH br(i, kbps) AS (
                VALUES (1,32),(2,40),(3,48),(4,56),(5,64),(6,80),(7,96),
                       (8,112),(9,128),(10,160),(11,192),(12,224),(13,256),
                       (14,320)
            ), sr(i, hz) AS (
                VALUES (0,44100),(1,48000),(2,32000)
            ), frames AS (
                SELECT doc_id, f,
                       1 + (doc_id + f) % 14 AS bri,
                       doc_id % 3 AS sri
                FROM documents
                CROSS JOIN generate_series(0, 4) AS t(f)
                WHERE f < 2 + doc_id % 3
            ), joined AS (
                SELECT doc_id, br.kbps * 1000 AS bitrate, sr.hz AS rate
                FROM frames JOIN br ON frames.bri = br.i
                            JOIN sr ON frames.sri = sr.i
            )
            SELECT doc_id,
                   CAST(count(*) AS INTEGER) AS n_frames,
                   CAST(any_value(rate) AS INTEGER) AS sample_rate,
                   round(count(*) * 1152.0 / any_value(rate), 3)
                       AS duration_sec,
                   CAST(round(avg(bitrate)) AS BIGINT) AS mean_bitrate
            FROM joined GROUP BY 1
        """,
        "q193_ima_adpcm_roundtrip": """
            WITH samp AS (
                SELECT doc_id,
                       CAST(floor(8000 * sin(x / (10 + doc_id % 7))
                                  + 2000 * sin(x / (3 + doc_id % 3)))
                            AS BIGINT) AS s
                FROM documents CROSS JOIN generate_series(0, 999) AS t(x)
            )
            SELECT doc_id, sum(s) AS input_checksum,
                   TRUE AS ratio_ok, TRUE AS rms_ok,
                   CAST(500 AS INTEGER) AS n_bytes
            FROM samp GROUP BY 1
        """,
        "q194_session_paths": """
            WITH e AS (
                SELECT user_id, event_id, event_type,
                       CAST(floor(epoch(ts)) AS BIGINT) AS t
                FROM events
            ), flagged AS (
                SELECT user_id, event_id, event_type, t,
                       CASE WHEN lag(t) OVER w IS NULL
                                 OR t - lag(t) OVER w > 1800
                            THEN 1 ELSE 0 END AS new_session
                FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
            ), sessioned AS (
                SELECT user_id, event_type, t, event_id,
                       sum(new_session) OVER (
                           PARTITION BY user_id ORDER BY t, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS session_id
                FROM flagged
            ), paths AS (
                SELECT user_id, session_id,
                       string_agg(event_type, '>' ORDER BY t, event_id) AS path
                FROM sessioned GROUP BY 1, 2
            )
            SELECT path, count(*) AS n_sessions
            FROM paths GROUP BY 1 HAVING count(*) >= 5
        """,
        "q195_windowed_funnel": """
            WITH e AS (
                SELECT user_id, event_type,
                       CAST(floor(epoch(ts)) AS BIGINT) AS t
                FROM events
            ), v AS (
                SELECT user_id, min(t) AS t_view
                FROM e WHERE event_type = 'view' GROUP BY 1
            ), c AS (
                SELECT e.user_id, min(e.t) AS t_click,
                       any_value(v.t_view) AS t_view
                FROM e JOIN v USING (user_id)
                WHERE e.event_type = 'click'
                  AND e.t > v.t_view AND e.t <= v.t_view + 3600
                GROUP BY 1
            ), p AS (
                SELECT e.user_id
                FROM e JOIN c USING (user_id)
                WHERE e.event_type = 'purchase'
                  AND e.t > c.t_click AND e.t <= c.t_view + 3600
                GROUP BY 1
            )
            SELECT 1 AS depth, count(*) AS n_users FROM v
            UNION ALL SELECT 2, count(*) FROM c
            UNION ALL SELECT 3, count(*) FROM p
        """,
        "q196_dsir_importance": """
            WITH toks AS (
                SELECT doc_id, lang,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                FROM documents
            ), sh AS (
                SELECT doc_id, lang,
                       list_distinct(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) AS s
                FROM toks
            ), feats AS (
                SELECT doc_id, lang,
                       CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT) % 256 AS bucket
                FROM (SELECT doc_id, lang, unnest(s) AS g FROM sh)
            ), raw_m AS (
                SELECT bucket, count(*) AS cnt FROM feats GROUP BY 1
            ), tgt_m AS (
                SELECT bucket, count(*) AS cnt FROM feats
                WHERE lang = 'en' GROUP BY 1
            ), grid AS (
                SELECT CAST(unnest(range(256)) AS BIGINT) AS bucket
            ), rm AS (
                SELECT g.bucket, coalesce(r.cnt, 0) AS cnt
                FROM grid g LEFT JOIN raw_m r USING (bucket)
            ), tm AS (
                SELECT g.bucket, coalesce(t.cnt, 0) AS cnt
                FROM grid g LEFT JOIN tgt_m t USING (bucket)
            ), tot AS (
                SELECT (SELECT sum(cnt) FROM rm) AS rt,
                       (SELECT sum(cnt) FROM tm) AS tt
            ), dim AS (
                SELECT rm.bucket,
                       ln((tm.cnt + 1.0) / (tot.tt + 256.0))
                     - ln((rm.cnt + 1.0) / (tot.rt + 256.0)) AS delta
                FROM rm JOIN tm USING (bucket) CROSS JOIN tot
            ), w AS (
                SELECT f.doc_id, count(*) AS n_feats,
                       round(sum(d.delta), 4) AS log_weight
                FROM feats f JOIN dim d USING (bucket)
                GROUP BY 1
            )
            SELECT doc_id, n_feats, log_weight,
                   row_number() OVER (ORDER BY log_weight DESC, doc_id) AS rk,
                   row_number() OVER (ORDER BY log_weight DESC, doc_id)
                     <= ceil((count(*) OVER ()) * 0.2) AS selected
            FROM w
        """,
        "q197_count_min_heavy_keys": """
            WITH e AS (SELECT user_id FROM events),
            d4 AS (SELECT unnest(range(4)) AS row_i),
            pairs AS (
                SELECT row_i,
                       CAST(('0x' || substring(md5(
                           CAST(row_i AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)
                       ), 1, 15)) AS BIGINT) % 64 AS bucket
                FROM e CROSS JOIN d4
            ), cms AS (
                SELECT row_i, bucket, count(*) AS cnt FROM pairs GROUP BY 1, 2
            ), top AS (
                SELECT user_id, count(*) AS exact_n FROM e GROUP BY 1
                ORDER BY exact_n DESC, user_id LIMIT 10
            ), probe AS (
                SELECT t.user_id, t.exact_n, d4.row_i,
                       CAST(('0x' || substring(md5(
                           CAST(d4.row_i AS VARCHAR) || ':' || CAST(t.user_id AS VARCHAR)
                       ), 1, 15)) AS BIGINT) % 64 AS bucket
                FROM top t CROSS JOIN d4
            ), est AS (
                SELECT p.user_id, any_value(p.exact_n) AS exact_n,
                       min(coalesce(c.cnt, 0)) AS cms_est
                FROM probe p LEFT JOIN cms c USING (row_i, bucket)
                GROUP BY 1
            )
            SELECT user_id, exact_n, cms_est,
                   cms_est >= exact_n AS is_overestimate,
                   cms_est - exact_n AS err
            FROM est
        """,
        "q198_weighted_sample": """
            WITH s AS (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       ln((
                           (CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
                            % 4503599627370496) + 1
                       ) / 4503599627370496.0) / o_totalprice AS score
                FROM orders
                WHERE o_totalprice > 0
            ), r AS (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       row_number() OVER (
                           PARTITION BY o_orderpriority
                           ORDER BY score DESC, o_orderkey
                       ) AS rk
                FROM s
            )
            SELECT o_orderpriority, o_orderkey, o_totalprice, rk
            FROM r WHERE rk <= 40
        """,
        "q199_ann_pq": """
            SELECT CAST(COUNT(*) AS BIGINT) * 5 AS n_exact,
                   CAST(0.6 AS DOUBLE) AS recall_floor,
                   TRUE AS meets_recall_floor
            FROM embeddings WHERE vec_id < 10
        """,
        "q200_entity_resolution": """
            WITH RECURSIVE names AS (
                SELECT DISTINCT split_part(p_name, ' ', 2) AS block,
                       p_name AS name
                FROM part
            ), e AS (
                SELECT a.name AS a, b.name AS b
                FROM names a JOIN names b
                  ON a.block = b.block AND a.name < b.name
                WHERE round(jaro_winkler_similarity(a.name, b.name), 4) >= 0.85
            ), sym AS (
                SELECT a, b FROM e UNION SELECT b, a FROM e
            ), v AS (
                SELECT DISTINCT a AS id FROM sym
            ), reach(id, r) AS (
                SELECT id, id FROM v
                UNION
                SELECT s.a, reach.r FROM sym s JOIN reach ON s.b = reach.id
            ), comp AS (
                SELECT id, min(r) AS comp FROM reach GROUP BY id
            )
            SELECT comp AS canonical, count(*) AS n_members,
                   string_agg(id, '|' ORDER BY id) AS members
            FROM comp GROUP BY 1 HAVING count(*) >= 2
        """,
        "q201_psi_drift": """
            WITH e AS (
                SELECT event_type, value,
                       CAST(floor(epoch(ts)) AS BIGINT) AS t
                FROM events WHERE value IS NOT NULL
            ), bounds AS (
                SELECT min(t) AS tmin, max(t) AS tmax FROM e
            ), tagged AS (
                SELECT event_type, value,
                       (t * 2 < tmin + tmax) AS is_ref
                FROM e CROSS JOIN bounds
            ), stats AS (
                SELECT event_type, min(value) AS mn, max(value) AS mx
                FROM tagged WHERE is_ref GROUP BY 1
            ), binned AS (
                SELECT t.event_type, t.is_ref,
                       least(9, greatest(0, CAST(floor(
                           (t.value - s.mn) / ((s.mx - s.mn) / 10)
                       ) AS INT))) AS bin
                FROM tagged t JOIN stats s USING (event_type)
            ), counts AS (
                SELECT event_type, bin,
                       sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS ref_n,
                       sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cur_n
                FROM binned GROUP BY 1, 2
            ), tot AS (
                SELECT event_type, sum(ref_n) AS ref_t, sum(cur_n) AS cur_t
                FROM counts GROUP BY 1
            ), terms AS (
                SELECT c.event_type, c.ref_n, c.cur_n,
                       ((c.cur_n + 0.5) / (t.cur_t + 5)
                        - (c.ref_n + 0.5) / (t.ref_t + 5))
                       * ln(((c.cur_n + 0.5) / (t.cur_t + 5))
                            / ((c.ref_n + 0.5) / (t.ref_t + 5))) AS term
                FROM counts c JOIN tot t USING (event_type)
            ), agg AS (
                SELECT event_type, round(sum(term), 4) AS psi,
                       sum(ref_n) AS n_ref, sum(cur_n) AS n_cur
                FROM terms GROUP BY 1
            )
            SELECT event_type, psi, n_ref, n_cur, psi > 0.2 AS drifted
            FROM agg
        """,
        "q202_kcenter_coreset": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            ), sel1 AS (
                SELECT vec_id, v FROM e
                WHERE vec_id = (SELECT min(vec_id) FROM e)
            )
            , p2 AS (
                SELECT e.vec_id, min(round(1 - list_cosine_similarity(e.v, s.v), 4)) AS d
                FROM e, sel1 s
                WHERE e.vec_id NOT IN (SELECT vec_id FROM sel1)
                GROUP BY 1 ORDER BY d DESC, e.vec_id LIMIT 1
            ), sel2 AS (
                SELECT vec_id, v FROM sel1
                UNION ALL SELECT e.vec_id, e.v FROM e JOIN p2 USING (vec_id)
            )
            , p3 AS (
                SELECT e.vec_id, min(round(1 - list_cosine_similarity(e.v, s.v), 4)) AS d
                FROM e, sel2 s
                WHERE e.vec_id NOT IN (SELECT vec_id FROM sel2)
                GROUP BY 1 ORDER BY d DESC, e.vec_id LIMIT 1
            ), sel3 AS (
                SELECT vec_id, v FROM sel2
                UNION ALL SELECT e.vec_id, e.v FROM e JOIN p3 USING (vec_id)
            )
            , p4 AS (
                SELECT e.vec_id, min(round(1 - list_cosine_similarity(e.v, s.v), 4)) AS d
                FROM e, sel3 s
                WHERE e.vec_id NOT IN (SELECT vec_id FROM sel3)
                GROUP BY 1 ORDER BY d DESC, e.vec_id LIMIT 1
            ), sel4 AS (
                SELECT vec_id, v FROM sel3
                UNION ALL SELECT e.vec_id, e.v FROM e JOIN p4 USING (vec_id)
            )
            , p5 AS (
                SELECT e.vec_id, min(round(1 - list_cosine_similarity(e.v, s.v), 4)) AS d
                FROM e, sel4 s
                WHERE e.vec_id NOT IN (SELECT vec_id FROM sel4)
                GROUP BY 1 ORDER BY d DESC, e.vec_id LIMIT 1
            ), sel5 AS (
                SELECT vec_id, v FROM sel4
                UNION ALL SELECT e.vec_id, e.v FROM e JOIN p5 USING (vec_id)
            )
            , p6 AS (
                SELECT e.vec_id, min(round(1 - list_cosine_similarity(e.v, s.v), 4)) AS d
                FROM e, sel5 s
                WHERE e.vec_id NOT IN (SELECT vec_id FROM sel5)
                GROUP BY 1 ORDER BY d DESC, e.vec_id LIMIT 1
            ), sel6 AS (
                SELECT vec_id, v FROM sel5
                UNION ALL SELECT e.vec_id, e.v FROM e JOIN p6 USING (vec_id)
            )
            SELECT 1 AS step, vec_id, CAST(NULL AS DOUBLE) AS d FROM sel1
            UNION ALL SELECT 2 AS step, vec_id, d FROM p2
            UNION ALL SELECT 3 AS step, vec_id, d FROM p3
            UNION ALL SELECT 4 AS step, vec_id, d FROM p4
            UNION ALL SELECT 5 AS step, vec_id, d FROM p5
            UNION ALL SELECT 6 AS step, vec_id, d FROM p6
        """,
        "q203_unicode_normalize": _Q203_SQL,
        "q204_burst_detection": """
            WITH hourly AS (
                SELECT event_type, date_trunc('hour', ts) AS h,
                       count(*) AS cnt
                FROM events GROUP BY 1, 2
            ), stats AS (
                SELECT event_type, cnt,
                       sum(cnt) OVER w AS s,
                       sum(cnt * cnt) OVER w AS ss,
                       count(*) OVER w AS n
                FROM hourly
                WINDOW w AS (PARTITION BY event_type ORDER BY h
                             ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
            ), z AS (
                SELECT event_type,
                       CASE WHEN n = 24
                             AND (ss - s * s / CAST(n AS DOUBLE))
                                 / (n - 1) > 0
                            THEN (cnt - s / CAST(n AS DOUBLE))
                                 / sqrt((ss - s * s / CAST(n AS DOUBLE))
                                        / (n - 1))
                       END AS z
                FROM stats
            )
            SELECT event_type, count(*) AS n_hours,
                   sum(CASE WHEN z > 3 THEN 1 ELSE 0 END) AS n_bursts,
                   round(max(z), 4) AS max_z
            FROM z GROUP BY 1
        """,
        "q205_langid_confusion": f"""
            WITH c AS (
                SELECT lang,
                       len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                       t -> t IN ({_EN}))) AS en,
                       len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                       t -> t IN ({_DE}))) AS de,
                       len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                       t -> t IN ({_FR}))) AS fr,
                       len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                                       t -> t IN ({_ES}))) AS es
                FROM documents
            ), g AS (
                SELECT lang,
                       CASE WHEN greatest(en, de, fr, es) = 0 THEN 'und'
                            WHEN en = greatest(en, de, fr, es) THEN 'en'
                            WHEN de = greatest(en, de, fr, es) THEN 'de'
                            WHEN fr = greatest(en, de, fr, es) THEN 'fr'
                            ELSE 'es' END AS lang_guess
                FROM c
            )
            SELECT lang, lang_guess, count(*) AS n,
                   max(CASE WHEN lang = lang_guess THEN 1 ELSE 0 END) AS is_correct
            FROM g GROUP BY 1, 2
        """,
        "q206_portable_hll": """
            WITH h AS (
                SELECT CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
                FROM events
            ), br AS (
                SELECT h & 255 AS bucket, h >> 8 AS rem FROM h
            ), r AS (
                SELECT bucket,
                       max(CASE WHEN rem = 0 THEN 53
                                ELSE instr(lpad(bin(rem), 52, '0'), '1')
                           END) AS rho_max
                FROM br GROUP BY 1
            ), dense AS (
                SELECT coalesce(r.rho_max, 0) AS rho
                FROM (SELECT CAST(unnest(range(256)) AS BIGINT) AS bucket) g
                LEFT JOIN r USING (bucket)
            ), agg AS (
                SELECT sum(power(2.0, -rho)) AS z,
                       sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS zeros
                FROM dense
            ), e AS (
                SELECT CASE WHEN 0.7213 / (1 + 1.079 / 256) * 256 * 256 / z <= 2.5 * 256
                             AND zeros > 0
                            THEN 256.0 * ln(256.0 / zeros)
                            ELSE 0.7213 / (1 + 1.079 / 256) * 256 * 256 / z
                       END AS estimate
                FROM agg
            )
            SELECT 256 AS m,
                   (SELECT count(DISTINCT user_id) FROM events) AS n_exact,
                   round(estimate, 2) AS estimate,
                   abs(estimate - (SELECT count(DISTINCT user_id) FROM events))
                     <= 3 * 1.04 / 16 * (SELECT count(DISTINCT user_id) FROM events)
                       AS within_3_sigma
            FROM e
        """,
        "q207_data_contract": """
            WITH a AS (
                SELECT sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS c0,
                       count(o_orderkey) - count(DISTINCT o_orderkey) AS c1,
                       sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS c2,
                       sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                                THEN 0 ELSE 1 END) AS c3,
                       sum(CASE WHEN o_orderdate BETWEEN DATE '1992-01-01'
                                     AND DATE '1998-12-31'
                                THEN 0 ELSE 1 END) AS c4,
                       count(*) AS c5
                FROM orders
            )
            SELECT 'orderkey_not_null' AS check, c0 AS observed, c0 = 0 AS passed FROM a
            UNION ALL SELECT 'orderkey_unique', c1, c1 = 0 FROM a
            UNION ALL SELECT 'price_positive', c2, c2 = 0 FROM a
            UNION ALL SELECT 'status_in_domain', c3, c3 = 0 FROM a
            UNION ALL SELECT 'date_in_window', c4, c4 = 0 FROM a
            UNION ALL SELECT 'min_rows', c5, c5 >= 100 FROM a
        """,
        "q208_functional_dependencies": """
            WITH f1 AS (
                SELECT 'c_custkey' AS lhs, 'c_nationkey' AS rhs,
                       (SELECT count(DISTINCT c_custkey) FROM customer) AS n_lhs,
                       (SELECT count(*) FROM (SELECT DISTINCT c_custkey, c_nationkey FROM customer)) AS n_pairs
            ), f2 AS (
                SELECT 'c_nationkey', 'c_mktsegment',
                       (SELECT count(DISTINCT c_nationkey) FROM customer),
                       (SELECT count(*) FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer))
            ), f3 AS (
                SELECT 'n_nationkey', 'n_regionkey',
                       (SELECT count(DISTINCT n_nationkey) FROM nation),
                       (SELECT count(*) FROM (SELECT DISTINCT n_nationkey, n_regionkey FROM nation))
            ), f4 AS (
                SELECT 'n_regionkey', 'n_name',
                       (SELECT count(DISTINCT n_regionkey) FROM nation),
                       (SELECT count(*) FROM (SELECT DISTINCT n_regionkey, n_name FROM nation))
            ), u AS (
                SELECT * FROM f1 UNION ALL SELECT * FROM f2
                UNION ALL SELECT * FROM f3 UNION ALL SELECT * FROM f4
            )
            SELECT lhs, rhs, n_lhs, n_pairs,
                   n_pairs - n_lhs AS violations,
                   n_pairs = n_lhs AS holds
            FROM u
        """,
        "q209_table_checksum": """
            WITH h AS (
                SELECT CAST(('0x' || substring(md5(concat_ws('|',
                           coalesce(CAST(o_orderkey AS VARCHAR), '<NULL>'),
                           coalesce(CAST(o_custkey AS VARCHAR), '<NULL>'),
                           coalesce(o_orderstatus, '<NULL>'),
                           coalesce(CAST(o_totalprice AS VARCHAR), '<NULL>'),
                           coalesce(CAST(o_orderdate AS VARCHAR), '<NULL>'),
                           coalesce(o_orderpriority, '<NULL>')
                       )), 1, 15)) AS BIGINT) AS h
                FROM orders
            )
            SELECT count(*) AS n_rows,
                   bit_xor(h) AS xor_digest,
                   CAST(sum(h) % 1152921504606846976 AS BIGINT) AS sum_digest
            FROM h
        """,
        "q210_incremental_agg": """
            WITH base AS (
                SELECT o_orderpriority, count(*) AS n, sum(o_totalprice) AS rev,
                       min(o_orderdate) AS first_d, max(o_orderdate) AS last_d
                FROM orders WHERE o_orderdate < DATE '1996-01-01' GROUP BY 1
            ), delta AS (
                SELECT o_orderpriority, count(*) AS n, sum(o_totalprice) AS rev,
                       min(o_orderdate) AS first_d, max(o_orderdate) AS last_d
                FROM orders WHERE o_orderdate >= DATE '1996-01-01' GROUP BY 1
            ), merged AS (
                SELECT o_orderpriority, sum(n) AS n, sum(rev) AS rev,
                       min(first_d) AS first_d, max(last_d) AS last_d
                FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
                GROUP BY 1
            ), f AS (
                SELECT o_orderpriority, count(*) AS n_full,
                       sum(o_totalprice) AS rev_full
                FROM orders GROUP BY 1
            )
            SELECT m.o_orderpriority, m.n, round(m.rev, 2) AS rev,
                   round(m.rev / m.n, 2) AS avg_rev, m.first_d, m.last_d,
                   (m.n = f.n_full AND round(m.rev, 2) = round(f.rev_full, 2))
                       AS matches_full_recompute
            FROM merged m JOIN f USING (o_orderpriority)
        """,
        "q211_temperature_sampling": """
            WITH counts AS (
                SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1
            ), tot AS (
                SELECT sum(n_docs) AS total FROM counts
            ), w AS (
                SELECT lang, n_docs,
                       n_docs / CAST(total AS DOUBLE) AS p,
                       power(n_docs / CAST(total AS DOUBLE), 0.7) AS w
                FROM counts CROSS JOIN tot
            ), z AS (
                SELECT sum(w) AS z FROM w
            )
            SELECT lang, n_docs,
                   round(p, 4) AS p_raw,
                   round(w / z, 4) AS p_tempered,
                   round((w / z) / p, 4) AS upsample_factor,
                   round(10000 * w / z, 1) AS expected_docs
            FROM w CROSS JOIN z
        """,
        "q212_readability": """
            WITH d AS (
                SELECT lang,
                       len(regexp_split_to_array(trim(text), '\\s+')) AS w,
                       greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
                       len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl
                FROM documents
            )
            SELECT lang, count(*) AS n_docs,
                   round(avg(206.835 - 1.015 * (w / CAST(s AS DOUBLE))
                             - 84.6 * (syl / CAST(w AS DOUBLE))), 2) AS avg_flesch,
                   round(avg(w), 2) AS avg_words
            FROM d GROUP BY 1
        """,
        "q213_cross_source_overlap": """
            WITH toks AS (
                SELECT source, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                FROM documents
            ), sh AS (
                SELECT DISTINCT source, g FROM (
                    SELECT source,
                           unnest(list_distinct(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))) AS g
                    FROM toks
                )
            ), sizes AS (
                SELECT source, count(*) AS sz FROM sh GROUP BY 1
            ), inter AS (
                SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
                FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
                GROUP BY 1, 2
            )
            SELECT src_a, src_b, n_common,
                   round(n_common / (sa.sz + sb.sz - n_common), 4) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.source = src_a
            JOIN sizes sb ON sb.source = src_b
            ORDER BY jaccard DESC, src_a, src_b LIMIT 10
        """,
        "q214_decayed_engagement": """
            WITH e AS (
                SELECT user_id, value,
                       CAST(floor(epoch(ts)) AS BIGINT) AS t
                FROM events
            ), a AS (
                SELECT max(t) AS t_max FROM e
            ), s AS (
                SELECT user_id,
                       value * exp(-0.0231049060186648 * (t_max - t) / 86400.0) AS dv
                FROM e CROSS JOIN a
            )
            SELECT user_id, round(sum(dv), 4) AS decayed_score,
                   count(*) AS n_events
            FROM s GROUP BY 1
            ORDER BY decayed_score DESC, user_id LIMIT 15
        """,
        "q215_string_length_profile": """
            WITH stacked AS (
                SELECT 'c_name' AS "column", CAST(c_name AS VARCHAR) AS v FROM customer
                UNION ALL SELECT 'c_mktsegment', c_mktsegment FROM customer
                UNION ALL SELECT 'c_custkey', CAST(c_custkey AS VARCHAR) FROM customer
                UNION ALL SELECT 'c_nationkey', CAST(c_nationkey AS VARCHAR) FROM customer
            )
            SELECT "column",
                   sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS n_null,
                   count(DISTINCT v) AS n_distinct,
                   min(length(v)) AS min_len,
                   max(length(v)) AS max_len,
                   round(avg(length(v)), 2) AS avg_len
            FROM stacked GROUP BY 1
        """,
        "q216_wow_regression": """
            WITH weekly AS (
                SELECT event_type,
                       CAST(date_trunc('week', ts) AS DATE) AS week_start,
                       count(*) AS n, round(sum(value), 2) AS val
                FROM events GROUP BY 1, 2
            ), lagged AS (
                SELECT event_type, week_start, n, val,
                       lag(n) OVER (PARTITION BY event_type ORDER BY week_start) AS n_prev
                FROM weekly
            )
            SELECT event_type, week_start, n, n_prev,
                   round((n - n_prev) / CAST(n_prev AS DOUBLE), 4) AS wow_delta,
                   abs((n - n_prev) / CAST(n_prev AS DOUBLE)) > 0.2 AS regressed
            FROM lagged WHERE n_prev IS NOT NULL
        """,
        "q217_pii_density": """
            WITH d AS (
                SELECT source, doc_id,
                       text
                       || CASE WHEN doc_id % 5 = 0
                               THEN ' contact user' || CAST(doc_id AS VARCHAR)
                                    || '@example.com' ELSE '' END
                       || CASE WHEN doc_id % 7 = 0
                               THEN ' call 555-867-5309' ELSE '' END AS dirty
                FROM documents
            ), c AS (
                SELECT source, doc_id,
                       len(regexp_extract_all(dirty,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS e,
                       len(regexp_extract_all(dirty,
                           '\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b')) AS p
                FROM d
            )
            SELECT source, count(*) AS n_docs,
                   sum(e) AS n_emails, sum(p) AS n_phones,
                   sum(e) = sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)
                       AS emails_recovered,
                   sum(p) = sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)
                       AS phones_recovered
            FROM c GROUP BY 1
        """,
        "q218_split_leakage_audit": """
            WITH toks AS (
                SELECT doc_id, lang, source,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                FROM documents
            ), sh AS (
                SELECT doc_id, lang, source,
                       list_distinct(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) AS s
                FROM toks
            ), e AS (
                SELECT doc_id, lang, source, len(s) AS sz, unnest(s) AS g FROM sh
            ), inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       a.sz AS sz_a, b.sz AS sz_b, count(*) AS n_common
                FROM e a JOIN e b
                  ON a.g = b.g AND a.doc_id < b.doc_id
                 AND a.lang = b.lang AND a.source = b.source
                GROUP BY 1, 2, 3, 4
            ), pairs AS (
                SELECT id_a, id_b,
                       round(n_common / (sz_a + sz_b - n_common), 4) AS jaccard
                FROM inter
                WHERE n_common / (sz_a + sz_b - n_common) >= 0.05
            ), typed AS (
                SELECT least(CASE WHEN (((((instr('0123456789abcdef', substr(md5(cast(id_a as string)), 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(md5(cast(id_a as string)), 2, 1)) - 1)) * 16 + (instr('0123456789abcdef', substr(md5(cast(id_a as string)), 3, 1)) - 1)) * 16 + (instr('0123456789abcdef', substr(md5(cast(id_a as string)), 4, 1)) - 1)) % 10000) < 8000 THEN 'train' ELSE 'test' END, CASE WHEN (((((instr('0123456789abcdef', substr(md5(cast(id_b as string)), 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(md5(cast(id_b as string)), 2, 1)) - 1)) * 16 + (instr('0123456789abcdef', substr(md5(cast(id_b as string)), 3, 1)) - 1)) * 16 + (instr('0123456789abcdef', substr(md5(cast(id_b as string)), 4, 1)) - 1)) % 10000) < 8000 THEN 'train' ELSE 'test' END)
                       || '-' ||
                       greatest(CASE WHEN (((((instr('0123456789abcdef', substr(md5(cast(id_a as string)), 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(md5(cast(id_a as string)), 2, 1)) - 1)) * 16 + (instr('0123456789abcdef', substr(md5(cast(id_a as string)), 3, 1)) - 1)) * 16 + (instr('0123456789abcdef', substr(md5(cast(id_a as string)), 4, 1)) - 1)) % 10000) < 8000 THEN 'train' ELSE 'test' END, CASE WHEN (((((instr('0123456789abcdef', substr(md5(cast(id_b as string)), 1, 1)) - 1) * 16 + (instr('0123456789abcdef', substr(md5(cast(id_b as string)), 2, 1)) - 1)) * 16 + (instr('0123456789abcdef', substr(md5(cast(id_b as string)), 3, 1)) - 1)) * 16 + (instr('0123456789abcdef', substr(md5(cast(id_b as string)), 4, 1)) - 1)) % 10000) < 8000 THEN 'train' ELSE 'test' END)
                           AS pair_type,
                       jaccard
                FROM pairs
            )
            SELECT pair_type, count(*) AS n_pairs,
                   round(max(jaccard), 4) AS max_jaccard,
                   pair_type = 'test-train' AS is_leak
            FROM typed GROUP BY 1
        """,
        "q219_minhash_source_overlap": f"""
            WITH toks AS (
                SELECT source, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                FROM documents
            ), sh AS (
                SELECT DISTINCT source, g FROM (
                    SELECT source,
                           unnest(list_distinct(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))) AS g
                    FROM toks
                )
            ), hashed AS (
                SELECT source,
                       CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT)
                           % 2147483647 AS h
                FROM sh
            ), sigs AS (
                SELECT source, p.i, min((p.a * h + p.b) % 2147483647) AS sig
                FROM hashed CROSS JOIN (VALUES {_MINHASH_PERMS32}) AS p(i, a, b)
                GROUP BY 1, 2
            ), est AS (
                SELECT a.source AS src_a, b.source AS src_b,
                       sum(CASE WHEN a.sig = b.sig THEN 1 ELSE 0 END) / 32.0 AS est
                FROM sigs a JOIN sigs b ON a.i = b.i AND a.source < b.source
                GROUP BY 1, 2
            ), sizes AS (
                SELECT source, count(*) AS sz FROM sh GROUP BY 1
            ), inter AS (
                SELECT x.source AS src_a, y.source AS src_b, count(*) AS n_common
                FROM sh x JOIN sh y ON x.g = y.g AND x.source < y.source
                GROUP BY 1, 2
            ), exact AS (
                SELECT src_a, src_b,
                       n_common / (sa.sz + sb.sz - n_common) AS exact_j
                FROM inter
                JOIN sizes sa ON sa.source = src_a
                JOIN sizes sb ON sb.source = src_b
            )
            SELECT e.src_a, e.src_b,
                   round(e.exact_j, 4) AS exact_jaccard,
                   round(m.est, 4) AS est_jaccard,
                   abs(m.est - e.exact_j) <= 0.55 AS within_bound
            FROM exact e JOIN est m USING (src_a, src_b)
            ORDER BY exact_jaccard DESC, src_a, src_b LIMIT 10
        """,
        "q220_rfm_segmentation": """
            WITH anchor AS (
                SELECT max(o_orderdate) AS d_max FROM orders
            ), pc AS (
                SELECT o_custkey,
                       date_diff('day', max(o_orderdate),
                                 (SELECT d_max FROM anchor)) AS recency_days,
                       count(*) AS freq, sum(o_totalprice) AS spend
                FROM orders GROUP BY 1
            ), scored AS (
                SELECT o_custkey,
                       ntile(5) OVER (ORDER BY recency_days, o_custkey) AS r_q,
                       ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS f_q,
                       ntile(5) OVER (ORDER BY spend DESC, o_custkey) AS m_q
                FROM pc
            )
            SELECT CASE WHEN r_q <= 2 AND f_q <= 2 AND m_q <= 2 THEN 'champion'
                        WHEN f_q <= 2 AND m_q <= 2 THEN 'loyal'
                        WHEN r_q >= 4 AND m_q <= 2 THEN 'at_risk'
                        WHEN r_q >= 4 THEN 'hibernating'
                        ELSE 'other' END AS segment,
                   count(*) AS n_customers
            FROM scored GROUP BY 1
        """,
        "q221_degree_tail_estimate": """
            WITH pairs AS (
                SELECT DISTINCT a.l_partkey AS p, b.l_partkey AS q
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey <> b.l_partkey
            ), deg AS (
                SELECT p, count(*) AS d FROM pairs GROUP BY 1
            ), topk AS (
                SELECT d FROM deg ORDER BY d DESC, p LIMIT 50
            ), dmin AS (
                SELECT min(d) AS d_min FROM topk
            ), hill AS (
                SELECT 50 AS k,
                       round(1.0 + 50 / sum(ln(d / CAST(d_min AS DOUBLE))), 4)
                           AS hill_alpha
                FROM topk CROSS JOIN dmin
            ), stats AS (
                SELECT count(*) AS n_nodes, max(d) AS max_degree,
                       round(avg(d), 2) AS avg_degree
                FROM deg
            )
            SELECT k, hill_alpha, n_nodes, max_degree, avg_degree
            FROM hill CROSS JOIN stats
        """,
        "q222_asof_join_forward": """
            SELECT l.event_id,
                   l.user_id,
                   CAST(floor(epoch(l.ts)) AS BIGINT) AS ts_epoch,
                   round(r.v2, 2) AS next_view_value
            FROM (SELECT * FROM events WHERE event_type = 'click') l
            ASOF LEFT JOIN (SELECT user_id AS u2, ts AS ts2, value AS v2
                            FROM events WHERE event_type = 'view') r
              ON l.user_id = r.u2 AND l.ts <= r.ts2
        """,
        "q223_zorder_layout_audit": """
            WITH q AS (
                SELECT c_custkey, c_nationkey, c_acctbal,
                       CAST(floor(least(greatest((CAST(c_acctbal AS DOUBLE) - (-1000.0)) / (10000.0 - (-1000.0)), 0.0), 1.0) * 255) AS BIGINT) AS yq
                FROM customer
            ), zv AS (
                SELECT c_custkey, c_nationkey, c_acctbal,
                       (((c_nationkey >> 0) & 1) << 0) | (((yq >> 0) & 1) << 1) | (((c_nationkey >> 1) & 1) << 2) | (((yq >> 1) & 1) << 3) | (((c_nationkey >> 2) & 1) << 4) | (((yq >> 2) & 1) << 5) | (((c_nationkey >> 3) & 1) << 6) | (((yq >> 3) & 1) << 7) | (((c_nationkey >> 4) & 1) << 8) | (((yq >> 4) & 1) << 9) | (((c_nationkey >> 5) & 1) << 10) | (((yq >> 5) & 1) << 11) | (((c_nationkey >> 6) & 1) << 12) | (((yq >> 6) & 1) << 13) | (((c_nationkey >> 7) & 1) << 14) | (((yq >> 7) & 1) << 15) AS z
                FROM q
            ), sharded AS (
                SELECT c_nationkey, c_acctbal,
                       ntile(16) OVER (ORDER BY z, c_custkey) AS shard
                FROM zv
            )
            SELECT shard, count(*) AS n,
                   min(c_nationkey) AS nk_min, max(c_nationkey) AS nk_max,
                   round(min(c_acctbal), 2) AS bal_min,
                   round(max(c_acctbal), 2) AS bal_max,
                   min(c_nationkey) <= 13 AND max(c_nationkey) >= 13
                       AS scanned_for_nk13
            FROM sharded GROUP BY 1
        """,
        "q224_weighted_median": """
            WITH cum AS (
                SELECT l_returnflag, l_extendedprice AS v,
                       sum(l_quantity) OVER (
                           PARTITION BY l_returnflag ORDER BY l_extendedprice
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS cw,
                       sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tw
                FROM lineitem
            )
            SELECT l_returnflag,
                   round(min(CASE WHEN cw >= tw * 0.5 THEN v END), 2)
                       AS weighted_median,
                   round(min(CASE WHEN cw >= tw * 0.9 THEN v END), 2)
                       AS weighted_p90,
                   round(any_value(tw), 2) AS total_weight
            FROM cum GROUP BY 1
        """,
        "q225_conversion_latency": """
            WITH e AS (
                SELECT user_id, event_type,
                       CAST(floor(epoch(ts)) AS BIGINT) AS t
                FROM events
            ), fc AS (
                SELECT user_id, min(t) AS t_click FROM e
                WHERE event_type = 'click' GROUP BY 1
            ), p AS (
                SELECT e.user_id, min(t - t_click) AS latency_s
                FROM e JOIN fc USING (user_id)
                WHERE event_type = 'purchase' AND t >= t_click
                GROUP BY 1
            )
            SELECT count(*) AS n_converted,
                   quantile_cont(latency_s, 0.5) AS p50_s,
                   quantile_cont(latency_s, 0.9) AS p90_s,
                   max(latency_s) AS max_s
            FROM p
        """,
        "q226_prefix_similarity_join": """
            WITH toks AS (
                SELECT doc_id, lang, source,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                FROM documents
            ), sh AS (
                SELECT doc_id, lang, source,
                       list_distinct(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) AS s
                FROM toks
            ), e AS (
                SELECT doc_id, lang, source, len(s) AS sz, unnest(s) AS g FROM sh
            ), inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       a.sz AS sz_a, b.sz AS sz_b, count(*) AS n_common
                FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
                 AND a.lang = b.lang AND a.source = b.source
                GROUP BY 1, 2, 3, 4
            )
            SELECT id_a, id_b,
                   round(n_common / (sz_a + sz_b - n_common), 4) AS jaccard
            FROM inter
            WHERE n_common / (sz_a + sz_b - n_common) >= 0.4
        """,
        "q227_rare_label_collapse": """
            WITH counts AS (
                SELECT p_brand, count(*) AS n FROM part GROUP BY 1
            ), share AS (
                SELECT p_brand, n,
                       sum(n) OVER (ORDER BY n DESC, p_brand
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING)
                       / CAST(sum(n) OVER () AS DOUBLE) AS share_before
                FROM counts
            ), mapped AS (
                SELECT p_brand, n,
                       CASE WHEN coalesce(share_before, 0.0) < 0.6
                            THEN p_brand ELSE '__other__' END AS label
                FROM share
            )
            SELECT label, sum(n) AS n_rows, count(*) AS n_raw_labels
            FROM mapped GROUP BY 1
        """,
        "q228_cumulative_distinct_users": """
            WITH fs AS (
                SELECT user_id, min(CAST(ts AS DATE)) AS d0
                FROM events GROUP BY 1
            ), per_day AS (
                SELECT d0, count(*) AS new_users FROM fs GROUP BY 1
            )
            SELECT d0 AS day, new_users,
                   sum(new_users) OVER (ORDER BY d0
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS cumulative_users
            FROM per_day
        """,
        "q229_luhn_validation": """
            WITH base AS (
                SELECT o_orderkey,
                       lpad(CAST(o_orderkey AS VARCHAR), 15, '0') AS b
                FROM orders
            ), signed AS (
                SELECT o_orderkey,
                       b || CAST((10 - (((CASE WHEN CAST(substr(b, 1, 1) AS INT) * 2 > 9 THEN CAST(substr(b, 1, 1) AS INT) * 2 - 9 ELSE CAST(substr(b, 1, 1) AS INT) * 2 END) + CAST(substr(b, 2, 1) AS INT) + (CASE WHEN CAST(substr(b, 3, 1) AS INT) * 2 > 9 THEN CAST(substr(b, 3, 1) AS INT) * 2 - 9 ELSE CAST(substr(b, 3, 1) AS INT) * 2 END) + CAST(substr(b, 4, 1) AS INT) + (CASE WHEN CAST(substr(b, 5, 1) AS INT) * 2 > 9 THEN CAST(substr(b, 5, 1) AS INT) * 2 - 9 ELSE CAST(substr(b, 5, 1) AS INT) * 2 END) + CAST(substr(b, 6, 1) AS INT) + (CASE WHEN CAST(substr(b, 7, 1) AS INT) * 2 > 9 THEN CAST(substr(b, 7, 1) AS INT) * 2 - 9 ELSE CAST(substr(b, 7, 1) AS INT) * 2 END) + CAST(substr(b, 8, 1) AS INT) + (CASE WHEN CAST(substr(b, 9, 1) AS INT) * 2 > 9 THEN CAST(substr(b, 9, 1) AS INT) * 2 - 9 ELSE CAST(substr(b, 9, 1) AS INT) * 2 END) + CAST(substr(b, 10, 1) AS INT) + (CASE WHEN CAST(substr(b, 11, 1) AS INT) * 2 > 9 THEN CAST(substr(b, 11, 1) AS INT) * 2 - 9 ELSE CAST(substr(b, 11, 1) AS INT) * 2 END) + CAST(substr(b, 12, 1) AS INT) + (CASE WHEN CAST(substr(b, 13, 1) AS INT) * 2 > 9 THEN CAST(substr(b, 13, 1) AS INT) * 2 - 9 ELSE CAST(substr(b, 13, 1) AS INT) * 2 END) + CAST(substr(b, 14, 1) AS INT) + (CASE WHEN CAST(substr(b, 15, 1) AS INT) * 2 > 9 THEN CAST(substr(b, 15, 1) AS INT) * 2 - 9 ELSE CAST(substr(b, 15, 1) AS INT) * 2 END)) % 10)) % 10
                                 AS VARCHAR) AS good
                FROM base
            ), ids AS (
                SELECT o_orderkey % 13 = 0 AS was_corrupted,
                       CASE WHEN o_orderkey % 13 = 0
                            THEN substr(good, 1, 7)
                                 || CAST((CAST(substr(good, 8, 1) AS INT) + 1) % 10
                                         AS VARCHAR)
                                 || substr(good, 9, 8)
                            ELSE good END AS card_id
                FROM signed
            ), v AS (
                SELECT was_corrupted,
                       (((CASE WHEN CAST(substr(card_id, 1, 1) AS INT) * 2 > 9 THEN CAST(substr(card_id, 1, 1) AS INT) * 2 - 9 ELSE CAST(substr(card_id, 1, 1) AS INT) * 2 END) + CAST(substr(card_id, 2, 1) AS INT) + (CASE WHEN CAST(substr(card_id, 3, 1) AS INT) * 2 > 9 THEN CAST(substr(card_id, 3, 1) AS INT) * 2 - 9 ELSE CAST(substr(card_id, 3, 1) AS INT) * 2 END) + CAST(substr(card_id, 4, 1) AS INT) + (CASE WHEN CAST(substr(card_id, 5, 1) AS INT) * 2 > 9 THEN CAST(substr(card_id, 5, 1) AS INT) * 2 - 9 ELSE CAST(substr(card_id, 5, 1) AS INT) * 2 END) + CAST(substr(card_id, 6, 1) AS INT) + (CASE WHEN CAST(substr(card_id, 7, 1) AS INT) * 2 > 9 THEN CAST(substr(card_id, 7, 1) AS INT) * 2 - 9 ELSE CAST(substr(card_id, 7, 1) AS INT) * 2 END) + CAST(substr(card_id, 8, 1) AS INT) + (CASE WHEN CAST(substr(card_id, 9, 1) AS INT) * 2 > 9 THEN CAST(substr(card_id, 9, 1) AS INT) * 2 - 9 ELSE CAST(substr(card_id, 9, 1) AS INT) * 2 END) + CAST(substr(card_id, 10, 1) AS INT) + (CASE WHEN CAST(substr(card_id, 11, 1) AS INT) * 2 > 9 THEN CAST(substr(card_id, 11, 1) AS INT) * 2 - 9 ELSE CAST(substr(card_id, 11, 1) AS INT) * 2 END) + CAST(substr(card_id, 12, 1) AS INT) + (CASE WHEN CAST(substr(card_id, 13, 1) AS INT) * 2 > 9 THEN CAST(substr(card_id, 13, 1) AS INT) * 2 - 9 ELSE CAST(substr(card_id, 13, 1) AS INT) * 2 END) + CAST(substr(card_id, 14, 1) AS INT) + (CASE WHEN CAST(substr(card_id, 15, 1) AS INT) * 2 > 9 THEN CAST(substr(card_id, 15, 1) AS INT) * 2 - 9 ELSE CAST(substr(card_id, 15, 1) AS INT) * 2 END) + CAST(substr(card_id, 16, 1) AS INT)) % 10) = 0 AS passes_luhn
                FROM ids
            )
            SELECT was_corrupted, passes_luhn, count(*) AS n
            FROM v GROUP BY 1, 2
        """,
        "q230_referential_integrity": """
            WITH li_stats AS (
                SELECT count(*) AS n_lineitems,
                       sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                           AS orphan_lineitems
                FROM lineitem l LEFT JOIN orders o
                  ON l.l_orderkey = o.o_orderkey
            ), ord_stats AS (
                SELECT count(*) AS n_orders,
                       sum(CASE WHEN d.l_orderkey IS NULL THEN 1 ELSE 0 END)
                           AS childless_orders
                FROM orders o LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) d
                  ON o.o_orderkey = d.l_orderkey
            )
            SELECT n_lineitems, orphan_lineitems, n_orders, childless_orders,
                   round(1.0 - orphan_lineitems / CAST(n_lineitems AS DOUBLE), 4)
                       AS lineitem_coverage,
                   round(1.0 - childless_orders / CAST(n_orders AS DOUBLE), 4)
                       AS order_coverage
            FROM li_stats CROSS JOIN ord_stats
        """,
        "q231_streaming_counts_graded": """
            SELECT event_type, count(*) AS n,
                   round(sum(value), 2) AS total_value
            FROM events GROUP BY 1
        """,
        "q232_embedding_decontamination": """
            WITH ev AS (
                SELECT CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id < 50
            ), tr AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id >= 50
            ), per_train AS (
                SELECT t.vec_id,
                       max(round(list_cosine_similarity(t.v, e.v), 4)) AS max_sim
                FROM tr t CROSS JOIN ev e
                GROUP BY 1
            )
            SELECT count(*) AS n_train,
                   sum(CASE WHEN max_sim >= 0.4 THEN 1 ELSE 0 END) AS n_flagged,
                   round(max(max_sim), 4) AS max_sim
            FROM per_train
        """,
        "q233_ks_test": """
            WITH tagged AS (
                SELECT o_totalprice AS v,
                       CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a
                FROM orders
                WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
            ), per_v AS (
                SELECT v, sum(is_a) AS na_v, sum(1 - is_a) AS nb_v
                FROM tagged GROUP BY 1
            ), tot AS (
                SELECT sum(is_a) AS n_a, sum(1 - is_a) AS n_b FROM tagged
            ), cum AS (
                SELECT sum(na_v) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
                       sum(nb_v) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
                FROM per_v
            )
            SELECT any_value(t.n_a) AS n_a,
                   any_value(t.n_b) AS n_b,
                   round(max(abs(ca / CAST(t.n_a AS DOUBLE)
                                 - cb / CAST(t.n_b AS DOUBLE))), 4) AS ks_d,
                   round(any_value(1.358 * sqrt((t.n_a + t.n_b)
                         / (CAST(t.n_a AS DOUBLE) * t.n_b))), 4) AS crit_05,
                   max(abs(ca / CAST(t.n_a AS DOUBLE)
                           - cb / CAST(t.n_b AS DOUBLE)))
                     > any_value(1.358 * sqrt((t.n_a + t.n_b)
                         / (CAST(t.n_a AS DOUBLE) * t.n_b))) AS reject_h0
            FROM cum CROSS JOIN tot t
        """,
        "q234_mann_whitney": """
            WITH tagged AS (
                SELECT o_totalprice AS v,
                       CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a
                FROM orders
                WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
            ), per_v AS (
                SELECT v, sum(is_a) AS na_v, count(*) AS n_v
                FROM tagged GROUP BY 1
            ), ranked AS (
                SELECT na_v,
                       coalesce(sum(n_v) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       + (n_v + 1) / 2.0 AS avg_rank
                FROM per_v
            ), tot AS (
                SELECT sum(is_a) AS n_a, sum(1 - is_a) AS n_b FROM tagged
            ), s AS (
                SELECT sum(na_v * avg_rank) AS r_a FROM ranked
            )
            SELECT n_a, n_b,
                   round(r_a - n_a * (n_a + 1) / 2.0, 2) AS u_stat,
                   round((r_a - n_a * (n_a + 1) / 2.0 - n_a * n_b / 2.0)
                         / sqrt(n_a * n_b * (n_a + n_b + 1) / 12.0), 4) AS z,
                   abs((r_a - n_a * (n_a + 1) / 2.0 - n_a * n_b / 2.0)
                       / sqrt(n_a * n_b * (n_a + n_b + 1) / 12.0)) > 1.96
                       AS reject_h0
            FROM s CROSS JOIN tot
        """,
        "q235_hhi_concentration": """
            WITH per_cust AS (
                SELECT c.c_nationkey, c.c_custkey, sum(o_totalprice) AS rev
                FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                GROUP BY 1, 2
            ), tot AS (
                SELECT c_nationkey, sum(rev) AS tot FROM per_cust GROUP BY 1
            )
            SELECT p.c_nationkey, count(*) AS n_customers,
                   round(sum(power(p.rev / t.tot, 2)) * 10000, 2) AS hhi
            FROM per_cust p JOIN tot t USING (c_nationkey)
            GROUP BY 1
        """,
        "q236_dow_seasonality": """
            WITH daily AS (
                SELECT event_type, CAST(ts AS DATE) AS d,
                       dayofweek(ts) + 1 AS dow, count(*) AS n
                FROM events GROUP BY 1, 2, 3
            ), per_dow AS (
                SELECT event_type, dow, avg(n) AS dow_avg
                FROM daily GROUP BY 1, 2
            ), overall AS (
                SELECT event_type, avg(n) AS all_avg FROM daily GROUP BY 1
            )
            SELECT p.event_type, p.dow,
                   round(p.dow_avg, 4) AS dow_avg,
                   round(p.dow_avg / o.all_avg, 4) AS seasonality_index
            FROM per_dow p JOIN overall o USING (event_type)
        """,
        "q237_partition_checksums": """
            WITH h AS (
                SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                       CAST(('0x' || substring(md5(concat_ws('|',
                           coalesce(CAST(o_orderkey AS VARCHAR), '<NULL>'),
                           coalesce(CAST(o_custkey AS VARCHAR), '<NULL>'),
                           coalesce(o_orderstatus, '<NULL>'),
                           coalesce(CAST(o_totalprice AS VARCHAR), '<NULL>'),
                           coalesce(CAST(o_orderdate AS VARCHAR), '<NULL>'),
                           coalesce(o_orderpriority, '<NULL>')
                       )), 1, 15)) AS BIGINT) AS h
                FROM orders
            )
            SELECT month, count(*) AS n_rows, bit_xor(h) AS xor_digest
            FROM h GROUP BY 1
        """,
        "q238_cohort_ltv": """
            WITH o AS (
                SELECT o_custkey, o_totalprice, year(o_orderdate) AS yr
                FROM orders
            ), first AS (
                SELECT o_custkey, min(yr) AS cohort FROM o GROUP BY 1
            ), sizes AS (
                SELECT cohort, count(DISTINCT o_custkey) AS n_cust
                FROM first GROUP BY 1
            ), per_age AS (
                SELECT f.cohort, o.yr - f.cohort AS age,
                       sum(o_totalprice) AS rev
                FROM o JOIN first f USING (o_custkey)
                GROUP BY 1, 2
            ), cum AS (
                SELECT cohort, age,
                       sum(rev) OVER (PARTITION BY cohort ORDER BY age
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum_rev
                FROM per_age
            )
            SELECT c.cohort, c.age,
                   round(c.cum_rev / s.n_cust, 2) AS ltv_per_customer,
                   s.n_cust
            FROM cum c JOIN sizes s USING (cohort)
        """,
        "q239_fifo_allocation": """
            WITH li AS (
                SELECT * FROM lineitem WHERE l_partkey % 97 = 0
            ), s AS (
                SELECT l_partkey,
                       l_orderkey AS s_order, l_linenumber AS s_line,
                       l_quantity AS s_qty,
                       sum(l_quantity) OVER (PARTITION BY l_partkey
                           ORDER BY l_shipdate, l_orderkey, l_linenumber
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS s_cum
                FROM li WHERE l_returnflag = 'R'
            ), d AS (
                SELECT l_partkey,
                       l_orderkey AS d_order, l_linenumber AS d_line,
                       l_quantity AS d_qty,
                       sum(l_quantity) OVER (PARTITION BY l_partkey
                           ORDER BY l_shipdate, l_orderkey, l_linenumber
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS d_cum
                FROM li WHERE l_returnflag = 'A'
            )
            SELECT s.l_partkey, s_order, s_line, d_order, d_line,
                   round(least(s_cum, d_cum)
                         - greatest(s_cum - s_qty, d_cum - d_qty), 2)
                       AS allocated
            FROM s JOIN d USING (l_partkey)
            WHERE least(s_cum, d_cum)
                  - greatest(s_cum - s_qty, d_cum - d_qty) > 0
        """,
        "q240_attribution_models": """
            WITH e AS (
                SELECT user_id, event_type, value,
                       CAST(floor(epoch(ts)) AS BIGINT) AS t,
                       'camp_' || CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 4
                                       AS VARCHAR) AS camp
                FROM events
            ), touches AS (
                SELECT user_id, t AS tt, camp FROM e
                WHERE event_type IN ('click', 'view')
            ), purchases AS (
                SELECT user_id, t AS pt, value AS rev FROM e
                WHERE event_type = 'purchase'
            ), pairs AS (
                SELECT p.user_id, p.pt, p.rev, t.tt, t.camp
                FROM purchases p JOIN touches t USING (user_id)
                WHERE t.tt <= p.pt
            ), ann AS (
                SELECT camp, rev, tt,
                       count(*) OVER (PARTITION BY user_id, pt) AS n_touch,
                       min(tt) OVER (PARTITION BY user_id, pt) AS t_first,
                       max(tt) OVER (PARTITION BY user_id, pt) AS t_last
                FROM pairs
            )
            SELECT camp,
                   round(sum(CASE WHEN tt = t_first THEN rev ELSE 0 END), 2)
                       AS first_touch_rev,
                   round(sum(CASE WHEN tt = t_last THEN rev ELSE 0 END), 2)
                       AS last_touch_rev,
                   round(sum(rev / n_touch), 2) AS linear_rev
            FROM ann GROUP BY 1
        """,
        "q241_asof_cogrouped": """
            SELECT l.event_id,
                   l.user_id,
                   CAST(floor(epoch(l.ts)) AS BIGINT) AS ts_epoch,
                   round(r.v2, 2) AS last_view_value
            FROM (SELECT * FROM events WHERE event_type = 'click') l
            ASOF LEFT JOIN (SELECT user_id AS u2,
                                   CAST(floor(epoch(ts)) AS BIGINT) AS ts2,
                                   value AS v2
                            FROM events WHERE event_type = 'view') r
              ON l.user_id = r.u2
             AND CAST(floor(epoch(l.ts)) AS BIGINT) >= r.ts2
        """,
        "q242_portable_bloom": """
            WITH d4 AS (SELECT unnest(range(4)) AS i),
            bits AS (
                SELECT DISTINCT
                       CAST(('0x' || substring(md5(
                           CAST(i AS VARCHAR) || ':' || CAST(c_custkey AS VARCHAR)
                       ), 1, 15)) AS BIGINT) % 4096 AS bit
                FROM customer CROSS JOIN d4
            ), probes AS (
                SELECT c_custkey AS key, TRUE AS present FROM customer
                UNION ALL
                SELECT c_custkey + 10000000, FALSE FROM customer
            ), checked AS (
                SELECT p.key, p.present,
                       sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) = 4
                           AS maybe_present
                FROM (SELECT key, present,
                             CAST(('0x' || substring(md5(
                                 CAST(i AS VARCHAR) || ':' || CAST(key AS VARCHAR)
                             ), 1, 15)) AS BIGINT) % 4096 AS bit
                      FROM probes CROSS JOIN d4) p
                LEFT JOIN bits b USING (bit)
                GROUP BY 1, 2
            )
            SELECT present, count(*) AS n_probes,
                   sum(CASE WHEN maybe_present THEN 1 ELSE 0 END)
                       AS n_maybe_present,
                   sum(CASE WHEN present AND NOT maybe_present
                            THEN 1 ELSE 0 END) = 0 AS no_false_negatives
            FROM checked GROUP BY 1
        """,
        "q243_portable_hll_rolling": """
            WITH ev AS (
                SELECT CAST(ts AS DATE) AS d,
                       CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
                FROM events
            ), regs AS (
                SELECT d, h & 255 AS bucket,
                       max(CASE WHEN h >> 8 = 0 THEN 53
                                ELSE instr(lpad(bin(h >> 8), 52, '0'), '1')
                           END) AS rho_max
                FROM ev GROUP BY 1, 2
            ), days AS (
                SELECT DISTINCT d FROM ev
            ), grid AS (
                SELECT d, CAST(unnest(range(256)) AS BIGINT) AS bucket FROM days
            ), g AS (
                SELECT grid.d, grid.bucket, r.rho_max,
                       date_diff('day', DATE '1970-01-01', grid.d) AS ord
                FROM grid LEFT JOIN regs r
                  ON grid.d = r.d AND grid.bucket = r.bucket
            ), merged AS (
                SELECT d, bucket,
                       coalesce(max(rho_max) OVER (PARTITION BY bucket
                           ORDER BY ord
                           RANGE BETWEEN 2 PRECEDING AND CURRENT ROW), 0)
                           AS rho
                FROM g
            ), per_day AS (
                SELECT d, sum(power(2.0, -rho)) AS z,
                       sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS zeros
                FROM merged GROUP BY 1
            ), est AS (
                SELECT d,
                       CASE WHEN 0.7213 / (1 + 1.079 / 256) * 256 * 256 / z <= 2.5 * 256
                             AND zeros > 0
                            THEN 256.0 * ln(256.0 / zeros)
                            ELSE 0.7213 / (1 + 1.079 / 256) * 256 * 256 / z
                       END AS e
                FROM per_day
            ), exact AS (
                SELECT a.d, count(DISTINCT b.h) AS n_exact
                FROM days a JOIN (SELECT DISTINCT d AS d2, h FROM ev) b
                  ON date_diff('day', DATE '1970-01-01', b.d2)
                     BETWEEN date_diff('day', DATE '1970-01-01', a.d) - 2
                         AND date_diff('day', DATE '1970-01-01', a.d)
                GROUP BY 1
            )
            SELECT e.d, round(e.e, 2) AS estimate, x.n_exact,
                   abs(e.e - x.n_exact) <= 0.2 * x.n_exact AS within_20pct
            FROM est e JOIN exact x USING (d)
        """,
        "q128_connected_components_two_phase": """
            WITH RECURSIVE e AS (
                SELECT c_custkey AS a, c_custkey + 3 AS b
                FROM customer WHERE c_custkey % 7 != 0
            ), sym AS (
                SELECT a, b FROM e UNION SELECT b, a FROM e
            ), v AS (
                SELECT DISTINCT a AS id FROM sym
            ), reach(id, r) AS (
                SELECT id, id FROM v
                UNION
                SELECT s.a, reach.r FROM sym s JOIN reach ON s.b = reach.id
            )
            SELECT id, min(r) AS comp FROM reach GROUP BY id
        """,
        "q65_median_mode": """
            WITH counts AS (
                SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
                FROM orders GROUP BY 1, 2
            ), mode AS (
                SELECT o_orderpriority,
                       arg_max(o_orderstatus,
                               lpad(CAST(cnt AS VARCHAR), 10, '0') || o_orderstatus)
                           AS mode_status
                FROM counts GROUP BY 1
            ), med AS (
                SELECT o_orderpriority,
                       round(median(o_totalprice), 2) AS median_price,
                       count(*) AS n
                FROM orders GROUP BY 1
            )
            SELECT med.o_orderpriority, median_price, n, mode_status
            FROM med JOIN mode USING (o_orderpriority)
        """,
        "q66_sorted_list_agg": """
            SELECT l_returnflag,
                   list_sort(list(DISTINCT l_linestatus)) AS statuses,
                   list_sort(list(DISTINCT CAST(l_linenumber AS BIGINT)))
                       AS linenumbers,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag
        """,
        "q67_embedding_centroid": """
            WITH e AS (
                SELECT label,
                       generate_subscripts(embedding, 1) - 1 AS pos,
                       CAST(unnest(embedding) AS DOUBLE) AS val
                FROM embeddings
            )
            SELECT label, pos,
                   round(avg(val), 4) AS centroid,
                   count(*) AS n
            FROM e GROUP BY label, pos
        """,
        "q68_first_last_window": """
            SELECT o_custkey,
                   first_value(o_totalprice) OVER w AS first_price,
                   last_value(o_totalprice) OVER w AS last_price,
                   nth_value(o_totalprice, 2) OVER w AS second_price,
                   count(*) OVER w AS n_orders
            FROM orders
            WINDOW w AS (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
            )
            QUALIFY row_number() OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ) = 1
        """,
        "q69_hash_split": """
            WITH b AS (
                SELECT o_totalprice,
                       ((instr('0123456789abcdef',
                               substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1)
                        * 16 +
                        (instr('0123456789abcdef',
                               substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1)) - 1)
                       ) % 10 AS bucket
                FROM orders
            )
            SELECT CASE WHEN bucket < 8 THEN 'train'
                        WHEN bucket = 8 THEN 'val'
                        ELSE 'test' END AS split,
                   count(*) AS n,
                   round(sum(o_totalprice), 2) AS total_price
            FROM b GROUP BY 1
        """,
        "q70_sequence_packing": r"""
            WITH d AS (
                SELECT lang, doc_id,
                       array_length(regexp_split_to_array(trim(text), '\s+'))
                           AS toks
                FROM documents
            ), o AS (
                SELECT lang, doc_id, toks,
                       COALESCE(sum(toks) OVER (
                           PARTITION BY lang ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS off
                FROM d
            )
            SELECT lang,
                   CAST(floor(off / 8192) AS BIGINT) AS bin,
                   count(*) AS n_docs,
                   sum(toks) AS tokens
            FROM o GROUP BY 1, 2
        """,
        "q71_source_share": """
            WITH per AS (
                SELECT source,
                       count(*) AS n_docs,
                       count(DISTINCT lang) AS n_langs,
                       round(avg(n_chars), 2) AS avg_chars
                FROM documents GROUP BY source
            )
            SELECT source, n_docs, n_langs, avg_chars,
                   round(n_docs / sum(n_docs) OVER (), 4) AS share
            FROM per
        """,
        "q72_normalized_dedup": """
            WITH n AS (
                SELECT lang,
                       regexp_replace(
                           regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'),
                           ' +', ' ', 'g') AS norm
                FROM documents
            )
            SELECT lang,
                   count(*) AS n_docs,
                   count(DISTINCT norm) AS n_distinct,
                   count(*) - count(DISTINCT norm) AS n_dups
            FROM n GROUP BY lang
        """,
        "q73_snapshot_diff": """
            WITH v1 AS (
                SELECT o_orderkey, o_totalprice AS price1
                FROM orders WHERE o_orderkey % 97 != 0
            ), v2 AS (
                SELECT o_orderkey,
                       CASE WHEN o_orderkey % 10 = 0
                            THEN round(o_totalprice * 1.1, 2)
                            ELSE o_totalprice END AS price2
                FROM orders WHERE o_orderkey % 89 != 0
            )
            SELECT CASE WHEN price1 IS NULL THEN 'added'
                        WHEN price2 IS NULL THEN 'removed'
                        WHEN price1 != price2 THEN 'changed'
                        ELSE 'unchanged' END AS status,
                   count(*) AS n
            FROM v1 FULL OUTER JOIN v2 USING (o_orderkey)
            GROUP BY 1
        """,
        "q74_validity_intervals": """
            WITH m AS (
                SELECT event_type, event_id, user_id,
                       epoch_ns(ts) // 1000 AS t0
                FROM events
            ), iv AS (
                SELECT event_type, t0,
                       lead(t0) OVER (
                           PARTITION BY user_id ORDER BY t0, event_id
                       ) AS t1
                FROM m
            )
            SELECT event_type,
                   count(*) AS n_events,
                   count(t1) AS n_closed,
                   round(avg((t1 - t0) / 1000000.0), 2) AS avg_valid_sec
            FROM iv GROUP BY event_type
        """,
        "q75_tfidf": r"""
            WITH terms AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)), '\s+'))
                           AS term
                FROM documents
            ), tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM terms GROUP BY doc_id, term
            ), dft AS (
                SELECT term, count(*) AS df FROM tf GROUP BY term
            ), n AS (
                SELECT count(*) AS n_docs FROM documents
            ), scored AS (
                SELECT doc_id, term,
                       tf * ln(n_docs / df) AS score
                FROM tf JOIN dft USING (term) CROSS JOIN n
            )
            SELECT doc_id, term, round(score, 4) AS tfidf
            FROM scored
            QUALIFY row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, term ASC
            ) = 1
        """,
        "q76_bigrams": r"""
            WITH t AS (
                SELECT lang,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS toks
                FROM documents
            ), b AS (
                SELECT lang,
                       unnest(list_transform(
                           generate_series(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i + 1]
                       )) AS bigram
                FROM t
            ), c AS (
                SELECT lang, bigram, count(*) AS n FROM b GROUP BY lang, bigram
            )
            SELECT lang, bigram, n,
                   CAST(row_number() OVER (
                       PARTITION BY lang ORDER BY n DESC, bigram ASC
                   ) AS INT) AS rn
            FROM c
            QUALIFY rn <= 10
        """,
        "q77_lexical_diversity": r"""
            WITH t AS (
                SELECT lang,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS toks
                FROM documents
            )
            SELECT lang,
                   count(*) AS n_docs,
                   round(avg(len(list_distinct(toks)) * 1.0 / len(toks)), 4)
                       AS avg_ttr,
                   round(avg(len(toks)), 2) AS avg_tokens
            FROM t GROUP BY lang
        """,
        "q78_range_frame": """
            WITH daily AS (
                SELECT CAST(o_orderdate AS DATE) AS d,
                       round(sum(o_totalprice), 2) AS rev
                FROM orders GROUP BY 1
            )
            SELECT CAST(d AS VARCHAR) AS day, rev,
                   round(sum(rev) OVER (
                       ORDER BY date_diff('day', DATE '1970-01-01', d)
                       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
                   ), 2) AS rev_7d
            FROM daily
        """,
        "q79_stratified_sample": f"""
            WITH b AS (
                SELECT c_mktsegment,
                       {_BUCKET_SQL} AS bucket,
                       CASE c_mktsegment
                            WHEN 'AUTOMOBILE' THEN 5000
                            WHEN 'BUILDING' THEN 2500
                            WHEN 'FURNITURE' THEN 1000
                            WHEN 'HOUSEHOLD' THEN 10000
                            WHEN 'MACHINERY' THEN 500
                       END AS thr
                FROM customer
            )
            SELECT c_mktsegment,
                   count(*) AS n_total,
                   count(*) FILTER (WHERE bucket < thr) AS n_kept,
                   round((count(*) FILTER (WHERE bucket < thr)) * 1.0 / count(*), 4)
                       AS rate
            FROM b GROUP BY c_mktsegment
        """,
        "q80_deterministic_shuffle": """
            WITH top AS (
                SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
                FROM documents ORDER BY h, doc_id LIMIT 100
            )
            SELECT doc_id,
                   CAST(row_number() OVER (ORDER BY h, doc_id) AS INT)
                       AS shuffle_rank
            FROM top
        """,
        "q81_chunking": r"""
            WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS toks
                FROM documents
            ), c AS (
                SELECT doc_id, len(toks) AS n_tokens,
                       list_transform(
                           generate_series(0, CAST(floor((len(toks) - 1) / 48) AS INT)),
                           i -> len(list_slice(toks, i * 48 + 1, i * 48 + 64))
                       ) AS cs
                FROM t
            )
            SELECT doc_id, n_tokens,
                   len(cs) AS n_chunks,
                   list_sum(cs) AS chunk_tokens
            FROM c
        """,
        "q82_reaggregate": """
            WITH daily AS (
                SELECT CAST(o_orderdate AS DATE) AS d,
                       sum(o_totalprice) AS s,
                       count(*) AS c,
                       min(o_totalprice) AS mn,
                       max(o_totalprice) AS mx
                FROM orders GROUP BY 1
            )
            SELECT strftime(d, '%Y-%m') AS month,
                   sum(c) AS n,
                   round(sum(s), 2) AS total,
                   round(min(mn), 2) AS min_price,
                   round(max(mx), 2) AS max_price,
                   round(sum(s) / sum(c), 2) AS avg_price
            FROM daily GROUP BY 1
        """,
        "q83_funnel": """
            WITH ev AS (
                SELECT user_id, event_type, epoch_ns(ts) // 1000 AS t
                FROM events
            ), v AS (
                SELECT user_id, min(t) AS t_view FROM ev
                WHERE event_type = 'view' GROUP BY 1
            ), c AS (
                SELECT user_id, min(t) AS t_click
                FROM ev JOIN v USING (user_id)
                WHERE event_type = 'click' AND t >= t_view GROUP BY 1
            ), p AS (
                SELECT user_id, min(t) AS t_purchase
                FROM ev JOIN c USING (user_id)
                WHERE event_type = 'purchase' AND t >= t_click GROUP BY 1
            ), u AS (
                SELECT DISTINCT user_id FROM ev
            )
            SELECT count(*) AS n_users,
                   count(t_view) AS n_viewed,
                   count(t_click) AS n_clicked,
                   count(t_purchase) AS n_purchased,
                   round(count(t_purchase) * 1.0 / count(t_view), 4)
                       AS view_to_purchase
            FROM u
            LEFT JOIN v USING (user_id)
            LEFT JOIN c USING (user_id)
            LEFT JOIN p USING (user_id)
        """,
        "q84_dq_report": """
            SELECT 'orders_null_custkey' AS check,
                   CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS n
            FROM orders
            UNION ALL
            SELECT 'orders_dup_orderkey',
                   CAST(count(*) FILTER (WHERE c > 1) AS BIGINT)
            FROM (SELECT o_orderkey, count(*) AS c FROM orders GROUP BY 1)
            UNION ALL
            SELECT 'orders_orphan_custkey', CAST(count(*) AS BIGINT)
            FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
            UNION ALL
            SELECT 'orders_nonpositive_price',
                   CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'lineitem_dup_line',
                   CAST(count(*) FILTER (WHERE c > 1) AS BIGINT)
            FROM (SELECT l_orderkey, l_linenumber, count(*) AS c
                  FROM lineitem GROUP BY 1, 2)
            UNION ALL
            SELECT 'lineitem_discount_range',
                   CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)
                        AS BIGINT)
            FROM lineitem
        """,
        "q85_zvalue_parity": f"""
            SELECT c_custkey, {_Z_SQL} AS z FROM customer
        """,
        "q86_shipping_priority": """
            SELECT l_orderkey,
                   strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS orderdate,
                   round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                                  AS BIGINT)) / 100.0, 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1997-06-01'
              AND l_shipdate > TIMESTAMP '1997-06-01'
            GROUP BY 1, 2
            HAVING round(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                                  AS BIGINT)) / 100.0, 2) > 100000.0
        """,
        "q87_local_supplier_volume": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_lineitems
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE c_nationkey = s_nationkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY 1
        """,
        "q88_late_shipment_priority": """
            SELECT o_orderpriority, count(*) AS n_late_orders
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
              AND EXISTS (
                  SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
              )
            GROUP BY 1
        """,
        "q89_top_supplier": """
            WITH rev AS (
                SELECT l_suppkey,
                       round(sum(l_extendedprice * (1 - l_discount)), 2)
                           AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l_shipdate < TIMESTAMP '1997-04-01'
                GROUP BY 1
            )
            SELECT s_suppkey, s_name, total_revenue
            FROM rev JOIN supplier ON l_suppkey = s_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        """,
        "q90_concurrent_sessions": """
            WITH ev AS (
                SELECT event_type, epoch_ns(ts) // 1000 AS t FROM events
            ), d AS (
                SELECT event_type, t, 1 AS d FROM ev
                UNION ALL
                SELECT event_type, t + 300000000, -1 FROM ev
            ), r AS (
                SELECT event_type,
                       sum(d) OVER (PARTITION BY event_type ORDER BY t, d
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS c
                FROM d
            )
            SELECT event_type, CAST(max(c) AS BIGINT) AS peak_concurrency
            FROM r GROUP BY 1
        """,
        "q91_event_entropy": """
            WITH counts AS (
                SELECT user_id, event_type, count(*) AS c
                FROM events GROUP BY 1, 2
            ), p AS (
                SELECT user_id, c,
                       c * 1.0 / sum(c) OVER (PARTITION BY user_id) AS pr
                FROM counts
            )
            SELECT user_id, sum(c) AS n_events,
                   round(-sum(pr * ln(pr)), 4) AS entropy
            FROM p GROUP BY 1
        """,
        "q92_markov_transitions": """
            WITH seq AS (
                SELECT event_type,
                       lead(event_type) OVER (
                           PARTITION BY user_id
                           ORDER BY epoch_ns(ts) // 1000, event_id
                       ) AS next_type
                FROM events
            ), counts AS (
                SELECT event_type, next_type, count(*) AS n
                FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
            )
            SELECT event_type, next_type, n,
                   round(n * 1.0 / sum(n) OVER (PARTITION BY event_type), 4) AS p
            FROM counts
        """,
        "q93_heavy_hitters": """
            WITH k AS (
                SELECT CASE WHEN l_orderkey % 3 = 0
                            THEN 'hot-' || CAST(l_orderkey % 2 AS VARCHAR)
                            ELSE 'cold-' || CAST(l_orderkey AS VARCHAR)
                       END AS value
                FROM lineitem
            )
            SELECT value, count(*) AS n,
                   round(count(*) * 1.0 / (SELECT count(*) FROM k), 4) AS share
            FROM k GROUP BY 1
            HAVING count(*) > 0.10 * (SELECT count(*) FROM k)
        """,
        "q94_near_dup_canonicalize": r"""
            WITH RECURSIVE toks AS (
                SELECT doc_id, lang, source,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS t
                FROM documents
            ), sh AS (
                SELECT doc_id, lang, source,
                       list_distinct(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) AS s
                FROM toks
            ), ex AS (
                SELECT doc_id, lang, source, len(s) AS sz, unnest(s) AS g FROM sh
            ), inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       a.sz AS sz_a, b.sz AS sz_b, count(*) AS n_common
                FROM ex a JOIN ex b
                  ON a.g = b.g AND a.doc_id < b.doc_id
                 AND a.lang = b.lang AND a.source = b.source
                GROUP BY 1, 2, 3, 4
            ), pairs AS (
                SELECT id_a, id_b FROM inter
                WHERE n_common / (sz_a + sz_b - n_common) >= 0.5
            ), sym AS (
                SELECT id_a AS a, id_b AS b FROM pairs
                UNION SELECT id_b, id_a FROM pairs
            ), v AS (
                SELECT DISTINCT a AS id FROM sym
            ), reach(id, r) AS (
                SELECT id, id FROM v
                UNION
                SELECT s.a, reach.r FROM sym s JOIN reach ON s.b = reach.id
            ), comp AS (
                SELECT id, min(r) AS comp FROM reach GROUP BY id
            )
            SELECT d.doc_id AS id,
                   coalesce(comp.comp, d.doc_id) AS cluster,
                   d.doc_id = coalesce(comp.comp, d.doc_id) AS keep
            FROM documents d LEFT JOIN comp ON d.doc_id = comp.id
        """,
        "q95_topk_per_group": """
            SELECT p_brand, p_partkey, p_retailprice, rnk
            FROM (
                SELECT p_brand, p_partkey, p_retailprice,
                       CAST(dense_rank() OVER (
                           PARTITION BY p_brand
                           ORDER BY p_retailprice DESC, p_partkey
                       ) AS INT) AS rnk
                FROM part
            ) WHERE rnk <= 3
        """,
        "q96_gap_islands": """
            WITH days AS (
                SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
            ), isl AS (
                SELECT user_id,
                       d - CAST(row_number() OVER (
                           PARTITION BY user_id ORDER BY d) AS INT) AS isl
                FROM days
            ), streaks AS (
                SELECT user_id, isl, count(*) AS len
                FROM isl GROUP BY 1, 2
            )
            SELECT user_id, count(*) AS n_streaks,
                   max(len) AS longest_streak,
                   sum(len) AS active_days
            FROM streaks GROUP BY 1
        """,
        "q98_weighted_sample": """
            WITH dg AS (
                SELECT source, doc_id, n_chars,
                       instr('0123456789abcdef',
                             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS d1,
                       instr('0123456789abcdef',
                             substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS d2,
                       instr('0123456789abcdef',
                             substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1 AS d3,
                       instr('0123456789abcdef',
                             substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1 AS d4
                FROM documents
            ), r AS (
                SELECT source, doc_id, n_chars,
                       (CAST(((d1 * 16 + d2) * 16 + d3) * 16 + d4 AS BIGINT)
                        * 1000000) // greatest(n_chars, 1) AS prio
                FROM dg
            )
            SELECT source, doc_id, n_chars, prio,
                   CAST(rn AS INT) AS rn
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY source ORDER BY prio, doc_id) AS rn
                FROM r
            ) WHERE rn <= 5
        """,
        "q99_nation_pair_volume": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INT) AS l_year,
                   round(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                                  AS BIGINT)) / 100.0, 2) AS volume
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            GROUP BY 1, 2, 3
        """,
        "q100_market_share": """
            WITH j AS (
                SELECT year(o_orderdate) AS o_year,
                       CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                            AS BIGINT) AS cents,
                       sn.n_name AS supp_nation
                FROM lineitem
                JOIN part ON l_partkey = p_partkey
                JOIN orders ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation cn ON c_nationkey = cn.n_nationkey
                JOIN region ON cn.n_regionkey = r_regionkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation sn ON s_nationkey = sn.n_nationkey
                WHERE p_type = 'STANDARD' AND r_name = 'EUROPE'
            )
            SELECT CAST(o_year AS INT) AS o_year,
                   round(sum(CASE WHEN supp_nation = 'NATION_3'
                                  THEN cents ELSE 0 END) / sum(cents), 6)
                       AS mkt_share,
                   round(sum(cents) / 100.0, 2) AS total_volume
            FROM j GROUP BY 1
        """,
        "q101_product_profit": """
            SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
                   round(sum(CAST(round((l_extendedprice * (1.0 - l_discount)
                                         - 0.6 * p_retailprice * l_quantity) * 100)
                                  AS BIGINT)) / 100.0, 2) AS sum_profit
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_type = 'PROMO'
            GROUP BY 1, 2
        """,
        "q102_large_orders": """
            WITH big AS (
                SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
                FROM lineitem GROUP BY 1 HAVING round(sum(l_quantity), 2) > 260.0
            )
            SELECT c_name, c_custkey, l_orderkey,
                   strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS orderdate,
                   o_totalprice, sum_qty
            FROM big
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
        """,
        "q103_sole_late_supplier": """
            WITH per_os AS (
                SELECT l_orderkey, l_suppkey,
                       max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                                THEN 1 ELSE 0 END) AS late
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                GROUP BY 1, 2
            ), flagged AS (
                SELECT l_suppkey,
                       count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
                       sum(late) OVER (PARTITION BY l_orderkey) AS n_late,
                       late
                FROM per_os
            )
            SELECT s_name, l_suppkey, count(*) AS numwait
            FROM flagged JOIN supplier ON l_suppkey = s_suppkey
            WHERE late = 1 AND n_supp >= 2 AND n_late = 1
            GROUP BY 1, 2
        """,
        "q104_idle_rich_customers": """
            SELECT c_nationkey, count(*) AS numcust,
                   round(sum(c_acctbal), 2) AS totacctbal
            FROM customer
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                               WHERE c_acctbal > 0)
              AND NOT EXISTS (
                  SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
            GROUP BY 1
        """,
        "q105_cheapest_supplier": """
            WITH offers AS (
                SELECT l_partkey, l_suppkey,
                       min(CAST(round(l_extendedprice / l_quantity * 100)
                                AS BIGINT)) AS unit_cents
                FROM lineitem
                JOIN part ON l_partkey = p_partkey
                WHERE p_type = 'SMALL' AND p_size < 15
                GROUP BY 1, 2
            )
            SELECT l_partkey AS p_partkey, l_suppkey AS best_suppkey,
                   round(unit_cents / 100.0, 2) AS best_unit_price
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY l_partkey ORDER BY unit_cents, l_suppkey) AS rn
                FROM offers
            ) WHERE rn = 1
        """,
        "q106_important_parts": """
            WITH per_part AS (
                SELECT l_partkey,
                       sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                                AS BIGINT)) AS cents
                FROM lineitem GROUP BY 1
            )
            SELECT l_partkey,
                   round(cents / 100.0, 2) AS part_revenue,
                   round(cents / (sum(cents) OVER ()), 6) AS revenue_share
            FROM per_part
            QUALIFY cents > (sum(cents) OVER ()) * 0.0005
        """,
        "q107_repetition_ratio": r"""
            WITH t AS (
                SELECT lang, source,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS toks
                FROM documents
            ), tri AS (
                SELECT lang, source,
                       list_transform(
                           generate_series(1, len(toks) - 2),
                           i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
                       ) AS grams
                FROM t
                WHERE len(toks) >= 3
            ), per_doc AS (
                SELECT lang, source,
                       (len(grams) - len(list_distinct(grams)))
                           * 1.0 / len(grams) AS rep
                FROM tri
            )
            SELECT lang, source, count(*) AS n_docs,
                   round(avg(rep), 4) AS avg_repetition,
                   round(max(rep), 4) AS max_repetition
            FROM per_doc GROUP BY 1, 2
        """,
        "q108_decontamination": r"""
            WITH g AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           generate_series(1, len(toks) - 3),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                || ' ' || toks[i+3]
                       )) AS g5
                FROM (SELECT doc_id,
                             regexp_split_to_array(lower(trim(text)), '\s+') AS toks
                      FROM documents)
                WHERE len(toks) >= 4
            ), ev AS (
                SELECT DISTINCT unnest(g5) AS gram FROM g WHERE doc_id % 97 = 0
            ), train AS (
                SELECT doc_id, unnest(g5) AS gram FROM g WHERE doc_id % 97 <> 0
            )
            SELECT doc_id, count(*) AS n_contaminated_grams
            FROM train JOIN ev USING (gram)
            GROUP BY 1
        """,
        "q109_cohort_retention": """
            WITH days AS (
                SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
            ), first AS (
                SELECT user_id, min(d) AS d0 FROM days GROUP BY 1
            )
            SELECT CAST(d0 AS VARCHAR) AS cohort,
                   CAST(date_diff('day', d0, d) AS INT) AS day_offset,
                   count(DISTINCT user_id) AS n_users
            FROM days JOIN first USING (user_id)
            WHERE date_diff('day', d0, d) BETWEEN 0 AND 7
            GROUP BY 1, 2
        """,
        "q110_mixture_epochs": """
            WITH w AS (
                SELECT doc_id, source,
                       (CAST(substr(source, 4) AS INT) % 4) * 9 + 5 AS w_tenths,
                       ((((instr('0123456789abcdef',
                                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                          + instr('0123456789abcdef',
                                  substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 16
                          + instr('0123456789abcdef',
                                  substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
                          + instr('0123456789abcdef',
                                  substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1) AS h
                FROM documents
            ), k AS (
                SELECT doc_id, source,
                       w_tenths // 10
                       + CASE WHEN h * 10 < (w_tenths % 10) * 65536
                              THEN 1 ELSE 0 END AS k
                FROM w
            )
            SELECT doc_id, source, CAST(unnest(generate_series(1, k)) AS INT) AS epoch
            FROM k WHERE k >= 1
        """,
        "q111_group_integrity_split": """
            WITH b AS (
                SELECT event_id, user_id,
                       ((instr('0123456789abcdef',
                               substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) * 16
                        + instr('0123456789abcdef',
                                substr(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1)
                       % 10 AS bucket
                FROM events
            )
            SELECT CASE WHEN bucket < 8 THEN 'train'
                        WHEN bucket < 9 THEN 'val'
                        ELSE 'test' END AS split,
                   count(*) AS n_events,
                   count(DISTINCT user_id) AS n_users
            FROM b GROUP BY 1
        """,
        "q112_token_budget_trim": r"""
            WITH d AS (
                SELECT source, doc_id, n_chars,
                       array_length(regexp_split_to_array(trim(text), '\s+'))
                           AS toks
                FROM documents
            ), o AS (
                SELECT source, doc_id, toks,
                       coalesce(sum(toks) OVER (
                           PARTITION BY source
                           ORDER BY n_chars DESC, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS prior
                FROM d
            )
            SELECT source, count(*) AS n_docs, sum(toks) AS tokens,
                   max(prior) AS last_offset
            FROM o WHERE prior < 10000 GROUP BY 1
        """,
        "q113_forecast_revenue": """
            SELECT round(sum(CAST(round(l_extendedprice * l_discount * 100, 0)
                                  AS BIGINT)) / 100.0, 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "q114_returned_items": """
            WITH co AS (
                SELECT c_custkey, c_name, c_acctbal, n_name
                FROM customer JOIN nation ON c_nationkey = n_nationkey
            )
            SELECT co.c_custkey, co.c_name, co.n_name,
                   round(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100, 0)
                                  AS BIGINT)) / 100.0, 2) AS revenue,
                   round(max(co.c_acctbal), 2) AS c_acctbal
            FROM lineitem li
            JOIN orders o ON li.l_orderkey = o.o_orderkey
            JOIN co ON o.o_custkey = co.c_custkey
            WHERE li.l_returnflag = 'R'
              AND o.o_orderdate >= TIMESTAMP '1996-10-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY 1, 2, 3
            HAVING revenue > 50000.0
        """,
        "q115_priority_shipment_classes": """
            SELECT l_linestatus,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS high_line_count,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_shipdate > o_orderdate + INTERVAL 90 DAY
            GROUP BY 1
        """,
        "q116_order_count_distribution": """
            WITH per_cust AS (
                SELECT c.c_custkey, count(o.o_orderkey) AS c_count
                FROM customer c
                LEFT OUTER JOIN (
                    SELECT * FROM orders
                    WHERE o_orderpriority <> '4-NOT SPECIFIED'
                ) o ON c.c_custkey = o.o_custkey
                GROUP BY 1
            )
            SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY 1
        """,
        "q117_promo_revenue": """
            WITH j AS (
                SELECT CAST(round(l_extendedprice * (1.0 - l_discount) * 100, 0)
                            AS BIGINT) AS cents,
                       p_type
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE l_shipdate >= TIMESTAMP '1997-03-01'
                  AND l_shipdate < TIMESTAMP '1997-04-01'
            )
            SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN cents
                                          ELSE 0 END) / sum(cents), 4)
                       AS promo_revenue_pct,
                   round(sum(cents) / 100.0, 2) AS total_revenue
            FROM j
        """,
        "q118_small_quantity_revenue": """
            WITH branded AS (
                SELECT l_partkey, l_extendedprice,
                       CAST(round(l_quantity * 100, 0) AS BIGINT) AS qty_cents
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE p_brand = 'Brand#23'
            ), per_part AS (
                SELECT l_partkey AS agg_partkey,
                       sum(qty_cents) AS sum_qty_cents,
                       count(*) AS n_lines
                FROM branded GROUP BY 1
            )
            SELECT round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                         / 700.0, 2) AS avg_yearly,
                   count(*) AS n_small
            FROM branded b JOIN per_part p ON b.l_partkey = p.agg_partkey
            WHERE b.qty_cents * 5 * p.n_lines < p.sum_qty_cents * 100
        """,
        "q127_salted_skew_join": """
            SELECT s_nationkey,
                   count(*) AS n_items,
                   round(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100, 0)
                                  AS BIGINT)) / 100.0, 2) AS revenue
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY s_nationkey
        """,
        "q119_disjunctive_predicate_join": """
            SELECT round(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100, 0)
                                  AS BIGINT)) / 100.0, 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "q120_segment_dedup_fraction": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), segs AS (
                SELECT doc_id,
                       unnest(list_transform(range(len(t) // 10),
                           i -> CAST(('0x' || substring(md5(
                               array_to_string(t[i * 10 + 1 : i * 10 + 10], ' ')
                           ), 1, 15)) AS BIGINT)))
                           AS seg
                FROM toks
            ), stats AS (
                SELECT seg, count(DISTINCT doc_id) AS nd FROM segs GROUP BY 1
            )
            SELECT s.doc_id, count(*) AS n_segments,
                   round(sum(CASE WHEN st.nd > 1 THEN 1 ELSE 0 END) * 1.0
                         / count(*), 4) AS dup_fraction
            FROM segs s JOIN stats st ON s.seg = st.seg
            GROUP BY 1
        """,
        "q121_winnowing_fingerprints": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), grams AS (
                SELECT doc_id, len(t) AS n_toks,
                       unnest(range(CASE WHEN len(t) >= 5 THEN len(t) - 4
                                         ELSE 0 END)) AS pos,
                       unnest(list_transform(
                           range(CASE WHEN len(t) >= 5 THEN len(t) - 4
                                      ELSE 0 END),
                           i -> array_to_string(t[i + 1 : i + 5], ' ')))
                           AS gram
                FROM toks
            ), h AS (
                SELECT doc_id, n_toks, pos,
                       CAST((((((instr('0123456789abcdef', substr(md5(gram), 1, 1)) - 1)
                           * 16 + (instr('0123456789abcdef', substr(md5(gram), 2, 1)) - 1))
                           * 16 + (instr('0123456789abcdef', substr(md5(gram), 3, 1)) - 1))
                           * 16 + (instr('0123456789abcdef', substr(md5(gram), 4, 1)) - 1))
                           * 16 + (instr('0123456789abcdef', substr(md5(gram), 5, 1)) - 1))
                           * 16 + (instr('0123456789abcdef', substr(md5(gram), 6, 1)) - 1)
                           AS BIGINT) AS h
                FROM grams
            ), m AS (
                SELECT doc_id, n_toks, pos,
                       min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
                           AS minh
                FROM h
            )
            SELECT doc_id, count(DISTINCT minh) AS n_fingerprints,
                   sum(DISTINCT minh) AS fingerprint_sum
            FROM m WHERE pos <= n_toks - 8
            GROUP BY 1
        """,
        "q122_semantic_dedup": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            ), c AS (
                SELECT vec_id AS cid, v AS cv FROM e
                WHERE vec_id < (SELECT greatest(8, CAST(floor(sqrt(count(*)))
                                                        AS BIGINT))
                                FROM e)
            ), scored AS (
                SELECT e.vec_id, e.v, c.cid,
                       round(list_cosine_similarity(e.v, c.cv), 4) + 0 AS cs
                FROM e CROSS JOIN c
            ), assigned AS (
                SELECT vec_id, v, cid AS cluster FROM (
                    SELECT *, row_number() OVER (PARTITION BY vec_id
                                                 ORDER BY cs DESC, cid) AS rn
                    FROM scored
                ) WHERE rn = 1
            ), dropped AS (
                SELECT DISTINCT b.vec_id
                FROM assigned a
                JOIN assigned b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
                WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.25
            )
            SELECT a.vec_id, a.cluster, d.vec_id IS NULL AS keep
            FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
        """,
        "q123_bigram_perplexity": r"""
            WITH toks AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\s+') AS t
                FROM documents
            ), bg AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(t)),
                           i -> t[i] || ' ' || t[i + 1])) AS g
                FROM toks
            ), cnt2 AS (
                SELECT g, count(*) AS c2 FROM bg GROUP BY g
            ), cnt1 AS (
                SELECT split_part(g, ' ', 1) AS w1, count(*) AS c1
                FROM bg GROUP BY 1
            ), vocab AS (
                SELECT count(DISTINCT w) AS v
                FROM (SELECT unnest(t) AS w FROM toks)
            )
            SELECT doc_id, count(*) AS n_bigrams,
                   round(avg(ln(c1 + v) - ln(c2 + 1)), 4) AS avg_nll
            FROM bg
            JOIN cnt2 USING (g)
            JOIN cnt1 ON split_part(g, ' ', 1) = cnt1.w1
            CROSS JOIN vocab
            GROUP BY doc_id
        """,
        "q124_supplier_part_classes": """
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
              AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
            GROUP BY 1, 2, 3
        """,
        "q125_dominant_suppliers": """
            WITH per_ps AS (
                SELECT l_partkey, l_suppkey,
                       sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS sq
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l_shipdate < TIMESTAMP '1998-01-01'
                GROUP BY 1, 2
            ), dom AS (
                SELECT DISTINCT l_suppkey FROM (
                    SELECT l_suppkey, sq,
                           sum(sq) OVER (PARTITION BY l_partkey) AS total
                    FROM per_ps
                ) WHERE sq * 10 > total * 3
            )
            SELECT s_suppkey, s_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_9'
            WHERE s_suppkey IN (SELECT l_suppkey FROM dom)
        """,
        # q97: approx_percentile sketch values are engine-specific —
        # rows-only; 1%-of-exact tolerance pinned in tests/test_ext_ops.py.
        # q64: HLL sketch values are implementation-specific — rows-only;
        # the 3-sigma accuracy contract is pinned in tests/test_ext_ops.py.
        "q40_frame_sample": """
            WITH d AS (
                SELECT doc_id, text, octet_length(encode(text)) AS nb
                FROM documents WHERE doc_id < 50
            )
            SELECT CAST(doc_id AS VARCHAR) AS asset_id,
                   CAST(u.i AS INTEGER) AS frame_idx,
                   substring(sha256(text || '#' || CAST(u.i AS VARCHAR)), 1, 12)
                       AS frame_crc
            FROM d, UNNEST(range(least(greatest(nb // 64, 1), 32))) AS u(i)
        """,
        "q126_ann_bruteforce_vectorized": """
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                FROM embeddings WHERE vec_id < 10
            ), c AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
                FROM embeddings WHERE vec_id >= 10
            ), scored AS (
                SELECT q.query_id, c.vec_id,
                       round(list_cosine_similarity(q.qv, c.cv), 4) + 0 AS score
                FROM q CROSS JOIN c
            )
            SELECT query_id, vec_id, rank FROM (
                SELECT query_id, vec_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, vec_id) AS rank
                FROM scored
            ) WHERE rank <= 5
        """,
        "q28_merge_three_versions": """
            WITH v1 AS (
                SELECT CAST(c_custkey AS VARCHAR) AS Connect_ID,
                       CASE WHEN c_custkey % 7 = 0 THEN NULL
                            ELSE c_mktsegment END AS common_col,
                       'u1-' || CAST(c_custkey % 19 AS VARCHAR) AS uniq_v1
                FROM customer WHERE c_custkey % 2 = 0
            ), v2 AS (
                SELECT CAST(c_custkey AS VARCHAR) AS Connect_ID,
                       CASE WHEN c_custkey % 5 = 0 THEN NULL
                            ELSE 's2:' || c_mktsegment END AS common_col,
                       'u2-' || CAST(c_custkey % 23 AS VARCHAR) AS uniq_v2
                FROM customer WHERE c_custkey % 3 = 0
            ), v3 AS (
                SELECT CAST(c_custkey AS VARCHAR) AS Connect_ID,
                       's3:' || c_mktsegment AS common_col,
                       CAST(c_nationkey AS VARCHAR) AS uniq_v3
                FROM customer WHERE c_custkey % 5 = 0
            )
            SELECT coalesce(v1.Connect_ID, v2.Connect_ID, v3.Connect_ID) AS Connect_ID,
                   coalesce(v1.common_col, v2.common_col, v3.common_col) AS common_col,
                   v1.uniq_v1 AS uniq_v1,
                   v2.uniq_v2 AS uniq_v2,
                   v3.uniq_v3 AS uniq_v3
            FROM v3
            FULL OUTER JOIN v2 ON v3.Connect_ID = v2.Connect_ID
            FULL OUTER JOIN v1 ON v3.Connect_ID = v1.Connect_ID
        """,
    }


if __name__ == "__main__":
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    df = entry(spark)
    df.show()
    print("rows:", df.count())
