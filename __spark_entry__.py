"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is the Spark-first implementation of an operator
family from SURVEY.md §2 (plus the training-data ops: dedup, similarity,
text analysis), expressed over the driver's testdata tables; the matching
``oracle_sql()`` entry is the ANSI-SQL equivalent DuckDB runs on the same
parquet.  Column names/types are aligned on both sides; floats rounded,
timestamps compared as epoch microseconds.

The transcripts pipeline itself (the primary deliverable) is gated by
pytest (tests/test_pipeline.py pinned-corpus goldens); see
tapes_spark/pipeline.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # driver parquet stores naive timestamps (TIMESTAMP_NTZ); session tz is
    # UTC, so a cast to TIMESTAMP is lossless and matches DuckDB's epoch_us
    for f in df.schema.fields:
        if f.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


# --------------------------------------------------------------------------
# flagship: sessionized event-stream rollup (the log-pipeline signature op:
# stable per-key ordering -> gap-based session assignment -> rollup;
# ST1-ST7/A6 analog of the transcripts pipeline on the events table)
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    return q_sessionize(spark, SF_DEFAULT)


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min idle gap) + per-session rollup."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    with_breaks = ev.withColumn(
        "is_new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = with_breaks.withColumn(
        "session_idx", F.sum("is_new_session").over(w_cum)
    )
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.unix_micros("ts")).alias("started_us"),
            F.max(F.unix_micros("ts")).alias("ended_us"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .withColumn("duration_us", F.col("ended_us") - F.col("started_us"))
    )


_SESSIONIZE_SQL = """
WITH gaps AS (
  SELECT user_id, event_id, ts, event_type, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30*60*1000000
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, CAST(sum(is_new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM gaps
)
SELECT user_id, session_idx,
       count(*) AS n_events,
       min(epoch_us(ts)) AS started_us,
       max(epoch_us(ts)) AS ended_us,
       count(*) FILTER (WHERE event_type = 'error') AS n_errors,
       round(sum(value), 2) AS total_value,
       max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
FROM sess GROUP BY user_id, session_idx
"""


# --------------------------------------------------------------------------
# A1/A6 hash-aggregate rollup (lineitem pricing summary)
# --------------------------------------------------------------------------

def q_pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# A7 windowed stats (time-window filter + conditional aggregates)
# --------------------------------------------------------------------------

def q_windowed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-20").cast("timestamp"))
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                "n_purchases"
            ),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(
                F.avg(F.when(F.col("event_type") == "purchase", F.col("value"))), 4
            ).alias("avg_purchase_value"),
        )
    )


_WINDOWED_SQL = """
SELECT count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       count(*) FILTER (WHERE event_type = 'error') AS n_errors,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
       round(sum(value), 2) AS total_value,
       round(avg(value) FILTER (WHERE event_type = 'purchase'), 4)
           AS avg_purchase_value
FROM events
WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
"""


# --------------------------------------------------------------------------
# C1 route counts (the rule-ladder fan-out histogram)
# --------------------------------------------------------------------------

def q_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    routed = ev.withColumn(
        "sink",
        F.when(F.col("event_type") == "error", "error_tape")
        .when(F.col("event_type").isin("purchase", "signup"), "conversion_tape")
        .otherwise("activity_tape"),
    )
    return routed.groupBy("sink").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
    )


_ROUTE_SQL = """
SELECT CASE WHEN event_type = 'error' THEN 'error_tape'
            WHEN event_type IN ('purchase', 'signup') THEN 'conversion_tape'
            ELSE 'activity_tape' END AS sink,
       count(*) AS n_rows,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1
"""


# --------------------------------------------------------------------------
# lag() latency deltas (the north_rule's per-conversation latency op)
# --------------------------------------------------------------------------

def q_latency_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return (
        ev.withColumn("delta_us", delta)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("delta_us").alias("min_delta_us"),
            F.round(F.avg("delta_us"), 2).alias("avg_delta_us"),
            F.max("delta_us").alias("max_delta_us"),
        )
    )


_LATENCY_SQL = """
WITH d AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id)) AS delta_us
  FROM events
)
SELECT user_id, count(*) AS n_events,
       min(delta_us) AS min_delta_us,
       round(avg(delta_us), 2) AS avg_delta_us,
       max(delta_us) AS max_delta_us
FROM d GROUP BY user_id
"""


# --------------------------------------------------------------------------
# J14 first-row-per-group pick (genuine-preview join analog)
# --------------------------------------------------------------------------

def q_first_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
        )
    )


_FIRST_EVENT_SQL = """
SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# J1 ordered first-capture dedup (row_number, NOT dropDuplicates)
# --------------------------------------------------------------------------

def q_ordered_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event_id"))
    )


_ORDERED_DEDUP_SQL = """
SELECT user_id, event_type, event_id AS first_event_id
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# O3 keyset pagination (tuple-compare cursor)
# --------------------------------------------------------------------------

def q_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cursor_date = F.lit("1996-06-01").cast("timestamp")
    cursor_key = F.lit(100)
    return (
        orders.filter(
            (F.col("o_orderdate") > cursor_date)
            | ((F.col("o_orderdate") == cursor_date) & (F.col("o_orderkey") > cursor_key))
        )
        .orderBy("o_orderdate", "o_orderkey")
        .limit(50)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.unix_micros("o_orderdate").alias("o_orderdate_us"),
        )
    )


_KEYSET_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       round(o_totalprice, 2) AS o_totalprice,
       epoch_us(o_orderdate) AS o_orderdate_us
FROM orders
WHERE o_orderdate > TIMESTAMP '1996-06-01'
   OR (o_orderdate = TIMESTAMP '1996-06-01' AND o_orderkey > 100)
ORDER BY o_orderdate, o_orderkey
LIMIT 50
"""


# --------------------------------------------------------------------------
# J10 broadcast-join enrichment (fact x two dims -> revenue rollup)
# --------------------------------------------------------------------------

def q_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    dim = F.broadcast(
        supp.join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(dim, li["l_suppkey"] == dim["s_suppkey"])
        .groupBy("n_name", "p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


_BROADCAST_SQL = """
SELECT n_name, p_brand,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, p_brand
"""


# --------------------------------------------------------------------------
# O4 top-k per group
# --------------------------------------------------------------------------

def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "o_custkey",
            "rank",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )


_TOPK_SQL = """
SELECT o_custkey, rank, o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders
) WHERE rank <= 3
"""


# --------------------------------------------------------------------------
# A6 mode (most-frequent value per group, count desc then value asc)
# --------------------------------------------------------------------------

def q_mode_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").count()
    w = Window.partitionBy("user_id").orderBy(
        F.col("count").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_event_type"),
            F.col("count").alias("mode_count"),
        )
    )


_MODE_SQL = """
SELECT user_id, event_type AS mode_event_type, cnt AS mode_count
FROM (
  SELECT user_id, event_type, count(*) AS cnt,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type ASC) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# JSON payload extraction (the JSONB analog: props -> typed column)
# --------------------------------------------------------------------------

def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
    )


_JSON_SQL = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS sum_k,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# dedup: exact + fingerprint (training-data ops over documents)
# --------------------------------------------------------------------------

def q_exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tapes_spark.operators.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents")
    d = exact_dedup(docs)
    return d.agg(
        F.count("*").alias("n_distinct_texts"),
        F.sum("n_copies").alias("n_docs"),
        F.count(F.when(F.col("n_copies") > 1, 1)).alias("n_dup_groups"),
    )


_EXACT_DEDUP_SQL = """
WITH g AS (
  SELECT sha256(text) AS text_hash, min(doc_id) AS canonical_doc_id,
         count(*) AS n_copies
  FROM documents GROUP BY 1
)
SELECT count(*) AS n_distinct_texts, CAST(sum(n_copies) AS BIGINT) AS n_docs,
       count(*) FILTER (WHERE n_copies > 1) AS n_dup_groups
FROM g
"""


def q_fingerprint_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tapes_spark.operators.dedup import fingerprint_dedup

    docs = _t(spark, sf_dir, "documents")
    return fingerprint_dedup(docs).select(
        "fingerprint", "canonical_doc_id", "n_copies"
    )


_FINGERPRINT_SQL = """
SELECT sha256(array_to_string(list_sort(list_filter(list_distinct(
           string_split_regex(text, '\\s+')), t -> t != '')), ' ')) AS fingerprint,
       min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies
FROM documents GROUP BY 1
"""


# --------------------------------------------------------------------------
# n-gram (word-set) Jaccard near-dup pairs — oracle-checkable baseline
# --------------------------------------------------------------------------

def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tapes_spark.operators.dedup import jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return jaccard_pairs(docs, threshold=0.8)


_JACCARD_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(list_distinct(string_split_regex(text, '\\s+')),
                     t -> t != '')) AS token
  FROM documents
), sizes AS (
  SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY 1
), shared AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS shared
  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc1, doc2,
       round(shared * 1.0 / (sa.n_tokens + sb.n_tokens - shared), 4) AS jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = doc1
JOIN sizes sb ON sb.doc_id = doc2
WHERE round(shared * 1.0 / (sa.n_tokens + sb.n_tokens - shared), 4) >= 0.8
"""


# --------------------------------------------------------------------------
# text analysis: token stats, quality, language-ID accuracy
# --------------------------------------------------------------------------

def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tapes_spark.operators.textstats import with_token_stats

    docs = _t(spark, sf_dir, "documents")
    return (
        with_token_stats(docs)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("token_count").alias("total_tokens"),
            F.round(F.avg("token_count"), 4).alias("avg_tokens"),
            F.round(F.avg("distinct_token_count"), 4).alias("avg_distinct_tokens"),
        )
    )


_TOKEN_STATS_SQL = """
WITH t AS (
  SELECT lang,
         len(list_filter(string_split_regex(text, '\\s+'), t -> t != ''))
             AS token_count,
         len(list_distinct(list_filter(string_split_regex(text, '\\s+'),
                                       t -> t != ''))) AS distinct_token_count
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(token_count) AS BIGINT) AS total_tokens,
       round(avg(token_count), 4) AS avg_tokens,
       round(avg(distinct_token_count), 4) AS avg_distinct_tokens
FROM t GROUP BY lang
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tapes_spark.operators.textstats import with_lang_pred

    docs = _t(spark, sf_dir, "documents")
    pred = with_lang_pred(docs)
    return pred.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(F.col("lang_pred") == F.col("lang"), 1)).alias("n_correct"),
    )


def _lang_id_sql() -> str:
    from tapes_spark.operators.textstats import STOPWORDS

    score_exprs = []
    for lang in sorted(STOPWORDS):
        words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        score_exprs.append(
            f"len(list_filter(toks, t -> list_contains([{words}], t)))"
            f" AS s_{lang}"
        )
    langs = sorted(STOPWORDS)
    gmax = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    case = "CASE WHEN " + gmax + " = 0 THEN 'und' " + " ".join(
        f"WHEN s_{l} = {gmax} THEN '{l}'" for l in langs
    ) + " END"
    return f"""
WITH t AS (
  SELECT lang, list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '') AS toks
  FROM documents
), s AS (
  SELECT lang, {", ".join(score_exprs)} FROM t
)
SELECT lang, count(*) AS n_docs,
       count(*) FILTER (WHERE {case} = lang) AS n_correct
FROM s GROUP BY lang
"""


# --------------------------------------------------------------------------
# J4-style as-of attach: each error event -> most recent preceding purchase
# --------------------------------------------------------------------------

def q_asof_attach(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prior = F.last(
        F.when(F.col("event_type") == "purchase", F.col("event_id")), True
    ).over(w)
    return (
        ev.withColumn("prior_purchase_event_id", prior)
        .filter(F.col("event_type") == "error")
        .select("user_id", "event_id", "prior_purchase_event_id")
    )


_ASOF_SQL = """
SELECT user_id, event_id, prior_purchase_event_id
FROM (
  SELECT user_id, event_id, event_type,
         last_value(CASE WHEN event_type = 'purchase' THEN event_id END
                    IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS prior_purchase_event_id
  FROM events
) WHERE event_type = 'error'
"""


def q_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tapes_spark.operators.textstats import with_quality_score

    docs = _t(spark, sf_dir, "documents")
    return (
        with_quality_score(docs)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
            F.round(F.avg("stopword_ratio"), 4).alias("avg_stopword_ratio"),
            F.round(F.avg("type_token_ratio"), 4).alias("avg_ttr"),
        )
    )


def _quality_sql() -> str:
    from tapes_spark.operators.textstats import ALL_STOPWORDS

    stoplist = ", ".join(f"'{w}'" for w in ALL_STOPWORDS)
    return f"""
WITH t AS (
  SELECT source,
         list_filter(string_split_regex(text, '\\s+'), t -> t != '') AS toks,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
             AS n_punct,
         length(text) AS n_chars
  FROM documents
), s AS (
  SELECT source,
         len(toks) AS n,
         len(list_filter(toks, x -> list_contains([{stoplist}], x))) AS n_stop,
         len(list_distinct(toks)) AS n_dist,
         n_punct, n_chars
  FROM t
), q AS (
  SELECT source,
         round(CASE WHEN n > 0 THEN n_stop / n ELSE 0 END, 4) AS stop_ratio,
         round(CASE WHEN n > 0 THEN n_dist / n ELSE 0 END, 4) AS ttr,
         round(0.4 * (CASE WHEN n > 0 THEN n_stop / n ELSE 0 END)
             + 0.3 * (CASE WHEN n > 0 THEN n_dist / n ELSE 0 END)
             + 0.3 * (1.0 - CASE WHEN n_chars > 0 THEN n_punct / n_chars
                            ELSE 0 END), 4) AS quality
  FROM s
)
SELECT source, count(*) AS n_docs,
       round(avg(quality), 4) AS avg_quality,
       round(avg(stop_ratio), 4) AS avg_stopword_ratio,
       round(avg(ttr), 4) AS avg_ttr
FROM q GROUP BY source
"""


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs.  After exact-Jaccard verification of
    the banded candidates, the output is the SAME quantity as the brute
    Jaccard oracle — provided no true pair misses every band.  At 128
    perms / 32 bands of 4 rows, P[miss] per pair at s=0.8 is
    (1-0.8^4)^32 ~ 5e-8, so the Jaccard SQL doubles as this query's
    oracle (upgraded from the round-1 rows-only check)."""
    from tapes_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, num_perm=128, bands=32, threshold=0.8)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs.  The pigeonhole candidate join (4x16-bit
    chunks) is EXACT for hamming <= 3, so the output equals all-pairs
    hamming <= 3 — which the DuckDB oracle below recomputes from first
    principles (FNV-1a per token via list_reduce, per-bit majority vote,
    brute all-pairs hamming)."""
    from tapes_spark.operators.dedup import simhash_pairs

    docs = _t(spark, sf_dir, "documents")
    return simhash_pairs(docs, max_hamming=3)


# The SQL re-implementation of the deterministic SimHash: FNV-1a folds
# one byte per list_reduce step in HUGEINT arithmetic (xor touches only
# the low 8 bits, so it is expressed as h - h%256 + xor(h%256, b)); the
# per-token hash is reduced mod 2^61-1 exactly like hash_token, so bits
# 61-63 are always 0 and only bits 0..60 need the majority vote.  VALID
# FOR ASCII CORPORA ONLY (unicode(char) == utf-8 byte); the driver
# documents tables are pure ASCII (verified), a non-ASCII corpus would
# need byte-level splitting DuckDB SQL cannot express.
_SIMHASH_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(list_distinct(string_split_regex(text, '\s+')),
                            t -> t != '')) AS token
  FROM documents
), hashed AS (
  SELECT doc_id,
    list_reduce(
      list_prepend(14695981039346656037::HUGEINT,
        list_transform(string_split(token, ''), c -> unicode(c)::HUGEINT)),
      (h, b) -> ((h - (h % 256) + xor((h % 256)::BIGINT, b::BIGINT)::HUGEINT)
                 * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
    ) % 2305843009213693951::HUGEINT AS fnv
  FROM tok
), bits AS (
  SELECT doc_id, j,
         CASE WHEN 2 * sum(((fnv // (1::BIGINT << j)::HUGEINT) % 2)::BIGINT)
                   >= count(*) THEN 1 ELSE 0 END AS bit
  FROM hashed, generate_series(0, 60) t(j)
  GROUP BY doc_id, j
), sig AS (
  SELECT doc_id, list(bit ORDER BY j) AS bits FROM bits GROUP BY doc_id
), pairs AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2,
         len(list_filter(generate_series(1, 61),
                         i -> a.bits[i] != b.bits[i]))::INT AS hamming
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
)
SELECT doc1, doc2, hamming FROM pairs WHERE hamming <= 3
"""


def _driver_idx_root(sf_dir: str, kind: str) -> str:
    """Stable per-corpus tape root under /tmp for the persisted-index
    driver queries — refresh() is idempotent and content-hash keyed, so
    re-runs against an existing tape re-sign nothing, and a corpus or
    config change reconciles instead of corrupting."""
    import hashlib
    import os
    import tempfile

    key = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(
        tempfile.gettempdir(), "tapes_driver_idx", key, kind
    )


def q_minhash_index_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs served from the PERSISTED MinHash index tape
    (operators/dedup_index.MinHashIndexTape).  refresh() incrementally
    maintains content-hash-keyed band signatures (a warm call re-signs
    nothing); pairs() shares the recompute path's query halves
    (pairs_from_band_hashes + verify_jaccard), so the output is
    bit-identical to q_minhash_lsh_pairs and the exact-Jaccard SQL
    doubles as this query's oracle (same 128-perm/32-band recall
    margin)."""
    from tapes_spark.operators.dedup_index import MinHashIndexTape

    docs = _t(spark, sf_dir, "documents")
    idx = MinHashIndexTape(
        spark, _driver_idx_root(sf_dir, "minhash"), num_perm=128, bands=32
    )
    idx.refresh(docs)
    return idx.pairs(docs, threshold=0.8)


def q_simhash_index_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs served from the PERSISTED SimHash index tape —
    fully index-resident (popcount verify over stored signatures, zero
    text reads at query time).  Bit-identical to q_simhash_pairs via the
    shared pairs_from_simhashes half, so the first-principles SimHash
    SQL doubles as the oracle."""
    from tapes_spark.operators.dedup_index import SimHashIndexTape

    docs = _t(spark, sf_dir, "documents")
    idx = SimHashIndexTape(spark, _driver_idx_root(sf_dir, "simhash"))
    idx.refresh(docs)
    return idx.pairs(max_hamming=3)


# --------------------------------------------------------------------------
# similarity: brute-force cosine top-k over embeddings
# --------------------------------------------------------------------------

def q_cosine_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tapes_spark.operators.similarity import cosine_dup_pairs_brute

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_dup_pairs_brute(emb, threshold=0.5)


_COSINE_DUP_SQL = """
SELECT a.vec_id AS vec1, b.vec_id AS vec2,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4)
           AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4)
      >= 0.5
"""


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tapes_spark.operators.similarity import brute_cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return brute_cosine_topk(emb.filter(F.col("vec_id") != 0), list(qvec), k=10)


_COSINE_SQL = """
SELECT vec_id,
       round(list_cosine_similarity(
           embedding::DOUBLE[],
           (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6)
           AS cosine
FROM embeddings
WHERE vec_id <> 0
ORDER BY cosine DESC, vec_id ASC
LIMIT 10
"""


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (operators/ann_ivf.py: spherical k-means coarse quantizer
    + probe filter + exact re-rank) run at nprobe == n_clusters, where
    pruning is a no-op by construction — so the exact brute-force top-k
    SQL is the oracle, while the query still drives the full distributed
    train/assign/probe machinery.  Pruned-probe recall is pytest-gated
    (tests/test_ann_ivf.py).  Reference analog: pkg/spanembed/store.go
    HNSW index role."""
    from tapes_spark.operators.ann_ivf import ivf_cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return ivf_cosine_topk(
        emb.filter(F.col("vec_id") != 0),
        list(qvec),
        k=10,
        n_clusters=16,
        nprobe=16,
        n_iters=3,
        # the production-scale config: the quantizer trains on a
        # deterministic hash HALF of the corpus (ann_ivf.ivf_train —
        # FAISS-style bounded-sample train); with nprobe == n_clusters
        # the probe prunes nothing, so the exact-SQL oracle holds at
        # ANY fraction while the query drives the sampled-train path
        train_fraction=0.5,
    )


# --------------------------------------------------------------------------
# spanembed: chunked embeddings with best-chunk-per-span collapse
# (reference store.go:568-612: 4x over-fetch of nearest CHUNKS, then
# DISTINCT ON span keeping the best-matching chunk, then top-k spans).
# The driver embeddings table stands in as the chunk table: every 4
# consecutive vec_ids form one span's chunks.
# --------------------------------------------------------------------------

def q_chunked_span_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tapes_spark.operators.chunking import chunked_topk_spans

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    chunks = emb.select(
        F.floor(F.col("vec_id") / 4).alias("span_id"),
        (F.col("vec_id") % 4).alias("chunk_idx"),
        "embedding",
    )
    return chunked_topk_spans(chunks, list(qvec), k=10)


_CHUNKED_SQL = """
WITH nearest AS (
  SELECT vec_id // 4 AS span_id, vec_id % 4 AS chunk_idx,
         round(list_cosine_similarity(
             embedding::DOUBLE[],
             (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)),
             6) AS cosine
  FROM embeddings
  ORDER BY cosine DESC, span_id, chunk_idx
  LIMIT 40
), best AS (
  SELECT span_id, chunk_idx AS best_chunk_idx, cosine AS score,
         row_number() OVER (PARTITION BY span_id
                            ORDER BY cosine DESC, chunk_idx) AS rn
  FROM nearest
)
SELECT span_id, best_chunk_idx, score
FROM best WHERE rn = 1
ORDER BY score DESC, span_id
LIMIT 10
"""


# --------------------------------------------------------------------------
# transport drop-reason ladder over a deterministically wire-damaged stream
# --------------------------------------------------------------------------

def q_transport_drop_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL 8-reason drop ladder (tapes_spark.operators.dropreason:
    5 derive-tier + 3 transport-tier reasons) exercised end-to-end.

    The events stream is first mapped to the transcript shape (user_id ->
    conv_id, per-user capture order -> turn_idx) and then deterministically
    WIRE-DAMAGED — retransmits (event_id % 97), out-of-order captures with
    regressed timestamps (% 101), captures with no timestamp (% 103), and
    attribution loss (% 107) — so every ladder rung fires on real volume.
    The oracle recomputes the identical damage + ladder in SQL.
    """
    from tapes_spark.operators.dropreason import with_full_drop_reason

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    base = ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("props").alias("text"),
        F.col("event_type").alias("tool"),
        F.col("ts"),
        F.col("event_id"),
    )
    dup = base.filter(F.col("event_id") % 97 == 0)
    reg = (
        base.filter(F.col("event_id") % 101 == 0)
        .withColumn("turn_idx", (F.col("turn_idx") + 1_000_000).cast("int"))
        .withColumn("ts", F.col("ts") - F.expr("INTERVAL 1 HOUR"))
    )
    miss = (
        base.filter(F.col("event_id") % 103 == 0)
        .withColumn("turn_idx", (F.col("turn_idx") + 2_000_000).cast("int"))
        .withColumn("ts", F.lit(None).cast("timestamp"))
    )
    noattr = base.filter(F.col("event_id") % 107 == 0).withColumn(
        "conv_id", F.lit(None).cast("string")
    )
    damaged = (
        base.unionByName(dup)
        .unionByName(reg)
        .unionByName(miss)
        .unionByName(noattr)
        .drop("event_id")
    )
    return (
        with_full_drop_reason(damaged)
        .groupBy(F.coalesce(F.col("drop_reason"), F.lit("ok")).alias("drop_reason"))
        .agg(F.count("*").alias("n"))
    )


_TRANSPORT_DROP_SQL = """
WITH base AS (
  SELECT CAST(user_id AS VARCHAR) AS conv_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1
              AS INT) AS turn_idx,
         'user' AS role, props AS text, event_type AS tool, ts, event_id
  FROM events
), damaged AS (
  SELECT conv_id, turn_idx, role, text, tool, ts FROM base
  UNION ALL
  SELECT conv_id, turn_idx, role, text, tool, ts FROM base
  WHERE event_id % 97 = 0
  UNION ALL
  SELECT conv_id, CAST(turn_idx + 1000000 AS INT), role, text, tool,
         ts - INTERVAL 1 HOUR FROM base WHERE event_id % 101 = 0
  UNION ALL
  SELECT conv_id, CAST(turn_idx + 2000000 AS INT), role, text, tool,
         NULL FROM base WHERE event_id % 103 = 0
  UNION ALL
  SELECT NULL, turn_idx, role, text, tool, ts FROM base
  WHERE event_id % 107 = 0
), winds AS (
  SELECT *,
    row_number() OVER (PARTITION BY conv_id, turn_idx, role, text, tool
                       ORDER BY ts NULLS LAST) AS rn,
    max(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx
                  RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        AS prev_max_ts
  FROM damaged
), laddered AS (
  SELECT CASE
    WHEN conv_id IS NULL OR conv_id = '' THEN 'missing_attribution'
    WHEN turn_idx IS NULL OR turn_idx < 0 THEN 'missing_order'
    WHEN role IS NULL OR role = '' THEN 'missing_role'
    WHEN role NOT IN ('user','assistant','tool','system') THEN 'unknown_role'
    WHEN coalesce(text, '') = '' AND coalesce(tool, '') = ''
        THEN 'empty_turn'
    WHEN ts IS NULL THEN 'missing_ts'
    WHEN rn > 1 THEN 'duplicate_capture'
    WHEN ts < prev_max_ts THEN 'ts_regression'
    ELSE 'ok'
  END AS drop_reason
  FROM winds
)
SELECT drop_reason, CAST(count(*) AS BIGINT) AS n
FROM laddered GROUP BY 1
"""


def q_sse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 SSE stream reducer, gated by the reducer/one-shot byte-equality
    contract (reference pkg/capture/anthropic.go:57-224): every document
    is encoded into a chunked wire-shaped SSE stream (deterministic
    per-doc delta sizes, pings interleaved), parsed by the native event
    parser (sources/sse.sse_events, codegen) and folded by the stateful
    reducer (reduce_sse — NATIVE ordered aggregation: one from_json per
    event, array_sort(collect_list(struct)) concatenation, no Python
    stage) — the output must re-assemble the EXACT source text, so the
    oracle is simply the documents table itself."""
    from tapes_spark.sources.sse import (
        make_sse_recordings,
        reduce_sse,
        sse_events,
    )

    docs = _t(spark, sf_dir, "documents")
    reduced = reduce_sse(sse_events(make_sse_recordings(docs)))
    return reduced.select(
        F.substring("conv_id", 5, 100).cast("bigint").alias("doc_id"),
        "text",
    )


_SSE_ROUNDTRIP_SQL = "SELECT doc_id, text FROM documents"


def q_sse_roundtrip_openai(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 OpenAI Responses reducer under the same byte-equality contract
    (reference pkg/capture/openai_responses.go:27-36,106-170): each
    document is encoded into a Responses-shaped stream — alternating the
    api.openai.com shape (event lines, full terminal Response) and the
    codex shape (data-only frames, EMPTY terminal output, accumulated
    output_item.done items as the record) — and the native fold must
    re-assemble the exact source text."""
    from tapes_spark.sources.sse import (
        make_responses_recordings,
        reduce_sse_openai,
        sse_events,
    )

    docs = _t(spark, sf_dir, "documents")
    reduced = reduce_sse_openai(
        sse_events(make_responses_recordings(docs), keep_dataonly=True)
    )
    return reduced.select(
        F.substring("conv_id", 5, 100).cast("bigint").alias("doc_id"),
        "text",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "sessionize": q_sessionize,
        "pricing_rollup": q_pricing_rollup,
        "windowed_stats": q_windowed_stats,
        "route_counts": q_route_counts,
        "latency_deltas": q_latency_deltas,
        "first_event_per_user": q_first_event_per_user,
        "ordered_dedup": q_ordered_dedup,
        "keyset_page": q_keyset_page,
        "broadcast_enrich": q_broadcast_enrich,
        "topk_per_group": q_topk_per_group,
        "mode_event_type": q_mode_event_type,
        "json_extract": q_json_extract,
        "exact_dedup_docs": q_exact_dedup_docs,
        "fingerprint_dedup_docs": q_fingerprint_dedup_docs,
        "jaccard_pairs": q_jaccard_pairs,
        "token_stats": q_token_stats,
        "lang_id": q_lang_id,
        "cosine_topk": q_cosine_topk,
        "ivf_topk": q_ivf_topk,
        "cosine_dup_pairs": q_cosine_dup_pairs,
        "chunked_span_topk": q_chunked_span_topk,
        "quality_by_source": q_quality_by_source,
        "asof_attach": q_asof_attach,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash_pairs": q_simhash_pairs,
        "minhash_index_pairs": q_minhash_index_pairs,
        "simhash_index_pairs": q_simhash_index_pairs,
        "transport_drop_hist": q_transport_drop_hist,
        "sse_roundtrip": q_sse_roundtrip,
        "sse_roundtrip_openai": q_sse_roundtrip_openai,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "sessionize": _SESSIONIZE_SQL,
        "pricing_rollup": _PRICING_SQL,
        "windowed_stats": _WINDOWED_SQL,
        "route_counts": _ROUTE_SQL,
        "latency_deltas": _LATENCY_SQL,
        "first_event_per_user": _FIRST_EVENT_SQL,
        "ordered_dedup": _ORDERED_DEDUP_SQL,
        "keyset_page": _KEYSET_SQL,
        "broadcast_enrich": _BROADCAST_SQL,
        "topk_per_group": _TOPK_SQL,
        "mode_event_type": _MODE_SQL,
        "json_extract": _JSON_SQL,
        "exact_dedup_docs": _EXACT_DEDUP_SQL,
        "fingerprint_dedup_docs": _FINGERPRINT_SQL,
        "jaccard_pairs": _JACCARD_SQL,
        "token_stats": _TOKEN_STATS_SQL,
        "lang_id": _lang_id_sql(),
        "cosine_topk": _COSINE_SQL,
        # exhaustive-probe IVF prunes nothing -> exact top-k is the oracle
        "ivf_topk": _COSINE_SQL,
        "cosine_dup_pairs": _COSINE_DUP_SQL,
        "chunked_span_topk": _CHUNKED_SQL,
        "quality_by_source": _quality_sql(),
        "asof_attach": _ASOF_SQL,
        "transport_drop_hist": _TRANSPORT_DROP_SQL,
        # the SSE reducer's contract IS equality with the one-shot text
        "sse_roundtrip": _SSE_ROUNDTRIP_SQL,
        "sse_roundtrip_openai": _SSE_ROUNDTRIP_SQL,
        # minhash output == exact Jaccard at this threshold (see
        # q_minhash_lsh_pairs docstring for the recall argument)
        "minhash_lsh_pairs": _JACCARD_SQL,
        # simhash recomputed from first principles in SQL (list_reduce
        # FNV + majority vote); pigeonhole candidates are exact at h<=3
        "simhash_pairs": _SIMHASH_SQL,
        # the persisted-index paths share the recompute paths' query
        # halves, so the same oracles gate them bit-for-bit
        "minhash_index_pairs": _JACCARD_SQL,
        "simhash_index_pairs": _SIMHASH_SQL,
    }
