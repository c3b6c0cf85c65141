"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query: full inverted-index build + reference
                 exact ranking over /root/testdata/sf0.001 documents.
queries()      — per-operator callables (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB-equivalent SQL per query key.

For oracle-expressible operators the Spark side uses built-in functions
only ("tokenizer-lite": split on \\s+, 2<=len<=50, 26-word stop list —
no stemming, since DuckDB cannot Porter2). The full reference pipeline
(stemming, special tokens, field weights) is exercised by entry() and
the pytest suites against the pure-Python oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nadry_spark.functions.stopwords import STOP_WORDS

# ---------------------------------------------------------------------------
# shared tokenizer-lite (SQL-expressible subset of F9-F11)
# ---------------------------------------------------------------------------

_STOP_SQL = ", ".join(f"'{w}'" for w in sorted(STOP_WORDS))

QUERY_TERMS = ["join", "hash", "filter"]  # frequent terms in the testdata corpus
QUERY_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _terms_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term) exploded with tokenizer-lite filters applied."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("term"))
        .where(
            (F.length("term") >= 2)
            & (F.length("term") <= 50)
            & ~F.col("term").isin([w for w in sorted(STOP_WORDS)])
        )
    )


_TERMS_LITE_SQL = f"""
    SELECT doc_id, t.term
    FROM (
        SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
        FROM documents
    ) t
    WHERE length(t.term) BETWEEN 2 AND 50
      AND t.term NOT IN ({_STOP_SQL})
"""


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Full pipeline on sf0.001: treat documents.text as page bodies, build
    the real inverted index (pandas-UDF tokenizer incl. Porter2 +
    special tokens), then reference-exact rank a 3-term query."""
    from nadry_spark.session import ship_package
    from nadry_spark.functions.udfs import tokenize_udf
    from nadry_spark.operators.index_build import build_postings
    from nadry_spark.operators.ranker import rank_exact, candidates_for_terms
    from nadry_spark.functions.tokenizer import tokenize

    ship_package(spark)

    docs = (
        _docs(spark, "/root/testdata/sf0.001")
        .select(
            F.sha2(F.col("doc_id").cast("string"), 256).alias("doc_id"),
            F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
            F.col("text"),
        )
        .withColumn("tokens_title", F.array().cast("array<string>"))
        .withColumn("tokens_desc", F.array().cast("array<string>"))
        .withColumn("tokens_body", tokenize_udf(F.col("text")))
        .withColumn(
            "total_words",
            F.size("tokens_title") + F.size("tokens_desc") + F.size("tokens_body"),
        )
    )
    postings = build_postings(docs)
    doc_stats = docs.select("doc_id", "total_words", F.lit(0.0).alias("popularity_score"))
    q_tokens = tokenize("join hash filter")
    cand = candidates_for_terms(postings, q_tokens)
    return rank_exact(spark, cand, doc_stats, q_tokens).limit(10)


# ---------------------------------------------------------------------------
# oracle-checked operator queries
# ---------------------------------------------------------------------------


def q_doc_term_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A7: per-(doc, term) frequency."""
    return (
        _terms_lite(spark, sf_dir)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def q_total_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: token count per doc after filtering."""
    return _terms_lite(spark, sf_dir).groupBy("doc_id").agg(F.count("*").alias("total_words"))


def q_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 (corpus-wide flavor): DF(term) = #docs containing term."""
    return (
        _terms_lite(spark, sf_dir)
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )


def q_additive_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16/O1/O2: additive scoring over query terms, top-10 with
    deterministic tie-break (single body field -> weight == tf)."""
    return (
        _terms_lite(spark, sf_dir)
        .where(F.col("term").isin(QUERY_TERMS))
        .groupBy("doc_id")
        .agg(F.count("*").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


def q_term_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 position lists: 0-based positions AFTER filtering, per the
    reference's enumerate-over-filtered-tokens semantics."""
    raw = (
        _docs(spark, sf_dir)
        .select("doc_id", F.posexplode(F.split(F.lower("text"), r"\s+")).alias("raw_pos", "term"))
        .where(
            (F.length("term") >= 2)
            & (F.length("term") <= 50)
            & ~F.col("term").isin([w for w in sorted(STOP_WORDS)])
        )
    )
    w = Window.partitionBy("doc_id").orderBy("raw_pos")
    positions = raw.withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
    return (
        positions.groupBy("doc_id", "term")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
        .where(F.col("term").isin(QUERY_TERMS))
    )


def q_tfidf_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8-A12 reference ranking (relevance-only; popularity absent in
    testdata): candidate-set N and DF, idf=log10(N/(1+df)),
    tfidf=(tf/total_words)*idf, relevance = dot(query, doc), rank by
    (relevance desc, doc_id asc). Output (rank, doc_id) — float scores
    excluded from the hash for cross-engine stability."""
    tf = q_doc_term_tf(spark, sf_dir)
    tw = q_total_words(spark, sf_dir)
    cand_tf = tf.where(F.col("term").isin(QUERY_TERMS))
    n_df = cand_tf.agg(F.countDistinct("doc_id").alias("n_cand"))
    term_df = cand_tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    qlen = len(QUERY_TERMS)
    scored = (
        cand_tf.join(tw, "doc_id")
        .join(F.broadcast(term_df), "term")
        .crossJoin(F.broadcast(n_df))
        .withColumn("idf", F.log10(F.col("n_cand") / (1 + F.col("df"))))
        .withColumn(
            "contrib",
            (F.lit(1.0) / F.lit(float(qlen)))
            * F.col("idf")
            * (F.col("tf") / F.col("total_words"))
            * F.col("idf"),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("relevance"))
    )
    # quantize before ranking: fp summation order differs across engines
    # at ~1e-16 relative; a 1e-9 grid + doc_id tie-break is stable
    w = Window.orderBy(F.desc(F.round(F.col("relevance"), 9)), F.asc("doc_id"))
    return scored.select(F.row_number().over(w).alias("rank"), "doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "doc_term_tf": q_doc_term_tf,
        "total_words": q_total_words,
        "doc_freq": q_doc_freq,
        "additive_topk": q_additive_topk,
        "term_positions": q_term_positions,
        "tfidf_rank": q_tfidf_rank,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "doc_term_tf": f"""
            SELECT doc_id, term, count(*)::BIGINT AS tf
            FROM ({_TERMS_LITE_SQL})
            GROUP BY doc_id, term
        """,
        "total_words": f"""
            SELECT doc_id, count(*)::BIGINT AS total_words
            FROM ({_TERMS_LITE_SQL})
            GROUP BY doc_id
        """,
        "doc_freq": f"""
            SELECT term, count(DISTINCT doc_id)::BIGINT AS df
            FROM ({_TERMS_LITE_SQL})
            GROUP BY term
        """,
        "additive_topk": f"""
            SELECT doc_id, count(*)::BIGINT AS score
            FROM ({_TERMS_LITE_SQL})
            WHERE term IN ({QUERY_TERMS_SQL})
            GROUP BY doc_id
            ORDER BY score DESC, doc_id ASC
            LIMIT 10
        """,
        "term_positions": f"""
            WITH raw AS (
                SELECT doc_id,
                       unnest(string_split_regex(lower(text), '\\s+')) AS term,
                       generate_subscripts(string_split_regex(lower(text), '\\s+'), 1) AS raw_pos
                FROM documents
            ), filtered AS (
                SELECT doc_id, term, raw_pos,
                       row_number() OVER (PARTITION BY doc_id ORDER BY raw_pos) - 1 AS pos
                FROM raw
                WHERE length(term) BETWEEN 2 AND 50 AND term NOT IN ({_STOP_SQL})
            )
            SELECT doc_id, term, list_sort(list(pos)) AS positions
            FROM filtered
            WHERE term IN ({QUERY_TERMS_SQL})
            GROUP BY doc_id, term
        """,
        "tfidf_rank": f"""
            WITH terms AS ({_TERMS_LITE_SQL}),
            tf AS (
                SELECT doc_id, term, count(*)::BIGINT AS tf
                FROM terms GROUP BY doc_id, term
            ),
            tw AS (
                SELECT doc_id, count(*)::BIGINT AS total_words
                FROM terms GROUP BY doc_id
            ),
            cand AS (
                SELECT * FROM tf WHERE term IN ({QUERY_TERMS_SQL})
            ),
            n_cand AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n_cand FROM cand),
            term_df AS (
                SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM cand GROUP BY term
            ),
            scored AS (
                SELECT c.doc_id,
                       sum( (1.0/3.0) * log10(n.n_cand/(1+d.df))
                            * (c.tf::DOUBLE/w.total_words) * log10(n.n_cand/(1+d.df)) ) AS relevance
                FROM cand c
                JOIN tw w USING (doc_id)
                JOIN term_df d USING (term)
                CROSS JOIN n_cand n
                GROUP BY c.doc_id
            )
            SELECT row_number() OVER (ORDER BY round(relevance, 9) DESC, doc_id ASC)::INT AS rank, doc_id
            FROM scored
        """,
    }
