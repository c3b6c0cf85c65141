"""More-Like-This: find documents similar to a source document by
turning its most distinctive terms into a disjunctive query — the
Lucene ``MoreLikeThis`` model (org.apache.lucene.queries.mlt), which
the reference's search surface family (Lucene-style index + ranked
retrieval) implies as the standard related-results feature.

Algorithm (classic Lucene semantics, simplified to its documented
core):

1. score every term of the SOURCE doc by ``tf * idf`` with
   ``idf = ln(N / (df + 1)) + 1`` (Lucene's classic idf shape);
2. keep the top ``max_query_terms`` "interesting terms"
   (deterministic: rounded score desc, term asc);
3. score every OTHER doc by the sum of ``tf_target * idf`` over the
   shared interesting terms; top-k by (rounded score desc, doc_id).

Scale shape: term selection reduces to a ``max_query_terms``-row
frame that BROADCASTS into the target scan, so the expensive side is
one corpus-sized join against a dictionary-sized build — no shuffle
of the corpus beyond the tf/df aggregations, which are map-side
combinable. Corpus-global N rides in as a 1-row broadcast
(cross-join), the same pattern as operators/ranker.

Determinism / oracle notes: scores are rounded to 9 dp before ranking
(CLAUDE.md float rule) and ties break on term / doc_id, so the DuckDB
mirror is exact; idf uses natural log on doubles (bit-identical across
engines for these inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def more_like_this(
    terms: DataFrame,
    source_doc_id: int,
    max_query_terms: int = 10,
    k: int = 10,
) -> DataFrame:
    """(doc_id, mlt_score) of the k docs most like ``source_doc_id``.

    ``terms`` is the long (doc_id, term) frame (one row per occurrence,
    tokenizer-lite shape). The source doc itself is excluded."""
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = terms.select("doc_id").distinct().agg(F.count("*").alias("n_docs"))

    idf = F.log(F.col("n_docs") / (F.col("df") + 1)) + 1
    interesting = (
        tf.where(F.col("doc_id") == source_doc_id)
        .join(df, "term")
        .crossJoin(F.broadcast(n))
        .select("term", F.round(F.col("tf") * idf, 9).alias("term_score"), idf.alias("idf"))
        .orderBy(F.desc("term_score"), F.asc("term"))
        .limit(max_query_terms)
    )
    return (
        tf.where(F.col("doc_id") != source_doc_id)
        .join(F.broadcast(interesting.select("term", "idf")), "term")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("tf") * F.col("idf")), 9).alias("mlt_score"))
        .orderBy(F.desc("mlt_score"), F.asc("doc_id"))
        .limit(k)
    )
