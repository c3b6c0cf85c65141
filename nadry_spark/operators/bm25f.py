"""BM25F — the standard multi-field web ranking function (Robertson,
Zaragoza & Taylor, CIKM'04, "Simple BM25 extension to multiple
weighted fields").  Where plain BM25 flattens a page into one bag of
words, BM25F normalizes term frequency PER FIELD (title, body, inbound
anchor text, ...), weights the normalized frequencies, and puts the
combined pseudo-frequency through one saturation curve — so a title
hit is worth more than a body hit without double-counting document
length, and external anchor text (operators/anchors) ranks pages whose
own text is thin.

    ntf(t,d,f)  = tf_f / (1 - b_f + b_f * len_f(d)/avglen_f)
    wtf(t,d)    = sum_f  w_f * ntf(t,d,f)
    score(d)    = sum_{t in q}  idf(t) * wtf / (k1 + wtf)

idf matches this engine's BM25 convention (operators/bm25.bm25_idf):
ln(1 + (N - df + 0.5)/(df + 0.5)) with df = docs containing t in ANY
field.  All divisions double-first in a fixed order so the DuckDB
oracle mirrors the IEEE op sequence; scores land on the 1e-9 grid.

Scale shape: everything keys on (doc, term) or smaller.  Per-field
average lengths and N are 1-row/field-count frames riding as
broadcasts; the field dimension (weights/b) is a broadcast VALUES
table; the only corpus-sized shuffles are the per-(doc, field, term)
tf aggregation the caller already built and the final per-doc sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25f_score(
    field_tf: DataFrame,
    field_len: DataFrame,
    fields: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
) -> DataFrame:
    """(doc_id, score) for docs matching >=1 query term.

    field_tf:  (doc_id, field, term, tf) — per-field term counts.
    field_len: (doc_id, field, len) — per-field token counts, ZERO
               rows included (they shape avglen; a field the doc
               lacks must count as length 0, not be absent).
    fields:    (field, w, b) — weight and length-normalization slope
               per field (the BM25F tuning surface).
    """
    q = sorted(set(query_terms))
    qtf = field_tf.where(F.col("term").isin(q))

    n_docs = field_len.select("doc_id").distinct().agg(F.count("*").alias("n"))
    avglen = field_len.groupBy("field").agg(
        (F.sum("len").cast("double") / F.count("*").cast("double")).alias("avglen")
    )
    df = qtf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = df.crossJoin(F.broadcast(n_docs)).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
    )

    ntf = (
        qtf.join(field_len, ["doc_id", "field"])
        .join(F.broadcast(avglen), "field")
        .join(F.broadcast(fields), "field")
        .select(
            "doc_id",
            "term",
            (
                F.col("w")
                * (
                    F.col("tf").cast("double")
                    / (
                        F.lit(1.0)
                        - F.col("b")
                        + F.col("b") * (F.col("len").cast("double") / F.col("avglen"))
                    )
                )
            ).alias("x"),
        )
    )
    wtf = ntf.groupBy("doc_id", "term").agg(F.sum("x").alias("wtf"))
    return (
        wtf.join(F.broadcast(idf), "term")
        .select(
            "doc_id",
            (F.col("idf") * (F.col("wtf") / (F.lit(float(k1)) + F.col("wtf")))).alias(
                "s"
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("s"), 9).alias("score"))
    )
