"""Line-level (paragraph-level) deduplication — the CCNet/RefinedWeb
cleaning pass (Wenzek et al., LREC'20 "CCNet"; Penedo et al.,
NeurIPS'23 "The RefinedWeb dataset": line-wise filtering and dedup):
web pages share enormous amounts of EXACT repeated lines across
documents — navigation, cookie banners, footers, mirrored articles —
and dropping every line that occurs in too many distinct documents
removes boilerplate that document-level dedup cannot touch (each
page is unique overall, its furniture is not).

Shape: one corpus-wide count keyed by the line's md5 (fixed-width
shuffle key instead of arbitrary-length line text), then an anti-join
of the long-form lines against the over-threshold hash set.  Both
sides are corpus-sized — this is the same line-keyed shuffle CCNet
runs over Common Crawl, and the count is map-side combinable.
Reassembly preserves original line order via the long-form position.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_lines(
    docs: DataFrame, sep: str = "\n", text_col: str = "text", doc_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, line_no, line) long form, 0-based line positions."""
    return docs.select(
        doc_col,
        F.posexplode(F.split(F.col(text_col), sep)).alias("line_no", "line"),
    )


def dedup_lines(
    lines: DataFrame,
    min_docs: int = 2,
    doc_col: str = "doc_id",
    line_col: str = "line",
) -> DataFrame:
    """Drop every line whose exact text occurs in >= min_docs distinct
    documents; all other rows pass through unchanged."""
    hot = (
        lines.groupBy(F.md5(F.col(line_col)).alias("_h"))
        .agg(F.countDistinct(doc_col).alias("_n"))
        .where(F.col("_n") >= min_docs)
        .select("_h")
    )
    return (
        lines.withColumn("_h", F.md5(F.col(line_col)))
        .join(hot, "_h", "left_anti")
        .drop("_h")
    )


def line_dedup_text(
    docs: DataFrame,
    sep: str = "\n",
    min_docs: int = 2,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, text) with over-threshold lines removed and the
    remainder rejoined in original order. Documents whose every line
    was boilerplate come back with empty text (kept, so the caller
    decides whether an emptied doc survives)."""
    kept = dedup_lines(
        split_lines(docs, sep=sep, text_col=text_col, doc_col=doc_col),
        min_docs=min_docs,
        doc_col=doc_col,
    )
    rejoined = kept.groupBy(doc_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("line_no", "line"))),
                lambda x: x["line"],
            ),
            sep,
        ).alias(text_col)
    )
    return (
        docs.select(doc_col)
        .join(rejoined, doc_col, "left")
        .select(doc_col, F.coalesce(text_col, F.lit("")).alias(text_col))
    )


def c4_filters(
    docs: DataFrame,
    sep: str = "\n",
    text_col: str = "text",
    doc_col: str = "doc_id",
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """The C4 cleaning recipe (Raffel et al., JMLR'20 §2.2 — the
    most-cited web-text filter set), faithfully per rule:

      line level: keep only lines that end in terminal punctuation
                  and have >= 5 words; drop lines containing
                  'javascript'
      doc level:  drop docs with < 3 sentences (after line cleaning),
                  containing '{' or 'lorem ipsum' anywhere

    Returns (doc_id, text, kept): cleaned text rejoined in order plus
    the doc-level verdict as 0/1 — callers filter on kept but get the
    cleaned text for survivors.  Pure column expressions over the
    line long-form (same split/rejoin machinery as dedup_lines);
    sentence count = terminal-punctuation runs in the CLEANED text.
    """
    lines = split_lines(docs, sep=sep, text_col=text_col, doc_col=doc_col)
    good = lines.where(
        F.col("line").rlike(r"[.!?\"']$")
        & (
            F.size(
                F.filter(F.split("line", r"\s+"), lambda w: F.length(w) > 0)
            )
            >= min_line_words
        )
        & ~F.lower("line").contains("javascript")
    )
    rejoined = good.groupBy(doc_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("line_no", "line"))),
                lambda x: x["line"],
            ),
            sep,
        ).alias("_clean")
    )
    out = (
        docs.select(doc_col, F.col(text_col).alias("_orig"))
        .join(rejoined, doc_col, "left")
        .withColumn("_clean", F.coalesce("_clean", F.lit("")))
    )
    n_sent = F.size(
        F.regexp_extract_all(F.col("_clean"), F.lit(r"[.!?]+"), F.lit(0))
    )
    kept = (
        (n_sent >= min_sentences)
        & ~F.col("_orig").contains("{")
        & ~F.lower("_orig").contains("lorem ipsum")
    )
    return out.select(
        doc_col,
        F.col("_clean").alias(text_col),
        kept.cast("long").alias("kept"),
    )
