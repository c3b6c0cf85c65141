"""Inbound anchor-text aggregation — the classic external-description
signal of web search (Brin & Page, WWW'98 §2.2: "anchors often provide
more accurate descriptions of web pages than the pages themselves";
also the reason Lucene/Nutch index a separate `anchor` field).  The
crawl emits per-occurrence (src page, dst page, anchor text) triples;
this operator inverts them into a per-TARGET term table a ranker can
blend as an extra field — covering pages whose own text is thin
(homepages, media, JS-rendered shells).

Output per (dst, term): ``tf`` = total occurrences of the term across
all inbound anchors, ``n_srcs`` = number of DISTINCT linking pages
whose anchors use the term (the spam-resistant count — one page
repeating "cheap pills" a thousand times still counts once).

Scale shape: explode + one (dst, term)-keyed aggregation.  Both
aggregates are map-side combinable (count_distinct(src) partial-aggs
to a per-partition distinct set before shuffling); the hot-dst skew of
mega-popular targets is the same shape as a stopword-heavy term in
postings building and is handled by the same two-phase partial
aggregation, so no salting is needed for counting aggregates.
Tokenization is the tokenizer-lite filter (length 2..50, non-stop) so
the DuckDB oracle mirrors it verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def anchor_term_index(
    links: DataFrame,
    stopwords: list[str] | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
    anchor_col: str = "anchor",
) -> DataFrame:
    """(dst, term, tf, n_srcs) from per-occurrence anchor triples."""
    stop = sorted(set(stopwords or []))
    tok = (
        links.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.explode(F.split(F.lower(F.col(anchor_col)), r"\s+")).alias("term"),
        )
        .where((F.length("term") >= 2) & (F.length("term") <= 50))
    )
    if stop:
        tok = tok.where(~F.col("term").isin(stop))
    return tok.groupBy("dst", "term").agg(
        F.count("*").alias("tf"),
        F.countDistinct("src").alias("n_srcs"),
    )
