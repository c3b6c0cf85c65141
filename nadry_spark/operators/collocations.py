"""PMI collocation extraction: bigrams whose members co-occur far more
often than independence predicts (Church & Hanks 1990, "Word
Association Norms, Mutual Information, and Lexicography") — the
standard corpus-analysis pass for finding multi-word expressions worth
treating as units (phrase suggestions, synonym candidates, tokenizer
merge seeds).

Shape: one corpus pass materializes the per-doc token array (Generate
node, see dedup.word_shingles), TEXTUALLY adjacent pairs explode from
it in place (a pair only forms when the two tokens are neighbours in
the raw token stream and BOTH survive the tokenizer-lite filter),
then two map-side-combinable counts (unigram, bigram) and two 1-row
totals that ride along as broadcasts.  No corpus-sized shuffle beyond
the two aggregations.

PMI = ln( p(a,b) / (p(a) p(b)) ) with p from the bigram/unigram
spaces; computed as ``ln((c_ab / B) / ((c_a / T) * (c_b / T)))`` with
all divisions before the multiply so the DuckDB oracle mirrors the
exact double-op sequence.  Rounded to 9 dp before ranking; ties break
(w1, w2).  A ``min_count`` floor drops the noise pairs PMI is known to
over-score (hapax pairs get the highest PMI by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nadry_spark.spread import spread_small_scan


def pmi_bigrams(
    docs: DataFrame,
    stopwords: list[str] | None = None,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-k (w1, w2, n_pair, pmi) collocations over the corpus."""
    stop = sorted(set(stopwords or []))

    def _ok(c):
        cond = (F.length(c) >= 2) & (F.length(c) <= 50)
        if stop:
            cond = cond & ~c.isin(stop)
        return cond

    # Generate-array adjacency (see dedup.word_shingles): the token
    # array is materialized through a Generate node, textually-adjacent
    # pairs explode from it in place — no per-doc lead() window, no
    # Exchange+Sort of the token stream. Under-parallel scans are
    # spread by doc first so the two count aggregations' map sides
    # don't serialize on a single-split input.
    docs = spread_small_scan(docs, "doc_id")
    toks = docs.select(
        "doc_id",
        F.explode(F.array(F.split(F.lower(F.col(text_col)), r"\s+"))).alias("toks"),
    )
    pair_arr = F.expr(
        "CASE WHEN size(toks) < 2 THEN array() "
        "ELSE transform(sequence(1, size(toks) - 1), "
        "i -> struct(element_at(toks, i) AS w, element_at(toks, i + 1) AS nx)) END"
    )
    pairs = (
        toks.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.w").alias("w"), F.col("p.nx").alias("nx"))
        .where(_ok(F.col("w")) & _ok(F.col("nx")))
    )

    uni = (
        toks.select(F.explode("toks").alias("w"))
        .where(_ok(F.col("w")))
        .groupBy("w")
        .agg(F.count("*").alias("c_w"))
    )
    tot_uni = uni.agg(F.sum("c_w").alias("t_uni"))
    big = (
        pairs.groupBy(F.col("w").alias("w1"), F.col("nx").alias("w2"))
        .agg(F.count("*").alias("n_pair"))
        .where(F.col("n_pair") >= min_count)
    )
    tot_big = pairs.agg(F.count("*").alias("t_big"))

    p_ab = F.col("n_pair").cast("double") / F.col("t_big").cast("double")
    p_a = F.col("c_a").cast("double") / F.col("t_uni").cast("double")
    p_b = F.col("c_b").cast("double") / F.col("t_uni").cast("double")
    return (
        big.join(uni.select(F.col("w").alias("w1"), F.col("c_w").alias("c_a")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c_w").alias("c_b")), "w2")
        .crossJoin(F.broadcast(tot_uni))
        .crossJoin(F.broadcast(tot_big))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(F.log(p_ab / (p_a * p_b)), 9).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )
