"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

All hot-path variants are pure column expressions (JVM, codegen);
the rolling-hash fingerprint also has a pandas-UDF variant for the
n-gram-window form that SQL can't express cheaply.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nadry_spark.spread import spread_small_scan
from pyspark.sql import types as T

# tiny per-language stopword signatures (public common-word lists)
LANG_SIGNATURES = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "por"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
}


def _tokens(text_col: str) -> Column:
    return F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.length(t) > 0)


def lang_scores(text_col: str) -> dict[str, Column]:
    """Per-language hit ratio of signature words among tokens."""
    toks = _tokens(text_col)
    n = F.greatest(F.size(toks), F.lit(1))
    out = {}
    for lang, sig in LANG_SIGNATURES.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(sig)))
        out[lang] = (hits / n).alias(f"score_{lang}")
    return out


def lang_pred_col(text_col: str, min_score: float = 0.05) -> Column:
    """Column form of :func:`lang_id`'s lang_pred (argmax signature
    ratio, 'und' below floor; ties by score desc then lexicographic
    lang) — for single-pass pipelines that fuse several per-doc
    predicates into one projection."""
    scores = lang_scores(text_col)
    pairs = [F.struct(col.alias("s"), F.lit(lang).alias("l")) for lang, col in sorted(scores.items())]
    best = F.greatest(*pairs) if len(pairs) > 1 else pairs[0]
    return F.when(best["s"] >= min_score, best["l"]).otherwise("und")


def lang_id(df: DataFrame, id_col: str, text_col: str, min_score: float = 0.05) -> DataFrame:
    """(id, lang, lang_score): argmax signature ratio, 'und' below floor.

    Deterministic tie-break: higher score wins, then lexicographic lang.
    """
    scores = lang_scores(text_col)
    pairs = [F.struct(col.alias("s"), F.lit(lang).alias("l")) for lang, col in sorted(scores.items())]
    best = F.greatest(*pairs) if len(pairs) > 1 else pairs[0]
    return df.select(
        F.col(id_col),
        F.when(best["s"] >= min_score, best["l"]).otherwise("und").alias("lang_pred"),
        best["s"].alias("lang_score"),
    )


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality signals: length, token count, mean word length,
    alpha ratio, digit ratio, stopword ratio, uniqueness ratio."""
    toks = _tokens(text_col)
    n_toks = F.size(toks)
    text_len = F.length(F.col(text_col))
    en = LANG_SIGNATURES["en"]
    return df.select(
        F.col(id_col),
        text_len.alias("n_chars"),
        n_toks.alias("n_tokens"),
        (text_len / F.greatest(n_toks, F.lit(1))).alias("mean_word_len"),
        (
            F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", ""))
            / F.greatest(text_len, F.lit(1))
        ).alias("alpha_ratio"),
        (
            F.length(F.regexp_replace(F.col(text_col), r"[^0-9]", ""))
            / F.greatest(text_len, F.lit(1))
        ).alias("digit_ratio"),
        (
            F.size(F.filter(toks, lambda t: t.isin(en)))
            / F.greatest(n_toks, F.lit(1))
        ).alias("stopword_ratio"),
        (
            F.size(F.array_distinct(toks)) / F.greatest(n_toks, F.lit(1))
        ).alias("unique_ratio"),
    )


def quality_score_col(text_col: str) -> Column:
    """Column form of :func:`quality_score` (same feature expressions,
    same blend, same 9-digit rounding) — for single-pass pipelines."""
    toks = _tokens(text_col)
    n_toks = F.size(toks)
    text_len = F.length(F.col(text_col))
    en = LANG_SIGNATURES["en"]
    alpha_ratio = F.length(
        F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", "")
    ) / F.greatest(text_len, F.lit(1))
    stopword_ratio = F.size(F.filter(toks, lambda t: t.isin(en))) / F.greatest(
        n_toks, F.lit(1)
    )
    unique_ratio = F.size(F.array_distinct(toks)) / F.greatest(n_toks, F.lit(1))
    clamped_len = F.least(n_toks / F.lit(200.0), F.lit(1.0))
    score = (
        0.3 * clamped_len
        + 0.3 * alpha_ratio
        + 0.2 * unique_ratio
        + 0.2 * F.least(stopword_ratio * 5, F.lit(1.0))
    )
    return F.round(score, 9)


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Blended 0-1 quality score from the features (heuristic weights)."""
    feats = quality_features(df, id_col, text_col)
    clamped_len = F.least(F.col("n_tokens") / F.lit(200.0), F.lit(1.0))
    score = (
        0.3 * clamped_len
        + 0.3 * F.col("alpha_ratio")
        + 0.2 * F.col("unique_ratio")
        + 0.2 * F.least(F.col("stopword_ratio") * 5, F.lit(1.0))
    )
    return feats.select(F.col(id_col), F.round(score, 9).alias("quality"))


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace tokens + BPE-ish subword estimate (regex pieces:
    letter-runs, digit-runs, single punctuation marks). RE2-compatible
    pattern so the DuckDB oracle can mirror it exactly."""
    ws = F.size(_tokens(text_col))
    pieces = F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)
        )
    )
    return df.select(
        F.col(id_col),
        ws.alias("ws_tokens"),
        pieces.alias("subword_pieces"),
    )


def md5_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whole-document fingerprint over whitespace-normalized text."""
    normed = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return df.select(F.col(id_col), F.md5(normed).alias("fingerprint"))


_FP_SCHEMA = T.ArrayType(T.LongType())

_FP_W = 32  # window bytes
_FP_B = 131  # polynomial base
# Mersenne-31 modulus: with B^j < 2^31 every term byte*B^j < 2^39 and a
# 32-term window sum < 2^44, so the whole windows-x-powers product/sum
# stays exact in uint64 — the key to a FULLY numpy-vectorized hash (the
# previous 2^61-1 modulus forced a per-byte Python recurrence because
# two ~2^61 factors overflow uint64)
_FP_M = (1 << 31) - 1

# pows[j] = B^(W-1-j) mod M, so hash(window) = sum(window[j]*pows[j]) % M
_FP_POWS = np.empty(_FP_W, dtype=np.uint64)
_FP_POWS[_FP_W - 1] = 1
for _j in range(_FP_W - 2, -1, -1):
    _FP_POWS[_j] = (int(_FP_POWS[_j + 1]) * _FP_B) % _FP_M


@F.pandas_udf(_FP_SCHEMA)
def rolling_fingerprints_udf(text: pd.Series) -> pd.Series:
    """Polynomial hashes of every 32-byte window, sampled via 0 mod 8
    (winnowing-style): the document's robust local fingerprints.

    Vectorized as W contiguous shifted multiply-adds (h[i] = sum_j
    d[i+j] * B^(W-1-j), one fused pass per j over the whole byte
    buffer, single mod at the end — exact in uint64 by the modulus
    choice above) — no per-byte Python, no strided window gather.
    Chunked at 1Mi windows to bound the accumulator at ~8 MB."""

    def fps(s):
        if s is None:
            return []
        data = np.frombuffer(s.encode("utf-8", errors="replace"), dtype=np.uint8)
        if data.size == 0:
            return []
        d = data.astype(np.uint64)
        if d.size < _FP_W:
            h = int((d * _FP_POWS[_FP_W - d.size:]).sum() % _FP_M)
            return [h]
        n_win = d.size - _FP_W + 1
        parts = []
        for st in range(0, n_win, 1 << 20):
            m = min(1 << 20, n_win - st)
            acc = np.zeros(m, dtype=np.uint64)
            for j in range(_FP_W):
                acc += d[st + j : st + j + m] * _FP_POWS[j]
            acc %= _FP_M
            parts.append(acc[acc % 8 == 0])
        hs = np.unique(np.concatenate(parts))
        return hs[:64].astype(np.int64).tolist()

    return text.map(fps)


def winnowing_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, w: int = 4
) -> DataFrame:
    """MOSS-style winnowing (Schleimer et al., SIGMOD'03 — public
    algorithm): hash token k-grams, slide a w-window over the hash
    sequence, keep one minimal hash per window, dedupe. Any run of
    >= w+k-1 shared tokens between two documents is guaranteed to share
    a fingerprint, so matching fingerprints localize near-dup passages
    (not just whole-doc dups like md5_fingerprint).

    Formulation: ONE posexplode of the token stream, k-grams via
    lead() and window-min selection over per-doc windows — lead/min/
    count are codegen'd window functions and the only shuffles are the
    per-doc window partition and the final distinct. (An earlier
    array-of-arrays formulation was O(n^3)/doc: CollapseProject inlines
    the tokenize expression into nested transform() lambdas, so every
    window element re-tokenized the document.) Per-doc partitions are
    bounded by document length — no skew at corpus scale. md5-based and
    mirrored exactly by a DuckDB oracle. Tie rule: min over (md5hex,
    zero-padded position) strings — leftmost-by-hash, deterministic
    (the original paper prefers the rightmost minimum; documented
    deviation).

    Output: (id, pos, fp) — pos is the 0-based k-gram start.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(_tokens(text_col)).alias("pos", "tok"),
    )
    w_ord = Window.partitionBy("id").orderBy("pos")
    gram_parts = [F.col("tok")] + [
        F.lead("tok", i).over(w_ord) for i in range(1, k)
    ]
    gram_h = F.when(
        F.lead("tok", k - 1).over(w_ord).isNotNull(),
        F.concat(
            F.md5(F.concat_ws(" ", *gram_parts)),
            F.lit("|"),
            F.lpad(F.col("pos").cast("string"), 10, "0"),
        ),
    )
    grams = toks.select("id", "pos", gram_h.alias("gh"))
    w_win = w_ord.rowsBetween(0, w - 1)
    sel = grams.select(
        "id",
        F.min("gh").over(w_win).alias("_s"),
        F.count("gh").over(w_win).alias("_cnt"),
    )
    out = sel.where(F.col("_cnt") == w).select("id", "_s").distinct()
    return out.select(
        "id",
        F.split("_s", r"\|")[1].cast("long").alias("pos"),
        F.split("_s", r"\|")[0].alias("fp"),
    )


def winnow_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    fp_cap: int | None = 1000,
    stats: dict | None = None,
) -> DataFrame:
    """Passage-level near-dup pairs: documents sharing at least
    ``min_shared`` winnowing fingerprints (so any >= w+k-1-token run of
    shared text links the pair — catches copied PASSAGES, which
    whole-doc md5/minhash-over-the-full-text miss when the rest of the
    docs differ).

    Same hot-bucket discipline as the LSH caps (shared
    ``dedup.skip_hot_buckets``): a fingerprint selected in more than
    ``fp_cap`` documents is boilerplate, makes the self-join quadratic
    in its bucket, and is SKIPPED — logged and reported via ``stats``
    (``skipped_fps`` / ``max_pairs_dropped``). Never silent.

    Output: (id_a, id_b, n_shared) with id_a < id_b.
    """
    import logging

    from nadry_spark.operators.dedup import skip_hot_buckets

    # one eager materialization: the fingerprint set feeds the cap
    # sweep AND both sides of the self-join — without it the window
    # pipeline recomputes ~4x. localCheckpoint (memory+disk blocks,
    # lineage truncated) so no unpersist ownership leaves this function.
    fps = (
        winnowing_fingerprints(df, id_col, text_col, k, w)
        .select("id", "fp")
        .distinct()
        .localCheckpoint()
    )
    if fp_cap is not None:
        fps = skip_hot_buckets(
            fps, ("fp",), fp_cap,
            op="winnow_dup_pairs", stats=stats, stats_key="skipped_fps",
            logger=logging.getLogger("nadry_spark.textstats"),
        )
    a = fps.alias("a")
    b = fps.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    *,
    min_occurrences: int = 2,
) -> DataFrame:
    """Exact substring-duplication spans — the ExactSubstr dedup of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better" (ACL'22, public paper), re-expressed Spark-first: instead
    of a suffix array (inherently sequential, one machine), hash every
    token k-gram, count occurrences CORPUS-WIDE, and mark a window
    duplicated when its k-gram occurs >= min_occurrences times
    anywhere (self-repeats included, as in the paper). Per document,
    overlapping or adjacent duplicated windows merge into maximal
    token spans via gaps-and-islands — exactly the token ranges
    ExactSubstr would cut, for runs of length >= k.

    Plan shape at 100TB: one posexplode, k-gram hashes via lead()
    windows (codegen, per-doc partitions bounded by doc length), ONE
    groupBy(md5) count for global occurrence, a semi-join of grams
    against the duplicated-hash set (shuffle on 16-byte hashes), then
    per-doc island windows. No self-join, no pair blow-up: boilerplate
    k-grams only ever contribute a count and a membership bit, so a
    stopword-scale gram costs O(df), not O(df^2).

    Output: (id, span_start, span_end, span_tokens, n_windows) with
    token-index spans [span_start, span_end) and
    span_tokens = span_end - span_start >= k.
    """
    from pyspark.sql import Window

    # Generate-array k-gram formation (see dedup.word_shingles): the
    # token array is materialized through a Generate node so the gram
    # transform() reads an attribute — tokenization runs once per doc
    # and the gram stage's per-doc window Exchange+Sort disappears
    # (posexplode of the gram-hash array keeps the 0-based gram start
    # position the island windows key on). Under-parallel scans are
    # spread by doc first so the md5 work doesn't serialize on a
    # single-split input.
    df = spread_small_scan(df, id_col)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(_tokens(text_col))).alias("toks"),
    )
    elems = ", ".join(f"element_at(toks, i + {j})" for j in range(k))
    gh_arr = F.expr(
        f"CASE WHEN size(toks) < {k} THEN array() "
        f"ELSE transform(sequence(1, size(toks) - {k - 1}), "
        f"i -> md5(concat_ws(' ', {elems}))) END"
    )
    grams = (
        toks.select("id", F.posexplode(gh_arr).alias("pos", "gh"))
        .localCheckpoint()  # feeds the count agg AND the semi-join probe
    )
    w_ord = Window.partitionBy("id").orderBy("pos")
    dup_hashes = (
        grams.groupBy("gh")
        .agg(F.count("*").alias("occ"))
        .where(F.col("occ") >= min_occurrences)
        .select("gh")
    )
    dup_windows = grams.join(dup_hashes, "gh", "left_semi").select("id", "pos")
    # gaps-and-islands: windows [pos, pos+k) merge while pos <= prev+k
    # (pos is strictly increasing within a doc, so prev+k is the
    # running max end and the merge test is exact interval merging)
    new_island = F.when(
        F.col("pos") > F.lag("pos", 1, -(10 ** 9)).over(w_ord) + k, 1
    ).otherwise(0)
    islands = dup_windows.select(
        "id", "pos", F.sum(new_island).over(w_ord).alias("island")
    )
    return islands.groupBy("id", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + k).alias("span_end"),
        (F.max("pos") + k - F.min("pos")).alias("span_tokens"),
        F.count("*").alias("n_windows"),
    ).drop("island")


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Training-data PII scrub: emails -> <EMAIL>, URLs -> <URL>,
    numbers -> <NUM>, applied in the reference tokenizer's masking
    order (Tokenizer.java:92-97 — EMAIL, then URL, then NUM, each over
    the previous result). Patterns are the tokenizer's own RE2-safe
    regexes, so Spark (Java regex) and the DuckDB oracle (RE2) agree
    byte-for-byte. Pure column expressions; also emits per-category
    match counts (corpus PII audit columns).

    Output: (id, redacted_md5, n_emails, n_urls, n_nums).
    """
    from nadry_spark.functions.tokenizer import (
        EMAIL_PATTERN,
        NUMBER_PATTERN,
        URL_PATTERN,
    )

    email_re = EMAIL_PATTERN.pattern
    url_re = URL_PATTERN.pattern
    num_re = NUMBER_PATTERN.pattern
    txt = F.col(text_col)
    step1 = F.regexp_replace(txt, email_re, "<EMAIL>")
    step2 = F.regexp_replace(step1, url_re, "<URL>")
    step3 = F.regexp_replace(step2, num_re, "<NUM>")
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(step3).alias("redacted_md5"),
        F.regexp_count(txt, F.lit(email_re)).cast("long").alias("n_emails"),
        F.regexp_count(step1, F.lit(url_re)).cast("long").alias("n_urls"),
        F.regexp_count(step2, F.lit(num_re)).cast("long").alias("n_nums"),
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Gopher-style within-document repetition signals over word
    n-grams (Rae et al. 2021 §A1.1 use duplicate-line and top-n-gram
    fractions as quality filters; web text with high values is
    boilerplate/spam):

      dup_ngram_frac  1 - distinct_ngrams / total_ngrams
      top_ngram_frac  occurrences of the most frequent n-gram / total

    Generate-array n-gram formation (see dedup.word_shingles: the
    token array is materialized through a Generate node so the
    transform() lambda reads an attribute — no CollapseProject
    inlining, no per-doc window Exchange+Sort) then one (id, gram)
    count and one per-id aggregate; all whole-stage-codegen column
    math. Docs with fewer than n tokens emit no n-grams and are absent
    from the output (no ngrams -> repetition undefined)."""
    df = spread_small_scan(df, id_col)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(F.split(F.lower(F.col(text_col)), r"\s+"))).alias("toks"),
    )
    elems = ", ".join(f"element_at(toks, i + {j})" for j in range(n))
    gram_arr = F.expr(
        f"CASE WHEN size(toks) < {n} THEN array() "
        f"ELSE transform(sequence(1, size(toks) - {n - 1}), "
        f"i -> concat_ws(' ', {elems})) END"
    )
    grams = toks.select("id", F.explode(gram_arr).alias("gram"))
    per_gram = grams.groupBy("id", "gram").agg(F.count("*").alias("c"))
    return (
        per_gram.groupBy("id")
        .agg(
            F.sum("c").alias("_total"),
            F.count("*").alias("_distinct"),
            F.max("c").alias("_maxc"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("_total").cast("long").alias("n_ngrams"),
            F.round(1.0 - F.col("_distinct") / F.col("_total"), 9).alias("dup_ngram_frac"),
            F.round(F.col("_maxc") / F.col("_total"), 9).alias("top_ngram_frac"),
        )
    )


def benchmark_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document count of distinct word n-grams shared with a
    benchmark/eval corpus — the decontamination primitive of
    training-data pipelines (an n-gram of the eval set appearing in a
    training doc is leakage; n=8..13 word-grams are the conventional
    probes). Returns (id, n_shared) for contaminated docs only.

    The benchmark keeps its per-row ids through shingling (the shingle
    window partitions by them — shingles must never span two benchmark
    texts), then collapses to DISTINCT n-grams and broadcasts (eval
    sets are tiny next to the corpus); the doc side streams through the
    same row-based shingle shape as word_shingles — one shuffle for
    the per-doc count, none for the probe join."""
    from nadry_spark.operators.dedup import word_shingles

    doc_sh = word_shingles(docs, id_col, text_col, n)
    bench_sh = (
        word_shingles(
            benchmark.select(
                F.col(bench_id_col).alias("bid"), F.col(bench_text_col)
            ),
            "bid", bench_text_col, n,
        )
        .select("shingle")
        .distinct()
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("id")
        .agg(F.count("*").alias("n_shared"))
        .select(F.col("id").alias(id_col), F.col("n_shared").cast("long").alias("n_shared"))
    )


def readability(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Flesch Reading Ease + Flesch-Kincaid grade (Kincaid et al.
    1975) — the classic readability pair, a standard feature in
    document-quality classifiers (easy text != edu text, but the
    grade level separates listicles from prose).

        FRE = 206.835 - 1.015*(W/S) - 84.6*(Syl/W)
        FKG = 0.39*(W/S) + 11.8*(Syl/W) - 15.59

    W = non-empty whitespace tokens, S = sentence-punctuation runs
    ([.!?]+, floored at 1), Syl = per-word max(1, vowel-group count)
    — the standard dictionary-free syllable heuristic. W and S are
    floored at 1 so empty docs score the degenerate constants
    instead of dividing by zero. Pure column expressions (one
    regexp pass per word inside a single-select HOF — no cross-select
    array reference, per the CollapseProject rule); round-9.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: F.length(w) > 0
    )
    syl = F.aggregate(
        F.transform(
            toks,
            lambda w: F.greatest(
                F.lit(1), F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0)))
            ),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    n_words = F.size(toks)
    n_sent = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[.!?]+"), F.lit(0))),
    )
    w0 = F.greatest(F.lit(1), n_words).cast("double")
    s0 = n_sent.cast("double")
    syl_d = syl.cast("double")
    fre = (
        F.lit(206.835)
        - F.lit(1.015) * (w0 / s0)
        - F.lit(84.6) * (syl_d / w0)
    )
    fkg = (
        F.lit(0.39) * (w0 / s0) + F.lit(11.8) * (syl_d / w0) - F.lit(15.59)
    )
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        n_sent.cast("long").alias("n_sentences"),
        syl.cast("long").alias("n_syllables"),
        F.round(fre, 9).alias("flesch"),
        F.round(fkg, 9).alias("fk_grade"),
    )


GOPHER_REQUIRED_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The Gopher quality rules (Rae et al. 2021, "Scaling Language
    Models: ...Gopher", Appendix A) — the named heuristic filter set
    most web-scale pretraining pipelines start from, as one row of
    per-rule evidence plus the combined verdict:

      * 50 <= word count <= 100,000
      * 3 <= mean word length <= 10
      * symbol-to-word ratio < 0.1 (symbols: '#' and '...')
      * < 90% of lines start with a bullet, < 30% end with an ellipsis
      * >= 80% of words contain an alphabetic character
      * >= 2 of the 8 required English stopwords appear

    Pure column expressions (RE2-safe regexes, fixed-order double
    math, round-9) so the DuckDB oracle mirrors every rule bit-for-bit;
    `gopher_pass` is the conjunction, 0/1 for flat cross-engine rows.
    """
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: F.length(w) > 0)
    wc = F.size(words)
    wc_d = F.greatest(F.lit(1), wc).cast("double")
    mean_len = (
        F.aggregate(
            F.transform(words, lambda w: F.length(w)), F.lit(0), lambda a, v: a + v
        ).cast("double")
        / wc_d
    )
    n_hash = F.length(text_col) - F.length(F.replace(F.col(text_col), F.lit("#"), F.lit("")))
    n_ell = (
        F.length(text_col)
        - F.length(F.replace(F.col(text_col), F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = (n_hash + n_ell).cast("double") / wc_d
    lines = F.split(F.col(text_col), "\n")
    nl = F.greatest(F.lit(1), F.size(lines)).cast("double")
    bullet_ratio = (
        F.size(F.filter(lines, lambda l: l.rlike(r"^(•|- )"))).cast("double") / nl
    )
    ellipsis_ratio = (
        F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$"))).cast("double")
        / nl
    )
    alpha_ratio = (
        F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))).cast("double") / wc_d
    )
    low_words = F.array_distinct(F.transform(words, lambda w: F.lower(w)))
    n_stop = F.size(
        F.array_intersect(
            low_words, F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPWORDS])
        )
    )
    gpass = (
        (wc >= 50) & (wc <= 100_000)
        & (mean_len >= 3.0) & (mean_len <= 10.0)
        & (symbol_ratio < 0.1)
        & (bullet_ratio < 0.9)
        & (ellipsis_ratio < 0.3)
        & (alpha_ratio >= 0.8)
        & (n_stop >= 2)
    )
    return df.select(
        F.col(id_col),
        wc.cast("long").alias("word_count"),
        F.round(mean_len, 9).alias("mean_word_len"),
        F.round(symbol_ratio, 9).alias("symbol_ratio"),
        F.round(bullet_ratio, 9).alias("bullet_ratio"),
        F.round(ellipsis_ratio, 9).alias("ellipsis_ratio"),
        F.round(alpha_ratio, 9).alias("alpha_ratio"),
        n_stop.cast("long").alias("n_req_stopwords"),
        gpass.cast("long").alias("gopher_pass"),
    )
