"""Deterministic synthetic Common-Crawl-style pages corpus.

Produces the BASELINE.json ``input_hint`` shape exactly:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

``text`` is derived by running our extractor over ``html`` so the
per-url byte-identity invariant (recomputing extraction reproduces the
column) is testable end-to-end.

The per-page builder is keyed only by ``(seed, page index)`` so
generation is order-independent and can run distributed via
``spark.range(n).mapInPandas`` — the same rows come out whether built
on the driver (tests) or on 1000 executors.

Corpus properties (FIXTURES.md §1):
- Zipf-ish body vocabulary over ~5k synthetic stems, plus the
  reference's 26 stopwords at high frequency and high-DF non-stopword
  skew terms (``news``, ``2024``) for the salted-shuffle path.
- emails / urls / numbers for the special-token pipeline.
- occasional >50-char tokens and NFD text needing NFC.
- script/.ads/.comments blocks that must be stripped.
- https outlinks (Zipf-distributed targets) for PageRank; a few http://
  and dangling links to exercise the drop/membership filters.
"""

from __future__ import annotations

import datetime as _dt
import random

from nadry_spark.functions.htmlextract import process_document

N_SITES = 97
BASE_EPOCH = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)

_SYLLABLES = [
    c + v for c in "btkdlmnprsvz" for v in ["a", "e", "i", "o", "u", "ar", "en", "il", "or", "us"]
]

_STOPWORD_SAMPLE = [
    "the", "and", "of", "in", "is", "at", "on", "for", "with", "as", "by", "to", "a", "an",
]

_SKEW_TERMS = ["news", "2024", "report", "update"]


def _vocab(size: int = 5000) -> list[str]:
    rng = random.Random(1337)
    words: list[str] = []
    seen: set[str] = set()
    while len(words) < size:
        w = "".join(rng.choice(_SYLLABLES) for _ in range(rng.randint(2, 4)))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


_VOCAB = _vocab()


def page_url(i: int) -> str:
    return f"https://site{i % N_SITES}.example.com/p/{i}"


def _zipf_index(rng: random.Random, n: int) -> int:
    # cheap power-law: cubing biases toward low ranks
    return int(n * (rng.random() ** 3)) % n


def _words(rng: random.Random, n: int) -> list[str]:
    out = []
    for _ in range(n):
        r = rng.random()
        if r < 0.28:
            out.append(rng.choice(_STOPWORD_SAMPLE))
        elif r < 0.33:
            out.append(rng.choice(_SKEW_TERMS))
        else:
            out.append(_VOCAB[_zipf_index(rng, len(_VOCAB))])
    return out


def build_page(i: int, n_pages: int, seed: int = 42) -> dict:
    """Build one page row; deterministic in (seed, i, n_pages)."""
    rng = random.Random((seed << 32) ^ i)
    url = page_url(i)

    title = " ".join(w.capitalize() for w in _words(rng, rng.randint(3, 6)))
    desc = " ".join(_words(rng, rng.randint(8, 15)))

    paras = []
    for _ in range(rng.randint(2, 5)):
        sentence_words = _words(rng, rng.randint(20, 60))
        # sprinkle specials
        if rng.random() < 0.4:
            sentence_words.insert(
                rng.randrange(len(sentence_words)), f"user{rng.randint(0, 99)}@mail{rng.randint(0, 9)}.com"
            )
        if rng.random() < 0.3:
            sentence_words.insert(
                rng.randrange(len(sentence_words)), f"https://ref{rng.randint(0, 30)}.example.org/d/{rng.randint(0, 999)}"
            )
        if rng.random() < 0.5:
            sentence_words.insert(rng.randrange(len(sentence_words)), str(rng.randint(1, 99999)))
        if rng.random() < 0.05:
            sentence_words.append("x" * rng.randint(51, 60))  # >50-char token (filtered)
        if rng.random() < 0.05:
            sentence_words.append("café münchen")  # NFD, needs NFC
        paras.append(" ".join(sentence_words) + ".")

    # outlinks: Zipf toward low page ids (popular pages), some messy forms
    links = []
    for _ in range(rng.randint(3, 10)):
        j = _zipf_index(rng, n_pages)
        href = page_url(j)
        r = rng.random()
        if r < 0.10:
            href = href.upper().replace("HTTPS://", "https://")  # mixed case
        elif r < 0.18:
            href = href + "#section" + str(rng.randint(1, 5))  # fragment
        elif r < 0.24:
            href = href + f"?b={rng.randint(0,9)}&a={rng.randint(0,9)}&"  # unsorted query
        elif r < 0.28:
            href = href.replace("https://", "http://")  # dropped by normalizer
        links.append(href)
    if rng.random() < 0.15:
        links.append(f"https://external{rng.randint(0, 999)}.example.net/x")  # dangling

    anchor_html = "".join(
        f'<a href="{h}">{" ".join(_words(rng, 2))}</a> ' for h in links
    )
    body_paras = "".join(f"<p>{p}</p>\n" for p in paras)
    lang_r = rng.random()
    lang = "en" if lang_r < 0.95 else ("de" if lang_r < 0.975 else "ar")

    html = (
        "<!DOCTYPE html>\n<html><head>\n"
        f"<title>{title}</title>\n"
        f'<meta name="description" content="{desc}">\n'
        "<script>var tracker = 'junk';</script>\n"
        "</head>\n<body>\n"
        f"<main>\n<h1>{title}</h1>\n{body_paras}</main>\n"
        f'<div class="ads">SPONSORED {" ".join(_words(rng, 5))}</div>\n'
        f'<div class="comments"><p>{" ".join(_words(rng, 8))}</p></div>\n'
        f"<footer>{anchor_html}</footer>\n"
        "</body></html>"
    )

    text = process_document(html, url)["content"]
    ts = BASE_EPOCH + _dt.timedelta(seconds=37 * i)
    return {
        "url": url,
        "warc_ts": ts,
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
    }


# ---------------------------------------------------------------------------
# Writers
# ---------------------------------------------------------------------------

PAGES_SCHEMA_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def filter_blocked_domains(pages, blocked: tuple[str, ...] = ("wikipedia",)):
    """P4 domain blocklist (WebCrawler.java:66-67: url.contains ->
    skip) as an input-prep filter."""
    from pyspark.sql import functions as F

    out = pages
    for frag in blocked:
        out = out.where(~F.col("url").contains(frag))
    return out


def dedup_input_pages(pages):
    """P2 visited-filter analog for batch input: one row per url,
    earliest warc_ts wins (re-crawls dropped)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("url").orderBy(F.asc("warc_ts"))
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def generate_pages_parquet(path: str, n_pages: int, seed: int = 42) -> None:
    """Driver-side writer for small test corpora (no Spark needed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [build_page(i, n_pages, seed) for i in range(n_pages)]
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("warc_ts", pa.timestamp("us", tz="UTC")),
                ("html", pa.binary()),
                ("text", pa.string()),
                ("lang", pa.string()),
            ]
        ),
    )
    pq.write_table(table, path)


def pages_dataframe(spark, n_pages: int, seed: int = 42, partitions: int | None = None):
    """Distributed generator: one task per partition, deterministic per id.

    This is the 100TB-scale path — generation parallelism scales with the
    cluster, no driver bottleneck.
    """
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = [build_page(int(i), n_pages, seed) for i in pdf["id"]]
            out = pd.DataFrame(rows)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True)
            yield out

    num_parts = partitions or max(1, min(256, n_pages // 500 or 1))
    return (
        spark.range(0, n_pages, numPartitions=num_parts)
        .mapInPandas(gen, schema=PAGES_SCHEMA_DDL)
    )
