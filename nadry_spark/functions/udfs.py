"""Vectorized pandas UDF wrappers over the pure text core.

Every text op runs as an Arrow-batched pandas UDF — no per-row Python
anywhere (BASELINE.json input_hint requirement). The pure functions in
tokenizer.py / htmlextract.py are imported at module scope so each
executor pays import cost once per worker, not per batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nadry_spark.functions.htmlextract import extract_anchor_links, process_document
from nadry_spark.functions.tokenizer import tokenize

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
    ]
)


@F.pandas_udf(EXTRACT_SCHEMA)
def extract_udf(html: pd.Series, url: pd.Series) -> pd.DataFrame:
    """DocumentProcessor.process (F1-F4) for a batch of pages.

    Accepts binary or string html; rows skipped by the reference
    (empty / >100MB) come back as all-null structs for a downstream
    filter.

    Marked non-deterministic below (the function itself is pure):
    extract_documents filters on the UDF-computed struct
    (doc.content IS NOT NULL), and the optimizer's filter pushdown
    otherwise duplicates the evaluation — one ArrowEvalPython under
    the pushed filter and a second one re-parsing every surviving
    page for the projection (optimization-guide §4.4 pattern; observed
    as two extract_udf nodes in the build plan). Non-determinism
    forbids the copy, halving the extraction stage.
    """
    rows = []
    for h, u in zip(html, url):
        if isinstance(h, (bytes, bytearray)):
            h = h.decode("utf-8", errors="replace")
        doc = process_document(h, u) if h is not None else None
        if doc is None:
            rows.append({"title": None, "description": None, "content": None, "links": None})
        else:
            rows.append(
                {
                    "title": doc["title"],
                    "description": doc["description"],
                    "content": doc["content"],
                    "links": doc["links"],
                }
            )
    return pd.DataFrame(rows)


# see docstring: forbids the optimizer's duplicate-evaluation copy
# around filters on the UDF output; the function is pure
extract_udf = extract_udf.asNondeterministic()


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(text: pd.Series) -> pd.Series:
    """Tokenizer.tokenize (F6-F12) for a batch of strings."""
    return text.map(lambda s: tokenize(s) if s is not None else [])


ANCHOR_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("dst", T.StringType()),
            T.StructField("anchor", T.StringType()),
        ]
    )
)


@F.pandas_udf(ANCHOR_SCHEMA)
def anchor_links_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    """extract_anchor_links for a batch of pages: per-occurrence
    (dst, anchor) rows feeding operators/anchors.anchor_term_index."""
    out = []
    for h, u in zip(html, url):
        if isinstance(h, (bytes, bytearray)):
            h = h.decode("utf-8", errors="replace")
        out.append(
            [{"dst": d, "anchor": a} for d, a in extract_anchor_links(h, u)]
        )
    return pd.Series(out)
