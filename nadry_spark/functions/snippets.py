"""Snippet extraction — F15 (api/SearchWrapper.java:566-638).

findFirstContextMatch: the first sentence containing any query token
(token order = query order, case-insensitive substring match); >240
chars -> center the match at 1/3 with ellipses; fallback = first
sentence (truncated at 200) else first 200 chars.

Sentence boundaries: the reference uses BreakIterator.getSentenceInstance
(Locale.US). Python has no ICU in this env; the splitter below follows
the dominant BreakIterator behaviour for news-like prose (break after
.!? + following whitespace). The semantics that matter downstream
(first-match-wins, centering, fallbacks) are byte-exact per our goldens.

Runs as a pandas UDF on the final top-k page only (k rows — cheap;
enrichment is late-materialized exactly like the reference :198-201).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SENT_END = re.compile(r"[.!?]+[\)\]\"']*\s+")

MAX_LENGTH = 240
FALLBACK_MAX = 200


def _sentence_spans(content: str) -> list[tuple[int, int]]:
    spans = []
    start = 0
    for m in _SENT_END.finditer(content):
        spans.append((start, m.end()))
        start = m.end()
    if start < len(content):
        spans.append((start, len(content)))
    return spans or [(0, len(content))]


def find_first_context_match(content: str | None, query_tokens: list[str]) -> str:
    if not content or not query_tokens:
        return "No content available or no valid search terms."
    lower = content.lower()
    for token in query_tokens:
        if not token:
            continue
        idx = lower.find(token.lower())
        if idx == -1:
            continue
        # sentence containing the match
        start, end = 0, len(content)
        for s, e in _sentence_spans(content):
            if s <= idx < e:
                start, end = s, e
                break
        sentence = content[start:end].strip()
        if len(sentence) > MAX_LENGTH:
            tpos = sentence.lower().find(token.lower())
            snip_start = max(0, tpos - MAX_LENGTH // 3)
            snip_end = min(len(sentence), snip_start + MAX_LENGTH)
            prefix = "..." if snip_start > 0 else ""
            suffix = "..." if snip_end < len(sentence) else ""
            sentence = prefix + sentence[snip_start:snip_end] + suffix
        return sentence
    # fallback: first sentence, truncated
    s, e = _sentence_spans(content)[0]
    first = content[s:e].strip()
    if first:
        if len(first) > FALLBACK_MAX:
            first = first[:FALLBACK_MAX] + "..."
        return first
    if len(content) > FALLBACK_MAX:
        return content[:FALLBACK_MAX] + "..."
    return content


def snippet_udf(query_tokens: list[str]):
    """Build a pandas UDF closed over the (tiny) query token list."""

    @F.pandas_udf(T.StringType())
    def _snip(content: pd.Series) -> pd.Series:
        return content.map(lambda c: find_first_context_match(c, query_tokens))

    return _snip
