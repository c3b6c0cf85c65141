"""Tokenizer pipeline goldens — exact reference semantics.

Pinned against Tokenizer.java:35-97 step ordering: NFC -> special-token
extraction -> masking -> lowercase/strip/split -> length filter ->
stopword filter -> Porter2 -> special-token append.
"""

from nadry_spark.functions.tokenizer import (
    extract_special_tokens,
    replace_special_tokens,
    tokenize,
)


def test_empty():
    assert tokenize(None) == []
    assert tokenize("") == []


def test_plain_words_stemmed_and_stopwords_dropped():
    # 'the'/'is' are stopwords; 'running' stems; 'cat' (len 3) skips stemming
    assert tokenize("The cat is running") == ["cat", "run"]


def test_short_and_long_tokens_filtered():
    # 1-char dropped, 51-char dropped, 50-char kept (then stemmed)
    tok50 = "b" * 50
    tok51 = "c" * 51
    out = tokenize(f"a {tok50} {tok51} ok")
    assert out == [tok50, "ok"]


def test_email_masking_and_append():
    out = tokenize("Contact Test@Example.COM for info")
    # email replaced by _EMAIL_ -> _email_ passes filters unstemmed;
    # 'for' stopword dropped; 'contact'/'info' stemmed; special appended last
    assert out == ["contact", "_email_", "info", "email:test@example.com"]


def test_url_masking_and_append():
    out = tokenize("see https://Spark.Apache.ORG/docs now")
    assert out == ["see", "_url_", "now", "url:https://spark.apache.org/docs"]


def test_number_masking_and_append():
    out = tokenize("version 3.14 released 2024")
    assert out == [
        "version",
        "_num_",
        "releas",
        "_num_",
        "num:3.14",
        "num:2024",
    ]


def test_special_token_order_email_url_num():
    text = "9 www.a.com x@y.io"
    specials = extract_special_tokens(text)
    assert specials == ["email:x@y.io", "url:www.a.com", "num:9"]


def test_mask_order():
    # EMAIL masked first, then URL, then NUM
    assert replace_special_tokens("a@b.co www.c.de 7") == "_EMAIL_ _URL_ _NUM_"


def test_punctuation_to_space():
    assert tokenize("hello,world;foo-bar") == ["hello", "world", "foo", "bar"]


def test_stopwords_case_insensitive():
    assert tokenize("THE AND WAS dog") == ["dog"]


def test_underscore_tokens_survive():
    # a literal _email_ in input passes the stopword bypass and skips stemming
    assert tokenize("x _email_ y") == ["_email_"]


def test_nfc_normalization():
    # e + combining acute (NFD) -> é (NFC) -> non-[a-z0-9_] -> space
    decomposed = "café table"
    assert tokenize(decomposed) == ["caf", "tabl"]


def test_number_inside_word_not_special():
    # \b\d+\b requires boundaries; 'abc123' has no boundary before 123
    # (letters and digits are both word chars) -> no num: token
    out = tokenize("abc123")
    assert out == ["abc123"]


def test_unicode_digits_not_matched():
    # Java \d is ASCII-only; arabic-indic digits must not produce num:
    out = tokenize("١٢٣ word")
    assert out == ["word"]


def test_stemming_len_gt_3_only():
    # 'ties' (len 4) stems to 'tie'; 'tie' (len 3) untouched
    assert tokenize("ties tie") == ["tie", "tie"]


def test_query_like_phrase():
    assert tokenize("generously funded national libraries") == [
        "generous",
        "fund",
        "nation",
        "librari",
    ]


def test_token_run_findall_equals_spec_pipeline():
    """The hot-path findall formulation must equal the spec's
    sub(non-token)->collapse->split pipeline for arbitrary input."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nadry_spark.functions.tokenizer import _NON_TOKEN, _TOKEN_RUN, _WS_RUN

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=120))
    def check(s):
        low = s.lower()
        cleaned = _WS_RUN.sub(" ", _NON_TOKEN.sub(" ", low)).strip()
        spec = cleaned.split(" ") if cleaned else []
        assert _TOKEN_RUN.findall(low) == spec

    check()
