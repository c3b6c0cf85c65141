"""Compression round-trip properties (SURVEY.md §5 item 3)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from nadry_spark.operators.codecs import (
    bm25_tfnorm,
    decode_posting_block,
    delta_decode,
    delta_encode,
    encode_posting_block,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert varint_decode(varint_encode(arr)).tolist() == values


@given(st.sets(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300))
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.uint64)
    assert delta_decode(delta_encode(arr)).tolist() == sorted(ids)


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.sets(st.integers(min_value=0, max_value=1 << 20), max_size=40).map(sorted),
        ),
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
def test_position_lists_roundtrip(rows):
    from nadry_spark.operators.codecs import (
        decode_position_lists,
        encode_position_lists,
    )

    bufs, counts = encode_position_lists(rows)
    assert counts.tolist() == [len(r) if r is not None else 0 for r in rows]
    # batch decode == all rows' values concatenated in order
    flat = decode_position_lists(bufs, counts).tolist()
    want = [v for r in rows if r for v in r]
    assert flat == want
    # every row also decodes standalone from its own buffer slice
    for r, b, c in zip(rows, bufs, counts):
        assert decode_position_lists([b], np.array([c])).tolist() == (list(r) if r else [])


def test_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").tolist() == []
    assert delta_decode(delta_encode(np.array([], dtype=np.uint64))).tolist() == []


def test_block_roundtrip():
    docs = np.array([3, 17, 18, 200, 100000], dtype=np.uint64)
    tfs = np.array([1, 5, 2, 130, 7], dtype=np.uint64)
    dls = np.array([100, 250, 90, 4000, 17], dtype=np.uint64)
    blk = encode_posting_block(docs, tfs, dls)
    d, t, L = decode_posting_block(blk["docs_bin"], blk["tfs_bin"], blk["dls_bin"])
    assert d.tolist() == docs.tolist()
    assert t.tolist() == tfs.tolist()
    assert L.tolist() == dls.tolist()
    assert blk["min_doc_no"] == 3 and blk["max_doc_no"] == 100000 and blk["n"] == 5


def test_compression_is_compact():
    # sequential ids: gap=1 -> 1 byte each after the first
    docs = np.arange(1000, 1128, dtype=np.uint64)
    enc = delta_encode(docs)
    assert len(enc) < 2 + 127 * 1 + 2


def test_bm25_tfnorm_monotone_in_tf():
    tfs = np.array([1, 2, 4, 8], dtype=np.uint64)
    dls = np.full(4, 100, dtype=np.uint64)
    s = bm25_tfnorm(tfs, dls, avgdl=100.0, k1=1.2, b=0.75)
    assert np.all(np.diff(s) > 0)
    assert np.all(s <= 1.2 + 1.0)  # bounded by k1+1


@given(st.lists(st.integers(min_value=0, max_value=2**52), max_size=300))
@settings(max_examples=200, deadline=None)
def test_pfor_roundtrip(values):
    from nadry_spark.operators.codecs import pfor_decode, pfor_encode

    arr = np.array(values, dtype=np.uint64)
    assert pfor_decode(pfor_encode(arr)).tolist() == values


@given(st.sets(st.integers(min_value=0, max_value=2**48), min_size=1, max_size=300))
@settings(max_examples=200, deadline=None)
def test_delta_pfor_roundtrip(ids):
    from nadry_spark.operators.codecs import delta_pfor_decode, delta_pfor_encode

    arr = np.array(sorted(ids), dtype=np.uint64)
    assert delta_pfor_decode(delta_pfor_encode(arr)).tolist() == sorted(ids)


def test_pfor_block_roundtrip_and_size():
    from nadry_spark.operators.codecs import (
        delta_encode,
        delta_pfor_encode,
        pfor_encode,
    )

    rng = np.random.default_rng(5)
    doc_nos = (np.cumsum(rng.integers(1, 4, 128)) + 5_000_000).astype(np.uint64)
    tfs = rng.integers(1, 9, 128).astype(np.uint64)
    dls = rng.integers(40, 400, 128).astype(np.uint64)
    for codec in ("varint", "pfor"):
        blk = encode_posting_block(doc_nos, tfs, dls, codec=codec)
        d, t, l = decode_posting_block(
            blk["docs_bin"], blk["tfs_bin"], blk["dls_bin"], codec=codec
        )
        assert (d == doc_nos).all() and (t == tfs).all() and (l == dls).all()
    # the point of PFor: dense gap blocks pack well below varint's
    # 1-byte-per-value floor
    assert len(delta_pfor_encode(doc_nos)) < len(delta_encode(doc_nos)) * 0.6
    # outlier-heavy data still round-trips via the exception patch list
    spiky = np.where(
        rng.random(128) < 0.06,
        rng.integers(0, 2**45, 128),
        rng.integers(0, 4, 128),
    ).astype(np.uint64)
    from nadry_spark.operators.codecs import pfor_decode

    assert (pfor_decode(pfor_encode(spiky)) == spiky).all()
    # spiky data should still beat varint (exceptions are rare)
    assert len(pfor_encode(spiky)) < len(varint_encode(spiky))
