"""The streaming mapInPandas block encoder must produce byte-identical
blocks to the per-(shard, term) applyInPandas reference encoder,
including when Arrow batches split a term's run."""

import numpy as np
import pandas as pd


def _mk_frame(n_terms=40, max_docs=300, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for t in range(n_terms):
        shard = t % 3
        docs = np.sort(rng.choice(10_000, size=rng.integers(1, max_docs), replace=False))
        for d in docs:
            rows.append((shard, f"term{t:03d}", int(d), int(rng.integers(1, 50)), int(rng.integers(10, 500))))
    pdf = pd.DataFrame(rows, columns=["shard", "term", "doc_no", "tf", "dl"])
    return pdf.sort_values(["shard", "term", "doc_no"]).reset_index(drop=True)


def _reference_blocks(pdf, avgdl, k1, b, block_size):
    from nadry_spark.sources.segments import _encode_blocks_fn

    fn = _encode_blocks_fn(avgdl, k1, b, block_size)
    outs = []
    for (shard, term), g in pdf.groupby(["shard", "term"]):
        outs.append(fn((shard, term), g))
    return pd.concat(outs, ignore_index=True)


def _stream_blocks(pdf, avgdl, k1, b, block_size, batch_size):
    from nadry_spark.sources.segments import _encode_blocks_stream

    fn = _encode_blocks_stream(avgdl, k1, b, block_size)
    batches = [pdf.iloc[i : i + batch_size] for i in range(0, len(pdf), batch_size)]
    return pd.concat(list(fn(iter(batches))), ignore_index=True)


def _canon(df):
    df = df.sort_values(["shard", "term", "min_doc_no"]).reset_index(drop=True)
    return [
        (
            r.shard, r.term, r.min_doc_no, r.max_doc_no, int(r.n_docs),
            bytes(r.docs_bin), bytes(r.tfs_bin), bytes(r.dls_bin),
            round(float(r.max_tfnorm), 12),
        )
        for r in df.itertuples()
    ]


def test_stream_encoder_equals_reference_various_batch_sizes():
    pdf = _mk_frame()
    ref = _canon(_reference_blocks(pdf, avgdl=120.0, k1=1.2, b=0.75, block_size=128))
    for batch_size in (17, 100, 1000, len(pdf)):
        got = _canon(_stream_blocks(pdf, 120.0, 1.2, 0.75, 128, batch_size))
        assert got == ref, f"batch_size={batch_size}"


def test_stream_encoder_tiny_blocks():
    pdf = _mk_frame(n_terms=10, max_docs=20, seed=9)
    ref = _canon(_reference_blocks(pdf, 50.0, 1.2, 0.75, 4))
    got = _canon(_stream_blocks(pdf, 50.0, 1.2, 0.75, 4, 7))
    assert got == ref


def test_stream_encoder_equiv_fuzz():
    """Hypothesis sweep: byte-identical blocks for arbitrary corpus
    shapes x block sizes x Arrow batch boundaries (runs split anywhere,
    including mid-block and across single-row batches)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        seed=st.integers(min_value=0, max_value=10_000),
        n_terms=st.integers(min_value=1, max_value=8),
        max_docs=st.integers(min_value=2, max_value=40),
        block_size=st.integers(min_value=1, max_value=16),
        batch_size=st.integers(min_value=1, max_value=60),
    )
    @settings(max_examples=120, deadline=None)
    def run(seed, n_terms, max_docs, block_size, batch_size):
        pdf = _mk_frame(n_terms=n_terms, max_docs=max_docs, seed=seed)
        ref = _canon(_reference_blocks(pdf, 80.0, 1.2, 0.75, block_size))
        got = _canon(_stream_blocks(pdf, 80.0, 1.2, 0.75, block_size, batch_size))
        assert got == ref

    run()


def test_block_decode_roundtrip_from_stream():
    from nadry_spark.operators.codecs import decode_posting_block

    pdf = _mk_frame(n_terms=5, max_docs=50, seed=1)
    blocks = _stream_blocks(pdf, 100.0, 1.2, 0.75, 16, 23)
    got = {}
    for r in blocks.itertuples():
        d, t, L = decode_posting_block(bytes(r.docs_bin), bytes(r.tfs_bin), bytes(r.dls_bin))
        for dn, tf, dl in zip(d, t, L):
            got[(r.shard, r.term, int(dn))] = (int(tf), int(dl))
    want = {
        (r.shard, r.term, r.doc_no): (r.tf, r.dl) for r in pdf.itertuples()
    }
    assert got == want
