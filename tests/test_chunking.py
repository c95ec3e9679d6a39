"""Token-window chunking: coverage, overlap, size, edge cases."""

from __future__ import annotations

import pytest


def _chunks(spark, texts, size, overlap):
    from bunsen_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    out = chunk_documents(df, chunk_size=size, overlap=overlap)
    by_doc: dict[int, list] = {}
    for r in out.orderBy("doc_id", "chunk_id").collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    return by_doc


def test_short_doc_single_chunk(spark):
    by_doc = _chunks(spark, ["a b c"], size=8, overlap=2)
    (rows,) = by_doc.values()
    assert len(rows) == 1
    assert rows[0].chunk_text == "a b c"
    assert rows[0].chunk_tokens == 3 and rows[0].n_chunks == 1


def test_coverage_and_overlap(spark):
    n, size, overlap = 23, 8, 3
    words = [f"w{i}" for i in range(n)]
    by_doc = _chunks(spark, [" ".join(words)], size=size, overlap=overlap)
    (rows,) = by_doc.values()
    stride = size - overlap
    # every chunk except possibly the last is full-size
    for r in rows[:-1]:
        assert r.chunk_tokens == size
    # stitching chunk i's first `stride` tokens plus the last chunk in
    # full reconstructs the document exactly
    rebuilt: list[str] = []
    for r in rows[:-1]:
        rebuilt.extend(r.chunk_text.split(" ")[:stride])
    rebuilt.extend(rows[-1].chunk_text.split(" "))
    assert rebuilt == words
    # consecutive chunks share exactly `overlap` tokens (except final pair)
    for a, b in zip(rows, rows[1:-1] or []):
        assert a.chunk_text.split(" ")[stride:] == b.chunk_text.split(" ")[:overlap]


def test_exact_boundary_no_empty_tail(spark):
    # n == size, and n == size + stride: both must avoid an empty chunk
    size, overlap = 6, 2
    stride = size - overlap
    for n in (size, size + stride, size + 2 * stride):
        words = [f"t{i}" for i in range(n)]
        by_doc = _chunks(spark, [" ".join(words)], size=size, overlap=overlap)
        (rows,) = by_doc.values()
        assert all(r.chunk_tokens > 0 for r in rows)
        assert rows[0].n_chunks == len(rows)
        # last chunk ends exactly at the last token
        last = rows[-1]
        start = last.chunk_id * stride
        assert start + last.chunk_tokens == n


def test_param_validation(spark):
    from bunsen_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=8, overlap=-1)


@pytest.mark.slow
def test_chunking_invariants_property(spark):
    """Property sweep across (n_tokens, size, overlap): full coverage in
    order, all-but-last chunks full, last chunk non-empty, declared
    n_chunks matches."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    cases = []

    @settings(
        max_examples=30,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        n=st.integers(min_value=0, max_value=120),
        size=st.integers(min_value=2, max_value=24),
        overlap_frac=st.floats(min_value=0.0, max_value=0.9),
    )
    def collect(n, size, overlap_frac):
        overlap = min(int(size * overlap_frac), size - 1)
        cases.append((n, size, overlap))

    collect()
    # one Spark job for the whole sweep: one doc per case, chunked with
    # per-case params via separate frames, unioned
    from bunsen_spark.operators.chunking import chunk_documents

    for n, size, overlap in {(n, s, o) for n, s, o in cases}:
        words = [f"w{i}" for i in range(n)]
        df = spark.createDataFrame([(0, " ".join(words))], "doc_id int, text string")
        rows = sorted(
            chunk_documents(df, chunk_size=size, overlap=overlap).collect(),
            key=lambda r: r.chunk_id,
        )
        stride = size - overlap
        if n == 0:
            assert rows == [], (size, overlap)  # empty doc: zero chunks
            continue
        assert rows[0].n_chunks == len(rows)
        rebuilt = []
        for r in rows[:-1]:
            assert r.chunk_tokens == size
            rebuilt.extend(r.chunk_text.split(" ")[:stride])
        rebuilt.extend(rows[-1].chunk_text.split(" "))
        assert rebuilt == words, (n, size, overlap)


def test_empty_and_whitespace_docs_emit_no_chunks(spark):
    """Empty / whitespace-only docs must produce ZERO chunk rows, not a
    phantom one-token chunk (advisor r4 finding); real docs alongside
    them are unaffected."""
    by_doc = _chunks(spark, ["", "   ", "\t\n ", "real text here"], size=4, overlap=1)
    assert set(by_doc) == {3}
    assert by_doc[3][0].chunk_text == "real text here"
    assert by_doc[3][0].chunk_tokens == 3
