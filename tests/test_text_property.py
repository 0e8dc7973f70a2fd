"""Property-based tests for the text/corpus-prep operators.

Each property is checked against a pure-Python reference computation
over Hypothesis-generated documents — covering tokenization edge cases
(empty text, repeated separators, unicode-free ASCII word salad) that
fixed fixtures miss. Spark evaluation is batched: Hypothesis builds
the corpus list, ONE createDataFrame + collect per property (per-example
Spark jobs would be prohibitively slow).
"""

import re

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

WORD = st.text(alphabet="abcxyz", min_size=1, max_size=4)
DOC = st.lists(WORD, min_size=0, max_size=30).map(" ".join)
CORPUS = st.lists(DOC, min_size=1, max_size=12)

_SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(docs=CORPUS, n=st.integers(2, 6), overlap=st.integers(0, 2))
@_SLOW
def test_chunks_reconstruct_documents(spark, docs, n, overlap):
    from hbase_rdf_spark.ops.packing import chunk_documents

    if overlap >= n:
        overlap = n - 1
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_tokens=n, overlap=overlap).collect()
    stride = n - overlap
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, doc in enumerate(docs):
        toks = doc.split()
        rows = sorted(by_doc.get(i, []), key=lambda r: r.chunk_idx)
        if not toks:
            assert rows == []
            continue
        assert rows, f"doc {i} produced no chunks"
        # stitching: first `stride` tokens of every chunk + the tail of
        # the last chunk reconstructs the document exactly
        rebuilt: list[str] = []
        for r in rows[:-1]:
            rebuilt.extend(r.chunk_text.split()[:stride])
        rebuilt.extend(rows[-1].chunk_text.split())
        assert rebuilt == toks
        # coverage + size invariants
        for r in rows:
            assert r.n_chunk_tokens == len(r.chunk_text.split())
            assert r.chunk_text.split() == toks[
                r.tok_start : r.tok_start + n
            ]


@given(docs=CORPUS)
@_SLOW
def test_redact_pii_leaves_no_matches(spark, docs):
    from hbase_rdf_spark.ops.text import PII_PATTERNS, redact_pii

    # splice deterministic PII into half the docs
    spiked = [
        d + f" u{i}@ex.com +1-555-001{i % 10} 10.0.0.{i % 256}"
        if i % 2 == 0 else d
        for i, d in enumerate(docs)
    ]
    df = spark.createDataFrame(
        list(enumerate(spiked)), "doc_id long, text string"
    )
    for r in redact_pii(df).collect():
        for kind, pat in PII_PATTERNS.items():
            assert not re.search(pat, r.red_text), (kind, r.red_text)
        # counts are consistent with the tags present
        for kind in PII_PATTERNS:
            assert getattr(r, f"n_{kind}") >= (
                1 if f"<{kind.upper()}>" in r.red_text else 0
            )


@given(docs=CORPUS, n=st.integers(1, 4))
@_SLOW
def test_contamination_self_and_disjoint(spark, docs, n):
    from hbase_rdf_spark.ops.contamination import benchmark_contamination

    corpus = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    # bench == corpus → every doc with >= n tokens has overlap 1.0
    out = benchmark_contamination(
        corpus, corpus, n=n, threshold=0.5
    ).collect()
    expect = {i for i, d in enumerate(docs) if len(d.split()) >= n}
    assert {r.doc_id for r in out} == expect
    assert all(r.overlap == 1.0 and r.contaminated == 1 for r in out)
    # disjoint-vocabulary bench → overlap 0 everywhere
    bench = spark.createDataFrame([(0, "q w e r t")], "doc_id long, text string")
    out2 = benchmark_contamination(corpus, bench, n=n, threshold=0.5)
    assert all(
        r.n_matched == 0 and r.contaminated == 0 for r in out2.collect()
    )
