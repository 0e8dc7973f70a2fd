"""Exact duplicated-substring span detection (Lee et al. 2021
ExactSubstr shape, distributed via a word-start-anchored window
fingerprint sweep — see ops/dedup.py duplicated_substring_spans).

Validated against an in-test reference implementation of the same
contract (word-start-anchored windows → corpus-wide fingerprint
counts → marked windows → per-doc merged spans), plus hand-reasoned properties:
cross-document and self-repetition duplicates are found, unique text
is not marked, and short documents are skipped.
"""

from collections import Counter

import pytest

from hbase_rdf_spark.ops.dedup import duplicated_substring_spans


def ref_spans(docs, w, min_count):
    grams = []
    for d, t in docs:
        if len(t) < w:
            continue
        for p in range(1, len(t) - w + 2):
            if p == 1 or t[p - 2] == " ":  # word-start anchors
                grams.append((d, p, t[p - 1:p - 1 + w]))
    cnt = Counter(g for _, _, g in grams)
    marked = sorted((d, p) for d, p, g in grams if cnt[g] >= min_count)
    out = []
    cur = None  # (doc, start, end)
    for d, p in marked:
        if cur is not None and cur[0] == d and p <= cur[2]:
            cur = (d, cur[1], max(cur[2], p + w - 1))
            continue
        if cur is not None:
            out.append(cur)
        cur = (d, p, p + w - 1)
    if cur is not None:
        out.append(cur)
    return sorted(out)


BOILER = "All rights reserved worldwide under applicable law 2024."
DOCS = [
    (1, "unique opening words here. " + BOILER + " then doc one tail text"),
    (2, "totally different start!! " + BOILER + " and doc two closing bit"),
    (3, "no duplication lives in this document at all, every char once"),
    (4, "repeat me now please twice repeat me now please twice padding!"),
    (5, "tiny"),
]


def run(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = duplicated_substring_spans(df, **kw)
    return sorted(
        (r.doc_id, r.span_start, r.span_end) for r in out.collect()
    )


def test_matches_reference_implementation(spark):
    got = run(spark, DOCS, window=20)
    assert got == ref_spans(DOCS, 20, 2)


def test_cross_document_boilerplate_found(spark):
    got = run(spark, DOCS, window=20)
    docs_with_spans = {d for d, _, _ in got}
    assert {1, 2} <= docs_with_spans          # shared boilerplate
    assert 3 not in docs_with_spans           # unique text unmarked
    assert 5 not in docs_with_spans           # shorter than window
    # the span in doc 1 covers the boilerplate region (within stride
    # slack on each side)
    b1 = DOCS[0][1].index(BOILER) + 1
    spans1 = [(s, e) for d, s, e in got if d == 1]
    # the span covers the boilerplate from its first word start
    assert any(s <= b1 and e >= b1 + 19 for s, e in spans1)


def test_self_repetition_found(spark):
    got = run(spark, DOCS, window=20)
    assert 4 in {d for d, _, _ in got}


def test_min_count_threshold(spark):
    # at min_count=3 the twice-occurring boilerplate no longer marks
    got = run(spark, DOCS, window=20, min_count=3)
    assert {d for d, _, _ in got} <= {4}  # self-repeat may hit 3 windows


def test_overlapping_windows_merge_to_one_span(spark):
    # identical docs with word starts every 2 chars — the marked
    # windows overlap and must merge into ONE maximal span per doc
    t = "a " * 60  # anchors at 1, 3, 5, …; len 120
    docs = [(1, t), (2, t)]
    got = run(spark, docs, window=20)
    assert got == ref_spans(docs, 20, 2)
    assert [x for x in got if x[0] == 1] == [(1, 1, 120)]


def test_reference_agreement_on_degenerate_corpus(spark):
    docs = [(1, "ab" * 40), (2, "ba" * 40), (3, "ab" * 40)]
    got = run(spark, docs, window=16)
    assert got == ref_spans(docs, 16, 2)


def test_portable_and_fast_hash_agree(spark):
    # xxhash64 (default, 8-byte JVM-fast) and md5 (oracle-portable)
    # fingerprints must mark identical spans — 40-char windows make
    # accidental 64-bit collisions irrelevant at test scale
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    fast = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_substring_spans(df, window=20).collect()
    )
    port = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_substring_spans(
            df, window=20, portable=True
        ).collect()
    )
    assert fast == port
