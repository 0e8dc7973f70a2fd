"""W3C N-Triples conformance sweep (VERDICT r4 #4).

Shapes mirror the public W3C rdf-tests N-Triples suite
(nt-syntax-* / nt-syntax-bad-*): positive cases must parse with the
right term decomposition; negative cases must be flagged ``_corrupt``
and counted — never raise — matching the reference's Sesame-backed
skip-and-count contract (bulkload/QuadBreakDown.java:103-109).
String unescaping follows NTriplesUtil.unescapeString (ECHAR + UCHAR);
IRIs keep UCHAR escapes lexically (IRIs are compared as opaque strings
engine-wide — a documented boundary vs Sesame's IRI normalization).
"""

import pytest

from hbase_rdf_spark.sources.ntriples import (
    corrupt_count,
    parse_lines,
    quads,
    read_ntriples,
)

# (line, expected) — expected None means corrupt; otherwise a dict of
# parsed-column assertions
POSITIVE = [
    # nt-syntax-file-01..03: empty / comment / blank lines
    ("", "skip"),
    ("# comment", "skip"),
    ("   \t ", "skip"),
    # nt-syntax-uri-01: simple triple
    ("<http://ex/s> <http://ex/p> <http://ex/o> .",
     {"s": "http://ex/s", "o_lex": "http://ex/o", "o_kind": 0}),
    # nt-syntax-uri-02/03: UCHAR in IRIs (kept lexically)
    ("<http://ex/\\u0053> <http://ex/p> <http://ex/o> .",
     {"s": "http://ex/\\u0053"}),
    ("<http://ex/s> <http://ex/p> <http://ex/\\U0000006F> .",
     {"o_lex": "http://ex/\\U0000006F"}),
    # whitespace variants: tabs, no space before dot, trailing blanks
    ("\t<http://ex/s>\t<http://ex/p>\t<http://ex/o>\t.  ",
     {"s": "http://ex/s"}),
    ("<http://ex/s> <http://ex/p> <http://ex/o>.", {"s": "http://ex/s"}),
    # nt-syntax-string-01..03: plain, lang-tagged, subtagged
    ('<http://ex/s> <http://ex/p> "chat" .',
     {"o_lex": "chat", "o_kind": 1, "o_lang": None}),
    ('<http://ex/s> <http://ex/p> "chat"@en .', {"o_lang": "en"}),
    ('<http://ex/s> <http://ex/p> "chat"@en-US .', {"o_lang": "en-US"}),
    ('<http://ex/s> <http://ex/p> "chat"@es-419 .', {"o_lang": "es-419"}),
    # nt-syntax-str-esc-01..03: ECHAR and UCHAR unescaping
    ('<http://ex/s> <http://ex/p> "a\\n" .', {"o_lex": "a\n"}),
    ('<http://ex/s> <http://ex/p> "a\\u0020b" .', {"o_lex": "a b"}),
    ('<http://ex/s> <http://ex/p> "a\\U00000020b" .', {"o_lex": "a b"}),
    ('<http://ex/s> <http://ex/p> "a\\t\\r\\f\\b." .',
     {"o_lex": "a\t\r\f\b."}),
    ('<http://ex/s> <http://ex/p> "q\\"q\\\\q" .', {"o_lex": 'q"q\\q'}),
    ('<http://ex/s> <http://ex/p> "\\U0001F600" .', {"o_lex": "\U0001F600"}),
    # nt-syntax-datatypes-01/02
    ('<http://ex/s> <http://ex/p> "12"^^<http://www.w3.org/2001/XMLSchema#integer> .',
     {"o_kind": 2, "o_num": 12.0}),
    ('<http://ex/s> <http://ex/p> "abc"^^<http://ex/dt> .',
     {"o_kind": 1, "o_datatype": "http://ex/dt"}),
    # empty literal; literal_all_punctuation edge
    ('<http://ex/s> <http://ex/p> "" .', {"o_lex": "", "o_kind": 1}),
    ('<http://ex/s> <http://ex/p> " !#$%&():;<=>?@[]^_`{|}~" .',
     {"o_lex": " !#$%&():;<=>?@[]^_`{|}~"}),
    # nt-syntax-bnode-01..03: labels incl. leading digit/underscore,
    # inner dots (NT 1.1 BLANK_NODE_LABEL)
    ("_:a <http://ex/p> <http://ex/o> .", {"s": "_:a", "s_kind": "bnode"}),
    ("_:1b <http://ex/p> _:b2 .", {"s": "_:1b", "o_lex": "_:b2"}),
    ("_:a.b.c <http://ex/p> <http://ex/o> .", {"s": "_:a.b.c"}),
    ("_:_x- <http://ex/p> <http://ex/o> .", {"s": "_:_x-"}),
    # N-Quads context positions (IRI and bnode graph labels)
    ("<http://ex/s> <http://ex/p> <http://ex/o> <http://ex/g> .",
     {"c": "http://ex/g"}),
    ("<http://ex/s> <http://ex/p> <http://ex/o> _:g .", {"c": "_:g"}),
]

NEGATIVE = [
    # nt-syntax-bad-uri-*: space / bad chars / relative-with-space
    "<http://ex/ s> <http://ex/p> <http://ex/o> .",
    "<http://ex/s> <http://ex/p> <http://ex/{o}> .",
    '<http://ex/s> <http://ex/p> <http://ex/"o"> .',
    # nt-syntax-bad-prefix/base-01: Turtle directives
    "@prefix ex: <http://ex/> .",
    "@base <http://ex/> .",
    # nt-syntax-bad-struct-*: object list / predicate-object list
    "<http://ex/s> <http://ex/p> <http://ex/o>, <http://ex/o2> .",
    "<http://ex/s> <http://ex/p> <http://ex/o>; <http://ex/p2> <http://ex/o2> .",
    # nt-syntax-bad-num-*: bare numerics / booleans (Turtle-only)
    "<http://ex/s> <http://ex/p> 1 .",
    "<http://ex/s> <http://ex/p> 1.0e0 .",
    "<http://ex/s> <http://ex/p> true .",
    # nt-syntax-bad-lang-01: bad language tag
    '<http://ex/s> <http://ex/p> "x"@1 .',
    '<http://ex/s> <http://ex/p> "x"@en-  .',
    # lang AND datatype on one literal (grammar allows exactly one)
    '<http://ex/s> <http://ex/p> "x"@en^^<http://ex/dt> .',
    # nt-syntax-bad-esc-01..03: invalid escape sequences
    '<http://ex/s> <http://ex/p> "a\\zb" .',
    '<http://ex/s> <http://ex/p> "a\\uWXYZ" .',
    '<http://ex/s> <http://ex/p> "a\\U0000WXYZ" .',
    # nt-syntax-bad-string-*: mismatched / single / long quotes
    '<http://ex/s> <http://ex/p> "abc .',
    "<http://ex/s> <http://ex/p> 'abc' .",
    '<http://ex/s> <http://ex/p> """abc""" .',
    '<http://ex/s> <http://ex/p> "abc .\n',
    # literal in subject / predicate position, bnode predicate
    '"abc" <http://ex/p> <http://ex/o> .',
    "<http://ex/s> _:p <http://ex/o> .",
    '<http://ex/s> "p" <http://ex/o> .',
    # missing dot / missing terms / too many terms
    "<http://ex/s> <http://ex/p> <http://ex/o>",
    "<http://ex/s> <http://ex/p> .",
    "<http://ex/s> <http://ex/p> <http://ex/o> <http://ex/g> <http://ex/x> .",
    # bad bnode labels: trailing dot, empty, bad first char
    "_:a. <http://ex/p> <http://ex/o> .",
    "_: <http://ex/p> <http://ex/o> .",
    "_:-a <http://ex/p> <http://ex/o> .",
]


@pytest.fixture(scope="module")
def parsed(spark):
    lines = [l for l, _ in POSITIVE] + NEGATIVE
    df = parse_lines(
        spark.createDataFrame([(l,) for l in lines], "value string")
    ).cache()
    yield df
    df.unpersist()


def _row_for(spark, line):
    df = parse_lines(spark.createDataFrame([(line,)], "value string"))
    return df.collect()[0]


@pytest.mark.parametrize(
    "line,expect", POSITIVE, ids=[repr(l)[:40] for l, _ in POSITIVE]
)
def test_positive_shapes(spark, line, expect):
    r = _row_for(spark, line)
    if expect == "skip":
        assert r._skip and not r._corrupt
        return
    assert not r._corrupt, f"wrongly flagged corrupt: {line!r}"
    for col, want in expect.items():
        assert getattr(r, col) == want, (
            f"{col}: got {getattr(r, col)!r}, want {want!r} for {line!r}"
        )


@pytest.mark.parametrize(
    "line", NEGATIVE, ids=[repr(l)[:40] for l in NEGATIVE]
)
def test_negative_shapes_flagged_not_raised(spark, line):
    r = _row_for(spark, line)
    assert r._corrupt, f"malformed line accepted: {line!r}"


def test_corrupt_count_parity(spark, parsed):
    # the reference's Hadoop error counter: every negative line counts
    # once, no positive line does (QuadBreakDown.java:103-109)
    assert corrupt_count(parsed) == len(NEGATIVE)
    n_pos = len([1 for _, e in POSITIVE if e != "skip"])
    assert quads(parsed).count() == n_pos


def test_bare_cr_line_endings(spark, tmp_path):
    # Hadoop's LineReader splits on LF, CRLF, and bare CR alike; a
    # CR-separated file must parse line-per-record, not as one blob
    p = tmp_path / "cr.nt"
    p.write_bytes(
        b"<http://ex/a> <http://ex/p> <http://ex/o> .\r"
        b"<http://ex/b> <http://ex/p> <http://ex/o> .\r\n"
        b"<http://ex/c> <http://ex/p> bad .\r"
        b"<http://ex/d> <http://ex/p> <http://ex/o> ."
    )
    df = parse_lines(spark.read.text(str(p)))
    assert quads(df).count() == 3
    assert corrupt_count(df) == 1


def test_directory_batch_load_with_corrupt_files(spark, tmp_path):
    (tmp_path / "good.nt").write_text(
        "<http://ex/a> <http://ex/p> <http://ex/o> .\n# comment\n"
    )
    (tmp_path / "mixed.nt").write_text(
        '<http://ex/b> <http://ex/p> "ok" .\njunk line\n@prefix x: <y> .\n'
    )
    df = read_ntriples(spark, str(tmp_path))
    assert quads(df).count() == 2
    assert corrupt_count(df) == 2
