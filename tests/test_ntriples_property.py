"""Fuzzing the N-Triples parser: never crashes, classifies correctly.

Round-trip property: any well-formed triple built from generated terms
parses back to its components; arbitrary junk lines either parse or are
flagged `_corrupt` — never an exception, mirroring the reference's
count-and-skip contract (bulkload/QuadBreakDown.java:103-109).
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from hbase_rdf_spark.sources.ntriples import parse_lines

IRI_CHARS = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="/._-~:#"
    ),
    min_size=1,
    max_size=24,
)
LIT_CHARS = st.text(
    alphabet=st.characters(
        blacklist_characters='"\\', blacklist_categories=("Cs", "Cc")
    ),
    max_size=24,
)


@st.composite
def wellformed(draw):
    s = draw(IRI_CHARS)
    p = draw(IRI_CHARS)
    okind = draw(st.integers(0, 2))
    if okind == 0:
        o = f"<http://x/{draw(IRI_CHARS)}>"
        o_lex = o[1:-1]
    elif okind == 1:
        lex = draw(LIT_CHARS)
        o = f'"{lex}"'
        o_lex = lex
    else:
        v = draw(st.integers(-10**6, 10**6))
        o = f'"{v}"^^<http://www.w3.org/2001/XMLSchema#integer>'
        o_lex = str(v)
    line = f"<http://x/{s}> <http://x/{p}> {o} ."
    return line, f"http://x/{s}", f"http://x/{p}", o_lex, okind


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=wellformed())
def test_wellformed_roundtrip(spark, case):
    line, s, p, o_lex, okind = case
    row = parse_lines(
        spark.createDataFrame([(line,)], "value string")
    ).collect()[0]
    assert not row["_corrupt"], line
    assert row["s"] == s and row["p"] == p
    assert row["o_lex"] == o_lex
    if okind == 2:
        assert row["o_kind"] == 2 and row["o_num"] == float(o_lex)
    else:
        assert row["o_kind"] == okind


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(junk=st.text(max_size=60))
def test_junk_never_crashes(spark, junk):
    rows = parse_lines(
        spark.createDataFrame([(junk,)], "value string")
    ).collect()
    assert len(rows) == 1  # flagged corrupt/skip or parsed — never thrown
