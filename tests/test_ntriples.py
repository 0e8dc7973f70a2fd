"""N-Triples/N-Quads parser: term kinds, default context, numeric
inlining, corrupt-line counting (reference S1 contract)."""

import pytest
from pyspark.sql import functions as F

from hbase_rdf_spark.sources.ntriples import (
    DEFAULT_CONTEXT,
    corrupt_count,
    parse_lines,
    quads,
)

LINES = [
    '<http://ex/s1> <http://ex/p> <http://ex/o1> .',
    '<http://ex/s1> <http://ex/p> "plain literal" .',
    '<http://ex/s2> <http://ex/name> "Alice"@en .',
    '<http://ex/s2> <http://ex/age> "41"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    '<http://ex/s2> <http://ex/area> "135765.0"^^<http://www.w3.org/2001/XMLSchema#double> <http://ex/graph1> .',
    '_:b1 <http://ex/p> _:b2 .',
    '<http://ex/s3> <http://ex/flag> "true"^^<http://www.w3.org/2001/XMLSchema#boolean> .',
    '<http://ex/s3> <http://ex/says> "esc \\"q\\" done" .',
    '',
    '# comment line',
    'this is garbage',
    '<http://ex/missing-object> <http://ex/p> .',
]


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame([(l,) for l in LINES], "value string")
    return parse_lines(df).persist()


def test_corrupt_counter(parsed):
    assert corrupt_count(parsed) == 2  # garbage + missing-object


def test_kinds_and_values(parsed):
    rows = {
        (r["s"], r["p"]): r
        for r in parsed.filter(~F.col("_corrupt") & ~F.col("_skip")).collect()
    }
    r = rows[("http://ex/s1", "http://ex/p")]
    # two rows share (s1, p): IRI object row and literal row — re-key
    by_obj = {
        (r["s"], r["o_lex"]): r
        for r in parsed.filter(~F.col("_corrupt") & ~F.col("_skip")).collect()
    }
    assert by_obj[("http://ex/s1", "http://ex/o1")]["o_kind"] == 0
    assert by_obj[("http://ex/s1", "plain literal")]["o_kind"] == 1

    lang = by_obj[("http://ex/s2", "Alice")]
    assert lang["o_lang"] == "en" and lang["o_kind"] == 1

    age = by_obj[("http://ex/s2", "41")]
    assert age["o_kind"] == 2 and age["o_num"] == 41.0

    area = by_obj[("http://ex/s2", "135765.0")]
    assert area["o_num"] == 135765.0 and area["c"] == "http://ex/graph1"

    bnode = by_obj[("_:b1", "_:b2")]
    assert bnode["s_kind"] == "bnode" and bnode["o_kind"] == 0

    flag = by_obj[("http://ex/s3", "true")]
    assert flag["o_kind"] == 2 and flag["o_num"] == 1.0

    esc = by_obj[("http://ex/s3", 'esc "q" done')]
    assert esc["o_kind"] == 1


def test_default_context(parsed):
    no_ctx = parsed.filter(
        (F.col("s") == "http://ex/s1") & (F.col("o_kind") == 0)
    ).collect()[0]
    assert no_ctx["c"] == DEFAULT_CONTEXT


def test_quads_feed_pipeline_shape(parsed):
    q = quads(parsed)
    assert set(q.columns) == {"conv_id", "turn_idx", "subj", "pred", "obj", "obj_kind"}
    assert q.count() == 8
