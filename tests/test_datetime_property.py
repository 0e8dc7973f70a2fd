"""Property tests for the ISO-8601 component regexes behind the SPARQL
datetime accessors (plans/filters.py DT_PART_RX) — pure Python `re`
over the same pattern strings the JVM evaluates, so they run without a
SparkSession. Spark's regexp_extract and Python's re share the
relevant syntax subset (anchors, classes, groups).

Reference inherits these accessors from ARQ XSDFuncOp (SURVEY J12);
our contract: for any well-formed xsd:dateTime lexical the component
regex extracts exactly the formatted field, and for non-dateTime
strings every regex extracts nothing (type error → NULL → unbound).
"""

import re

from hypothesis import given, strategies as st

from hbase_rdf_spark.plans.filters import DT_PART_RX

_TZ = st.sampled_from(["", "Z", "+05:30", "-08:00", "+00:00", "-11:45"])


@st.composite
def _dt(draw):
    y = draw(st.integers(min_value=0, max_value=9999))
    mo = draw(st.integers(min_value=1, max_value=12))
    d = draw(st.integers(min_value=1, max_value=28))
    h = draw(st.integers(min_value=0, max_value=23))
    mi = draw(st.integers(min_value=0, max_value=59))
    s = draw(st.integers(min_value=0, max_value=59))
    frac = draw(st.sampled_from(["", ".5", ".25", ".123456"]))
    neg = draw(st.booleans())
    lex = (
        f"{'-' if neg else ''}{y:04d}-{mo:02d}-{d:02d}"
        f"T{h:02d}:{mi:02d}:{s:02d}{frac}{draw(_TZ)}"
    )
    return lex, {
        "year": float(-y if neg else y),
        "month": float(mo),
        "day": float(d),
        "hours": float(h),
        "minutes": float(mi),
        "seconds": float(f"{s}{frac}"),
    }


@given(_dt())
def test_components_roundtrip_formatted_datetime(case):
    lex, want = case
    for part, expect in want.items():
        m = re.search(DT_PART_RX[part], lex)
        assert m, (part, lex)
        assert float(m.group(1)) == expect, (part, lex)


@given(st.text(max_size=40).filter(lambda s: not re.match(r"^-?\d{4}-", s)))
def test_non_datetime_extracts_nothing(s):
    # anything not starting with a [-]YYYY- date prefix is a type error
    # for every component accessor
    for part, rx in DT_PART_RX.items():
        assert re.search(rx, s) is None, (part, s)


@given(_dt())
def test_date_only_lexical_has_no_time_parts(case):
    lex, want = case
    date_only = lex.split("T")[0]
    for part in ("hours", "minutes", "seconds"):
        assert re.search(DT_PART_RX[part], date_only) is None
    for part in ("year", "month", "day"):
        m = re.search(DT_PART_RX[part], date_only)
        assert m and float(m.group(1)) == want[part]
