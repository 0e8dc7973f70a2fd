"""Generator determinism + oracle grammar round-trip.

Mirrors the reference's operator-level unit testing style
(reference: src/test/java/nl/vu/datalayer/hbase/bulkload/StringIdAssocTest.java).
"""

import pandas as pd

from hbase_rdf_spark.functions.grammar import split_sentences
from hbase_rdf_spark.functions.oracle import emit_reference_triples
from hbase_rdf_spark.sources.synthetic import (
    build_gazetteer,
    canonical_entities,
    full_alias_map,
    transcripts_df,
    transcripts_pdf,
    variants,
)


def test_generator_deterministic():
    a = transcripts_pdf(20, seed=42)
    b = transcripts_pdf(20, seed=42)
    pd.testing.assert_frame_equal(a, b)
    c = transcripts_pdf(20, seed=43)
    assert not a["text"].equals(c["text"])


def test_unique_turn_key_and_schema():
    pdf = transcripts_pdf(30, seed=42)
    assert not pdf.duplicated(["conv_id", "turn_idx"]).any()
    assert list(pdf.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert pdf["turn_idx"].dtype == "int32"
    # turns dense from 0 per conversation
    g = pdf.groupby("conv_id")["turn_idx"]
    assert (g.min() == 0).all()
    assert (g.max() + 1 == g.count()).all()


def test_alias_universe_unambiguous():
    """No surface maps to two canonical entities (oracle soundness)."""
    seen = {}
    for eid, kind, surface in canonical_entities():
        for v, _cls in variants(surface, kind):
            if v in seen:
                assert seen[v] == eid, f"ambiguous variant {v!r}"
            seen[v] = eid


def test_sentence_split_preserves_initials():
    text = "A. Johnson works at Acme Corp. B. Smith lives in Berlin."
    sents = split_sentences(text)
    assert sents == ["A. Johnson works at Acme Corp", "B. Smith lives in Berlin"]


def test_oracle_emits_triples_with_expected_mix():
    pdf = transcripts_pdf(100, seed=42)
    tri = emit_reference_triples(pdf)
    assert len(tri) > 100
    kinds = set(tri["obj_kind"].unique())
    assert kinds == {0, 1, 2}
    preds = set(tri["pred"].unique())
    assert "rel:works_at" in preds and "rel:age" in preds
    assert tri["subj"].str.startswith("ent:").all()
    # deterministic
    tri2 = emit_reference_triples(transcripts_pdf(100, seed=42))
    pd.testing.assert_frame_equal(tri, tri2)


def test_gazetteer_excludes_typos():
    gaz_surfaces = {s for s, _, _ in build_gazetteer()}
    amap = full_alias_map()
    assert gaz_surfaces < set(amap)  # proper subset: typos & case variants absent


def test_distributed_generation_matches_driver(spark):
    sdf = transcripts_df(spark, 10, seed=42).toPandas()
    pdf = transcripts_pdf(10, seed=42)
    sdf = sdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    sdf["ts"] = pd.to_datetime(sdf["ts"], utc=True)
    pd.testing.assert_frame_equal(sdf, pdf)
