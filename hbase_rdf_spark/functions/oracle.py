"""Pure-Python reference triple emitter — the P/R oracle.

Plays the role the reference's NQuadsParser-based extraction plays for
hbase-rdf (reference: bulkload/QuadBreakDown.java:137-149): the
ground-truth producer of (subj, pred, obj) triples the Spark pipeline
must match at P/R >= 0.95 (BASELINE.json metric).

It resolves every mention via the COMPLETE deterministic alias universe
(:func:`hbase_rdf_spark.sources.synthetic.full_alias_map`) — including
the typo variants the pipeline can only recover through LSH linking.
No Spark: plain pandas, driver-side, small scales only.
"""

from __future__ import annotations

import pandas as pd

from hbase_rdf_spark.functions.grammar import (
    COMPILED,
    OBJ_ENTITY,
    PRED_IRI,
    split_sentences,
)
from hbase_rdf_spark.sources.synthetic import full_alias_map

ORACLE_COLUMNS = ["conv_id", "turn_idx", "subj", "pred", "obj", "obj_kind"]


def emit_reference_triples(transcripts: pd.DataFrame) -> pd.DataFrame:
    """transcripts (conv_id, turn_idx, role, text, ...) → oracle triples."""
    amap = full_alias_map()
    rows: list[tuple] = []
    for conv_id, turn_idx, role, text in zip(
        transcripts["conv_id"], transcripts["turn_idx"],
        transcripts["role"], transcripts["text"],
    ):
        if role == "tool":
            continue
        for sent in split_sentences(text):
            for pred, rx, kind in COMPILED:
                m = rx.match(sent)
                if not m:
                    continue
                s_surface, o_surface = m.group(1), m.group(2)
                subj = amap.get(s_surface)
                if subj is None:
                    continue  # not a seeded mention (filler noise)
                if kind == OBJ_ENTITY:
                    obj = amap.get(o_surface)
                    if obj is None:
                        continue
                else:
                    obj = o_surface  # literal lexical form
                rows.append(
                    (conv_id, int(turn_idx), subj, PRED_IRI[pred], obj, kind)
                )
                break  # patterns are mutually exclusive; first match wins
    pdf = pd.DataFrame(rows, columns=ORACLE_COLUMNS)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["obj_kind"] = pdf["obj_kind"].astype("int8")
    return pdf


def precision_recall(
    predicted: pd.DataFrame, reference: pd.DataFrame
) -> tuple[float, float]:
    """Set-level P/R on distinct (subj, pred, obj) per BASELINE.json."""
    key = ["subj", "pred", "obj"]
    pset = set(map(tuple, predicted[key].drop_duplicates().itertuples(index=False)))
    rset = set(map(tuple, reference[key].drop_duplicates().itertuples(index=False)))
    if not pset or not rset:
        return (0.0, 0.0)
    inter = len(pset & rset)
    return (inter / len(pset), inter / len(rset))
