"""Deterministic synthetic multi-turn transcript corpus.

Input-shape contract (BASELINE.json input_hint): an Iceberg/parquet table
``(conv_id: string, turn_idx: int32, role: string, text: string,
tool: string, ts: timestamp)``. This module synthesizes that table at any
scale, seed-deterministically, with seeded entity mentions and relation
phrases from a closed vocabulary — playing the role the N-Triples input
files play for the reference bulk loader
(reference: src/main/java/nl/vu/datalayer/hbase/bulkload/NTripleParser.java:22-70).

Design for oracle parity
------------------------
Every canonical entity has a FIXED finite set of surface variants
(canonical / lowercase / UPPERCASE / initials / one deterministic typo).
Generation samples from that fixed set, so the complete alias universe is
a pure function of the vocabulary — the reference emitter
(:mod:`hbase_rdf_spark.functions.oracle`) can resolve every mention
without seeing generator state. The gazetteer handed to the *pipeline*
(:func:`build_gazetteer`) deliberately EXCLUDES the typo variants: those
must be recovered by minhash-LSH linking, which is what makes the
P/R >= 0.95 gate meaningful.

Generation is distributed (``spark.range`` over conversations →
``mapInPandas``) so bench-scale corpora are produced in parallel with no
driver-side loop.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone
from typing import Iterator

import pandas as pd

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

# ---------------------------------------------------------------------------
# Closed seeded vocabulary
# ---------------------------------------------------------------------------

_FIRST = [
    "Alice", "Bob", "Carol", "David", "Erin", "Frank", "Grace", "Henry",
    "Irene", "Jack", "Karen", "Liam", "Mona", "Nate", "Olga", "Peter",
    "Quinn", "Rosa", "Sam", "Tina",
]
_LAST = [
    "Johnson", "Smith", "Nguyen", "Garcia", "Mueller", "Tanaka", "Okafor",
    "Silva", "Kowalski", "Haddad",
]
_ORGS = [
    "Acme Corp", "Globex Inc", "Initech Ltd", "Umbrella Systems",
    "Stark Industries", "Wayne Enterprises", "Hooli Labs", "Vandelay Imports",
    "Cyberdyne Analytics", "Tyrell Data", "Wonka Foods", "Gringotts Bank",
]
_CITIES = [
    "Amsterdam", "Berlin", "Copenhagen", "Dublin", "Edinburgh", "Florence",
    "Geneva", "Helsinki", "Istanbul", "Jakarta", "Kyoto", "Lisbon",
]
_TOOLS = [
    "Spark", "Postgres", "Kafka", "Redis", "Airflow", "Terraform",
    "Kubernetes", "Grafana", "Snowflake", "DuckDB",
]

# (predicate, subject_pool, object_pool_or_kind, phrase_template)
# Object kinds: 0 = entity, 1 = string literal, 2 = numeric literal
# (mirrors the reference's string/numeric TypedId split,
#  reference: src/main/java/nl/vu/datalayer/hbase/id/TypedId.java:21-46).
RELATIONS = [
    ("works_at", "person", "org", "{s} works at {o}"),
    ("lives_in", "person", "city", "{s} lives in {o}"),
    ("knows", "person", "person", "{s} knows {o}"),
    ("uses", "person", "tool", "{s} uses {o}"),
    ("ceo_of", "person", "org", "{s} is the CEO of {o}"),
    ("located_in", "org", "city", "{s} is located in {o}"),
    ("founded_in", "org", "num", "{s} was founded in {o}"),
    ("age", "person", "num", "{s} is {o} years old"),
    ("nickname", "person", "str", '{s} has the nickname "{o}"'),
]

_FILLER = [
    "thanks, that helps",
    "let me check the logs",
    "can you summarize the last run",
    "sounds good to me",
    "please rerun the job with more memory",
    "the dashboard looks fine now",
]

_NICKNAMES = ["Ace", "Buzz", "Chip", "Dash", "Echo", "Flint", "Gizmo", "Hawk"]


def _slug(name: str) -> str:
    return name.lower().replace(" ", "_").replace(",", "").replace(".", "")


def _person_names() -> list[str]:
    # 20 x 10 = 200 canonical people, deterministic order.
    return [f"{f} {l}" for f in _FIRST for l in _LAST]


def canonical_entities() -> list[tuple[str, str, str]]:
    """All canonical entities as (entity_id, kind, canonical_surface)."""
    out = []
    for n in _person_names():
        out.append((f"ent:person/{_slug(n)}", "person", n))
    for n in _ORGS:
        out.append((f"ent:org/{_slug(n)}", "org", n))
    for n in _CITIES:
        out.append((f"ent:city/{_slug(n)}", "city", n))
    for n in _TOOLS:
        out.append((f"ent:tool/{_slug(n)}", "tool", n))
    return out


def _typo(surface: str) -> str:
    """One deterministic typo: drop the 3rd char of the last token."""
    toks = surface.split(" ")
    last = toks[-1]
    if len(last) > 4:
        toks[-1] = last[:2] + last[3:]
    else:
        toks[-1] = last + last[-1]  # double final char for short tokens
    return " ".join(toks)


def variants(surface: str, kind: str) -> list[tuple[str, str]]:
    """Fixed variant set for a canonical surface: (variant_text, variant_class).

    Classes: canon | lower | upper | initials | typo. The generator samples
    only from this list, so the alias universe is closed and seed-free.
    """
    out = [(surface, "canon"), (surface.lower(), "lower"), (surface.upper(), "upper")]
    if kind == "person":
        first, last = surface.split(" ", 1)
        out.append((f"{first[0]}. {last}", "initials"))
    out.append((_typo(surface), "typo"))
    return out


# Sampling weights over variant classes (typo ~8% of mentions).
_VARIANT_CLASSES = ["canon", "canon", "canon", "canon", "canon", "canon",
                    "lower", "lower", "initials", "initials", "upper", "typo"]


def full_alias_map() -> dict[str, str]:
    """surface → canonical entity_id, over the COMPLETE variant universe.

    This is the oracle's resolver (plays the ground-truth role of the
    reference dictionary, reference: bulkload/StringIdAssoc.java:50-87).
    Collisions (two canonicals sharing a variant) resolve to the first in
    canonical order — deterministic; generator avoids emitting ambiguous
    variants by construction (checked in tests).
    """
    amap: dict[str, str] = {}
    for eid, kind, surface in canonical_entities():
        for v, _cls in variants(surface, kind):
            amap.setdefault(v, eid)
    return amap


def build_gazetteer() -> list[tuple[str, str, str]]:
    """The pipeline-visible dictionary: (alias_surface, entity_id, kind).

    Excludes 'typo' variants — those are only reachable via LSH linking.
    Also excludes trivially-normalizable case variants (the pipeline
    normalizes case itself), keeping the gazetteer small → broadcastable.
    """
    rows = []
    for eid, kind, surface in canonical_entities():
        rows.append((surface, eid, kind))
        if kind == "person":
            first, last = surface.split(" ", 1)
            rows.append((f"{first[0]}. {last}", eid, kind))
    return rows


# ---------------------------------------------------------------------------
# Conversation generation
# ---------------------------------------------------------------------------

_EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)


def _pick_variant(rng: random.Random, surface: str, kind: str) -> str:
    vs = dict((cls, v) for v, cls in variants(surface, kind))
    cls = rng.choice(_VARIANT_CLASSES)
    return vs.get(cls, surface)


def _gen_conversation(conv_i: int, seed: int) -> list[dict]:
    """Generate one conversation; pure function of (conv_i, seed)."""
    rng = random.Random(seed * 1_000_003 + conv_i)
    conv_id = f"conv-{seed}-{conv_i:08d}"
    n_turns = rng.randint(8, 14)
    people = _person_names()
    rows = []
    t0 = _EPOCH + timedelta(seconds=conv_i % 100_000)
    for turn_idx in range(n_turns):
        r = rng.random()
        if r < 0.12:
            role, tool = "tool", rng.choice(["search", "sql", "browser"])
            text = f'{{"tool": "{tool}", "status": "ok", "rows": {rng.randint(0, 500)}}}'
        else:
            role = "user" if turn_idx % 2 == 0 else "assistant"
            tool = ""
            sents = []
            for _ in range(rng.randint(1, 3)):
                if rng.random() < 0.30:
                    sents.append(rng.choice(_FILLER))
                    continue
                pred, skind, okind, tmpl = RELATIONS[rng.randrange(len(RELATIONS))]
                spool = people if skind == "person" else _ORGS
                s_surface = rng.choice(spool)
                s_text = _pick_variant(rng, s_surface, skind)
                if okind == "num":
                    o_text = str(rng.randint(1980, 2024) if pred == "founded_in"
                                 else rng.randint(18, 80))
                elif okind == "str":
                    o_text = rng.choice(_NICKNAMES)
                else:
                    opool = {"org": _ORGS, "city": _CITIES, "tool": _TOOLS,
                             "person": people}[okind]
                    o_surface = rng.choice(opool)
                    if pred == "knows" and o_surface == s_surface:
                        o_surface = opool[(opool.index(o_surface) + 1) % len(opool)]
                    o_text = _pick_variant(rng, o_surface, okind)
                sents.append(tmpl.format(s=s_text, o=o_text))
            text = ". ".join(sents) + "."
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": turn_idx,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": t0 + timedelta(seconds=37 * turn_idx),
            }
        )
    return rows


def transcripts_pdf(n_convs: int, seed: int = 42, conv_offset: int = 0) -> pd.DataFrame:
    """Driver-side (pandas) generation — tests and the oracle path."""
    rows: list[dict] = []
    for i in range(conv_offset, conv_offset + n_convs):
        rows.extend(_gen_conversation(i, seed))
    pdf = pd.DataFrame(rows)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


def transcripts_df(
    spark, n_convs: int, seed: int = 42, partitions: int | None = None,
    conv_offset: int = 0,
):
    """Distributed generation: one task per conversation range.

    Scales linearly with cores — at 10^12-turn scale the same pattern
    generates (or in production, *reads*) partition-parallel with no
    driver materialization.
    """
    if partitions is None:
        partitions = max(1, min(256, n_convs // 64 or 1))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for conv_i in b["id"]:
                rows = _gen_conversation(int(conv_i), seed)
                pdf = pd.DataFrame(rows)
                pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
                yield pdf

    base = spark.range(conv_offset, conv_offset + n_convs, numPartitions=partitions)
    return base.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
