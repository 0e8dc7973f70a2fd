"""Shared closed-vocabulary extraction grammar.

Both the pure-Python reference emitter (the P/R oracle) and the Spark
extraction operator derive their parsing rules from this module — the
"closed seeded vocabulary" of relation phrases (FIXTURES.md §2). This is
the analog of the reference's fixed N-Triples line grammar parsed by
Sesame's NQuadsParser (reference: bulkload/QuadBreakDown.java:137-149).

Object kinds mirror the reference's TypedId string/numeric split
(reference: id/TypedId.java:21-46):
    0 = entity (URI-like), 1 = string literal, 2 = numeric literal.
"""

from __future__ import annotations

import re

# Sentence boundary: ". " NOT preceded by a single capital initial
# ("A. Johnson" must stay one sentence). Both lookbehinds are fixed-width,
# so the same pattern runs under Python `re`, pandas `.str.split`, and
# Java/Spark regex engines identically.
SENTENCE_SPLIT = r"(?<!^[A-Z])(?<!\s[A-Z])\. "

# Per-relation sentence patterns. Order matters only for documentation;
# the patterns are mutually exclusive on the generated corpus.
# kind: object kind emitted for a match.
PATTERNS: list[tuple[str, str, int]] = [
    ("works_at", r"^(.+?) works at (.+)$", 0),
    ("lives_in", r"^(.+?) lives in (.+)$", 0),
    ("knows", r"^(.+?) knows (.+)$", 0),
    ("uses", r"^(.+?) uses (.+)$", 0),
    ("ceo_of", r"^(.+?) is the CEO of (.+)$", 0),
    ("located_in", r"^(.+?) is located in (.+)$", 0),
    ("founded_in", r"^(.+?) was founded in ([0-9]+)$", 2),
    ("age", r"^(.+?) is ([0-9]+) years old$", 2),
    ("nickname", r"^(.+?) has the nickname \"(.+)\"$", 1),
]

COMPILED = [(pred, re.compile(rx), kind) for pred, rx, kind in PATTERNS]

#: one-pass candidate prefilter: every PATTERNS regex requires one of
#: these literal phrases, so a sentence containing none can match no
#: pattern — a strict SUPERSET filter (never drops a true match) that
#: lets the extractor skip the 9 anchored extracts on non-relation
#: sentences. Keep in sync with PATTERNS.
KEYWORD_RX = (
    "works at|lives in|knows|uses|is the CEO of|is located in"
    "|was founded in|years old|has the nickname"
)

PRED_IRI = {pred: f"rel:{pred}" for pred, _, _ in PATTERNS}

OBJ_ENTITY, OBJ_STRING, OBJ_NUMERIC = 0, 1, 2


def split_sentences(text: str) -> list[str]:
    """Split a turn's text into candidate relation sentences."""
    parts = re.split(SENTENCE_SPLIT, text)
    out = []
    for p in parts:
        p = p.strip()
        if p.endswith("."):
            p = p[:-1]
        if p:
            out.append(p)
    return out
