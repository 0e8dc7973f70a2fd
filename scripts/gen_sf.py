"""Deterministic scale-up of the driver's synthetic testdata.

The driver ships sf{0.001,0.01,0.1}; round-5 depth evidence (VERDICT
r4 #3) needs one order of magnitude more. This derives sfX from sf0.1
by key-shifted replication — the standard dbgen-style scale-out —
preserving schemas, distributions, and referential integrity:

- ``region``/``nation``: fixed dimensions, copied as-is (TPC-H rule);
- ``customer``/``supplier``/``part``/``orders``/``lineitem``: copy k
  shifts every primary AND foreign key by k·(max_key+1), so joins
  resolve within their copy and selectivities match sf0.1;
- ``events``: ids shift, timestamps shift by k×31 days — more history
  at the same event density (windows/sessionization stay realistic);
- ``documents``: copy 0 verbatim; copies k>0 keep (lang, source) and
  per-doc length but redraw words from the corpus vocabulary with a
  seeded RNG — duplicate/near-duplicate rates stay at sf0.1 levels
  instead of exploding 45 pairs per replicated doc;
- ``embeddings``: copy 0 verbatim; copies k>0 add seeded Gaussian
  noise (σ=0.25·scale) so ANN buckets stay populated without 10-way
  exact ties.

Usage: python scripts/gen_sf.py <out_dir> [factor=10] [src=/root/testdata/sf0.1]
Everything is seeded — two runs produce byte-identical tables.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

KEYED = {
    "customer": {"c_custkey": "self"},
    "supplier": {"s_suppkey": "self"},
    "part": {"p_partkey": "self"},
    "orders": {"o_orderkey": "self", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "self"},
}


def _read(src: str, name: str) -> pa.Table:
    return pq.read_table(f"{src}/{name}.parquet")


def _key_spans(src: str) -> dict[str, int]:
    """max(primary key)+1 per scaled table — the per-copy shift."""
    spans: dict[str, int] = {}
    for name, cols in KEYED.items():
        pk = next(c for c, ref in cols.items() if ref == "self" or name == "lineitem")
        t = _read(src, name)
        if name == "lineitem":
            continue  # lineitem has no own key; it shifts by its FKs
        spans[name] = int(pa.compute.max(t[pk]).as_py()) + 1
    return spans


def scale_keyed(t: pa.Table, name: str, spans: dict, factor: int) -> pa.Table:
    import pyarrow.compute as pc

    copies = []
    for k in range(factor):
        cols = {}
        for field in t.schema.names:
            col = t[field]
            ref = KEYED[name].get(field)
            if ref is not None:
                span = spans[name if ref == "self" else ref]
                col = pc.add(col, k * span)
            elif name == "events" and field == "ts":
                col = pc.add(col, pa.scalar(k * 31 * 86400 * 1_000_000, pa.duration("us")))
            cols[field] = col
        copies.append(pa.table(cols))
    return pa.concat_tables(copies)


def scale_documents(t: pa.Table, factor: int, seed: int = 42) -> pa.Table:
    texts = t["text"].to_pylist()
    doc_ids = t["doc_id"].to_pylist()
    langs = t["lang"].to_pylist()
    sources = t["source"].to_pylist()
    vocab = sorted({w for txt in texts for w in txt.split(" ") if w})
    varr = np.array(vocab)
    span = max(doc_ids) + 1
    out_id, out_text, out_lang, out_src, out_n = [], [], [], [], []
    rng = np.random.default_rng(seed)
    for k in range(factor):
        for i, txt in enumerate(texts):
            if k == 0:
                new = txt
            else:
                n_words = len(txt.split(" "))
                # per-(doc, copy) substream keeps the output independent
                # of iteration order and reproducible under resharding
                sub = np.random.default_rng((seed, k, doc_ids[i]))
                new = " ".join(varr[sub.integers(0, len(varr), n_words)])
            out_id.append(doc_ids[i] + k * span)
            out_text.append(new)
            out_lang.append(langs[i])
            out_src.append(sources[i])
            out_n.append(len(new))
    del rng
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "text": pa.array(out_text, pa.string()),
            "lang": pa.array(out_lang, pa.string()),
            "source": pa.array(out_src, pa.string()),
            "n_chars": pa.array(out_n, pa.int64()),
        }
    )


def scale_embeddings(t: pa.Table, factor: int, seed: int = 42) -> pa.Table:
    vec_ids = np.asarray(t["vec_id"].to_pylist())
    labels = np.asarray(t["label"].to_pylist())
    vecs = np.asarray(t["embedding"].to_pylist(), dtype=np.float32)
    span = int(vec_ids.max()) + 1
    scale = float(np.abs(vecs).mean())
    ids, labs, rows = [], [], []
    for k in range(factor):
        if k == 0:
            pert = vecs
        else:
            sub = np.random.default_rng((seed, k))
            pert = vecs + sub.normal(0.0, 0.25 * scale, vecs.shape).astype(
                np.float32
            )
        ids.append(vec_ids + k * span)
        labs.append(labels)
        rows.append(pert)
    allv = np.concatenate(rows).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids), pa.int64()),
            "embedding": pa.array(list(allv), pa.list_(pa.float32())),
            "label": pa.array(np.concatenate(labs), pa.int32()),
        }
    )


def main() -> None:
    out = sys.argv[1]
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    spans = _key_spans(src)
    for name in ("region", "nation"):
        pq.write_table(_read(src, name), f"{out}/{name}.parquet")
    for name in KEYED:
        pq.write_table(
            scale_keyed(_read(src, name), name, spans, factor),
            f"{out}/{name}.parquet",
        )
    pq.write_table(
        scale_documents(_read(src, "documents"), factor),
        f"{out}/documents.parquet",
    )
    pq.write_table(
        scale_embeddings(_read(src, "embeddings"), factor),
        f"{out}/embeddings.parquet",
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        n = pq.read_metadata(f"{out}/{name}.parquet").num_rows
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
