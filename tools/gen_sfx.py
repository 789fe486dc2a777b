#!/usr/bin/env python3
"""Generate an sf1-EQUIVALENT extension-table directory (documents /
embeddings / events at 10x sf0.1) for the scaling-curve measurement
(VERDICT r9 #6).

The driver's testdata stops at sf0.1 and is read-only; this mirrors its
observed generator shape one decade up, with the same statistical
character so the d*/n*/e* bench entries measure scaling, not a
distribution change:

- documents: uniform random words from the SAME 31-word vocabulary read
  out of the source sf dir, 10-100 words/doc, ~0.16% exact-duplicate
  rate, 20 sources, 5 langs with the observed ~2x 'en' weight (the lang
  label is independent of the text in the driver data too);
- embeddings: 10 clusters, dim 64, centers ~ N(0, 0.015) per coord,
  within-cluster noise N(0, 0.12) — matching the observed per-label
  moment profile; float32 lists;
- events: uniform event times over the same one-month horizon, 10x the
  users, uniform 5 event types, value ~ U(0,100), '{"k": n}' props —
  written as physical TIMESTAMP(NANOS) like the driver files.

Deterministic (seed 42). Usage:
  python3 tools/gen_sfx.py /root/testdata/sf0.1 /tmp/sfx1 10
where the last arg is the scale multiplier vs the SOURCE dir.
"""
import json
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main(src: str, out: str, mult: int) -> None:
    rng = np.random.default_rng(42)
    con = duckdb.connect()
    import os
    os.makedirs(out, exist_ok=True)

    # ---- documents ------------------------------------------------------
    vocab = [r[0] for r in con.execute(
        f"SELECT DISTINCT unnest(string_split(text, ' ')) w "
        f"FROM '{src}/documents.parquet' ORDER BY w").fetchall()]
    n_docs = mult * con.execute(
        f"SELECT count(*) FROM '{src}/documents.parquet'").fetchone()[0]
    lens = rng.integers(10, 101, size=n_docs)
    words = np.array(vocab, dtype=object)
    texts = [" ".join(words[rng.integers(0, len(words), size=n)])
             for n in lens]
    # exact duplicates at the observed ~0.16% rate
    for i in rng.integers(1, n_docs, size=max(1, n_docs * 16 // 10000)):
        texts[i] = texts[int(i) // 2]
    langs = rng.choice(np.array(["en", "zh", "es", "fr", "de"], dtype=object),
                       size=n_docs, p=[0.41, 0.15, 0.15, 0.15, 0.14])
    sources = np.array([f"src{i}" for i in rng.integers(0, 20, size=n_docs)],
                       dtype=object)
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }), f"{out}/documents.parquet")

    # ---- embeddings -----------------------------------------------------
    dim, n_clusters = 64, 10
    n_vecs = mult * con.execute(
        f"SELECT count(*) FROM '{src}/embeddings.parquet'").fetchone()[0]
    centers = rng.normal(0.0, 0.015, size=(n_clusters, dim))
    labels = rng.integers(0, n_clusters, size=n_vecs)
    vecs = (centers[labels] +
            rng.normal(0.0, 0.12, size=(n_vecs, dim))).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), pa.float32()), dim).cast(
            pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    }), f"{out}/embeddings.parquet")

    # ---- events ---------------------------------------------------------
    n_events = mult * con.execute(
        f"SELECT count(*) FROM '{src}/events.parquet'").fetchone()[0]
    n_users = mult * con.execute(
        f"SELECT count(DISTINCT user_id) FROM '{src}/events.parquet'"
    ).fetchone()[0]
    t0 = np.datetime64("2024-01-01T00:00:00", "ns").astype(np.int64)
    t1 = np.datetime64("2024-01-31T00:00:00", "ns").astype(np.int64)
    ts = rng.integers(t0, t1, size=n_events)
    types = rng.choice(np.array(
        ["view", "click", "purchase", "signup", "error"], dtype=object),
        size=n_events)
    ks = rng.integers(0, 100, size=n_events)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n_events), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("ns")),
        "user_id": pa.array(rng.integers(0, n_users, size=n_events), pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(np.round(rng.uniform(0, 100, size=n_events), 6),
                          pa.float64()),
        "props": pa.array([f'{{"k": {k}}}' for k in ks], pa.string()),
    }), f"{out}/events.parquet")

    print(json.dumps({"out": out, "documents": int(n_docs),
                      "embeddings": int(n_vecs), "events": int(n_events),
                      "users": int(n_users)}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
