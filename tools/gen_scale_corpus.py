#!/usr/bin/env python3
"""One-off scaled `documents` corpora for the shingle-family scaling proof
(driver-side tooling, like compare.py — not part of the Spark library).

Writes three corpora under the given output root (default /tmp/scale_docs):

  x1/documents.parquet      5,000 docs, one vocab shard            (baseline)
  x10/documents.parquet    50,000 docs, 10 disjoint vocab shards   (Heaps regime)
  x10sat/documents.parquet 50,000 docs, ONE vocab shard            (saturated regime)

The sharded x10 models how real corpora scale (vocabulary grows with corpus
size, per-gram document frequency stays constant): 10 shards, each an
independent x1-like corpus whose tokens carry a shard suffix, so distinct
grams grow 10x and df distribution matches x1. The saturated x10sat keeps
the 31-word vocab fixed so the gram space saturates and per-gram df grows
~10x — the adversarial regime where only the df-cap stands between the
blocking join and O(doc^2) pairs.

Same generator at both scales (seeded, deterministic): doc length uniform
8..100 tokens, 2% of docs are near-copies of an earlier same-shard doc with
~5% token perturbation (gives the Jaccard/containment queries real work).
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "vector", "scan", "fast", "query", "agg", "slow", "value", "filter",
    "customer", "stream", "join", "window", "state", "shuffle", "hash",
    "merge", "index", "cache", "table", "group", "count", "plan", "stage",
]
LANGS = ["en", "de", "fr", "es", "zh"]
NEAR_DUP_RATE = 0.02
PERTURB_RATE = 0.05


def gen_shard(rng, shard, n_docs, id_base, suffix):
    words = [w + suffix for w in VOCAB]
    docs = []
    for k in range(n_docs):
        if docs and rng.random() < NEAR_DUP_RATE:
            src = docs[rng.integers(0, len(docs))]
            toks = [
                words[rng.integers(0, len(words))]
                if rng.random() < PERTURB_RATE else t
                for t in src
            ]
        else:
            n = int(rng.integers(8, 101))
            toks = [words[i] for i in rng.integers(0, len(words), n)]
        docs.append(toks)
    rows = []
    for k, toks in enumerate(docs):
        text = " ".join(toks)
        rows.append((id_base + k, text, LANGS[rng.integers(0, len(LANGS))],
                     f"src{shard}", len(text)))
    return rows


def write(path, rows):
    ids, texts, langs, srcs, ncs = zip(*rows)
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array(ncs, pa.int64()),
    })
    pq.write_table(t, path)
    print(f"wrote {path}: {t.num_rows} rows")


def write_embeddings(path, n, seed=7, skew=0.0):
    """Seeded 64-dim float32 embeddings with ~2% planted near-dups
    (source vector + small perturbation) so the ANN/near-dup queries have
    real positives at every scale. vec_id 0..n-1 — the queries' own
    query/corpus split (vec_id < 5 / >= 5) applies unchanged.

    skew > 0 is the SATURATED regime for the vector family: that fraction
    of vectors is drawn as tight near-dups of just 8 anchors, so a few
    semantic clusters absorb a large share of the corpus — the adversarial
    case for any per-cluster pairwise step (q100/q131's within-cluster
    O(n_c^2)), the same role the pinned vocab plays for the gram family.
    """
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, 64)).astype(np.float32)
    dup_src = rng.integers(0, n, max(1, n // 50))
    for k, s in enumerate(dup_src):
        d = (s + 1 + k) % n
        v[d] = v[s] + 0.01 * rng.standard_normal(64).astype(np.float32)
    if skew > 0:
        anchors = rng.standard_normal((8, 64)).astype(np.float32)
        picks = rng.random(n) < skew
        # anchored vectors keep ids spread across the whole range so every
        # centroid window (vec_id < K) contains both regimes
        v[picks] = (anchors[rng.integers(0, 8, picks.sum())]
                    + 0.01 * rng.standard_normal((picks.sum(), 64)).astype(np.float32))
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
    })
    pq.write_table(t, path)
    print(f"wrote {path}: {t.num_rows} rows")


def write_events(path, n, n_users, seed=11):
    """Seeded events table matching the driver testdata's schema/encoding
    (ts as parquet TIMESTAMP(MICROS, no-TZ) — exercises the same
    normalizeTs branch). event_id is ARRIVAL order; event time lags it by
    an exponential delay with a heavy tail (~2% beyond 3 s), so the
    lateness/debounce/ordering queries (q88/q113) see realistic
    out-of-order data at every scale. n_users controls per-key depth:
    scaling users with n keeps per-user history constant (natural regime);
    pinning users while n grows 10x is the per-key-window adversary."""
    rng = np.random.default_rng(seed)
    span = 30 * 24 * 3600 * 10**6
    arrival = np.sort(rng.integers(0, span, n))
    late = (rng.exponential(0.5, n) * 10**6).astype(np.int64)
    tail = rng.random(n) < 0.02
    late[tail] += rng.integers(3, 300, tail.sum()) * 10**6
    ts = np.datetime64("2024-01-01T00:00:00", "us") \
        + np.maximum(arrival - late, 0).astype("timedelta64[us]")
    types = np.array(["view", "click", "purchase", "signup", "error"])
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
        "event_type": pa.array(types[rng.integers(0, 5, n)], pa.string()),
        "value": pa.array(np.round(rng.random(n) * 100, 2), pa.float64()),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n)],
                          pa.string()),
    })
    pq.write_table(t, path)
    print(f"wrote {path}: {t.num_rows} rows")


def main():
    # flags are not positional: `gen_scale_corpus.py --x100` must not
    # write the corpora under a directory literally named "--x100"
    positional = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = positional[0] if positional else "/tmp/scale_docs"
    per_shard = 5000
    n_events = 20000
    ev_users = 300
    import os
    rng = np.random.default_rng(42)
    x1 = gen_shard(rng, 0, per_shard, 0, "")
    os.makedirs(f"{out}/x1", exist_ok=True)
    write(f"{out}/x1/documents.parquet", x1)
    write_embeddings(f"{out}/x1/embeddings.parquet", per_shard)
    write_events(f"{out}/x1/events.parquet", n_events, ev_users)
    # identical copy under a distinct dir: ScalingBench's sacrificial
    # JIT-warmup target (Staging keys on the dir string)
    os.makedirs(f"{out}/x1warm", exist_ok=True)
    write(f"{out}/x1warm/documents.parquet", x1)
    write_embeddings(f"{out}/x1warm/embeddings.parquet", per_shard)
    write_events(f"{out}/x1warm/events.parquet", n_events, ev_users)

    rng = np.random.default_rng(42)
    rows = []
    for shard in range(10):
        suffix = "" if shard == 0 else f"_s{shard}"
        rows += gen_shard(rng, shard, per_shard, shard * per_shard, suffix)
    os.makedirs(f"{out}/x10", exist_ok=True)
    write(f"{out}/x10/documents.parquet", rows)
    write_embeddings(f"{out}/x10/embeddings.parquet", per_shard * 10)
    # natural regime: users scale with volume, per-user depth constant
    write_events(f"{out}/x10/events.parquet", n_events * 10, ev_users * 10)

    rng = np.random.default_rng(42)
    rows = []
    for shard in range(10):
        rows += gen_shard(rng, shard, per_shard, shard * per_shard, "")
    os.makedirs(f"{out}/x10sat", exist_ok=True)
    write(f"{out}/x10sat/documents.parquet", rows)
    # saturated embeddings to match the saturated documents: 40% of the
    # vectors collapse onto 8 anchors (see write_embeddings skew) — the
    # cluster-skew adversary for the semantic-dedup family. Rounds <= 7
    # wrote a byte-copy of x10 here, so no embeddings query had a real
    # saturated-regime measurement.
    write_embeddings(f"{out}/x10sat/embeddings.parquet", per_shard * 10, skew=0.4)
    # saturated regime for the event family: same 10x volume but the user
    # population PINNED, so per-key history grows 10x — the adversary for
    # every per-user window/sort/state op (q75/q88/q103/q104)
    write_events(f"{out}/x10sat/events.parquet", n_events * 10, ev_users)

    # x100 (opt-in: --x100): one more Heaps-regime decade for the
    # round-11 x100 legs — 100 shards / 500k docs, 500k embeddings, 2M
    # events. Construction identical to x10 (vocab grows with corpus, df
    # distribution constant), so exponents chain: x1 -> x10 -> x100.
    if "--x100" in sys.argv:
        rng = np.random.default_rng(42)
        rows = []
        for shard in range(100):
            suffix = "" if shard == 0 else f"_s{shard}"
            rows += gen_shard(rng, shard, per_shard, shard * per_shard, suffix)
        os.makedirs(f"{out}/x100", exist_ok=True)
        write(f"{out}/x100/documents.parquet", rows)
        write_embeddings(f"{out}/x100/embeddings.parquet", per_shard * 100)
        write_events(f"{out}/x100/events.parquet", n_events * 100, ev_users * 100)


if __name__ == "__main__":
    main()
