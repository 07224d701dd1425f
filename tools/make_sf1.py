#!/usr/bin/env python3
"""Build a replicated bench dataset from the driver's sf0.1 tables.

Two modes (BENCH-ONLY data — correctness stays on the driver's own sf
directories):

verbatim (default)
    The four large tables replicate Nx under disjoint key spaces (each
    replica's ids offset by k * max_id_range), small tables copied
    as-is. DOCUMENT text replicates verbatim, so an identical-payload
    group has C(N,2) near-dup pairs and pair-list queries grow ~N^2 in
    the replica count BY CONSTRUCTION — the stress-test upper bound;
    quote ratios with that caveat (BASELINE.md does).

perturbed (r19 verdict #1 — the engine-measuring corpus)
    Near-dup group size is a CONTROLLED CONSTANT g independent of N:
    per base document, replicas 1..g-1 are light mutations (one word
    dropped at a replica-dependent position — word-3-gram jaccard stays
    well above the 0.5 pair threshold) and replicas >= g are heavy
    mutations (every 2nd word replaced by a (doc, replica,
    position)-unique token — NO 3-gram survives against any other
    document, so heavy replicas pair with nothing but their own
    query-planted mutation). Expected verified pair mass is then
    ngroups*C(g,2) + corpus-linear query plants — linear in N, i.e.
    the engine's cost, not the corpus construction's. The builder
    asserts the planted geometry on a sample before writing.

EMBEDDINGS are synthetic-perturbed in BOTH modes (r19 verdict #2):
replica vectors are seeded deterministic perturbations of the base —
replicas 1..g-1 at noise that keeps cosine >= ~0.97 (above the 0.95
near-dup threshold, mutually too), replicas >= g fresh random vectors
at matched norms (cosine ~N(0, 1/8) against everything — never 0.95).
Verbatim x100 copies would be pathological for ANN (100 identical
vectors per cell); seeded perturbations give the ANN family a REAL
fourth decade. Requires the query plant offset at vec_id+10000000
(raised from +100000 in r20 — the old ceiling capped embeddings at
x49).

Usage: python3 tools/make_sf1.py [src] [dst] [replicas] [mode] [g]
  src       default /root/testdata/sf0.1
  dst       default /tmp/sf1
  replicas  default 10
  mode      verbatim | perturbed   (default verbatim)
  g         near-dup group size    (default 3; used by perturbed docs
                                    and by embeddings in both modes)
e.g. a 100x perturbed build: tools/make_sf1.py /root/testdata/sf0.1 /tmp/sf10p 100 perturbed
"""
import json, os, shutil, sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# id column -> (per-replica offset, replica-id ceiling). Offsets exceed
# the column's max at sf0.1; the ceiling is the smallest planted-mutation
# offset any query adds to that column (documents +1000000, embeddings
# +10000000 since r20, events/lineitem replicated ids must stay under the
# streaming sentinel/plant ranges) — replicas*offset must stay strictly
# below it or replica ids collide with planted rows and corrupt the
# queries.
PLANS = {
    "documents": {"doc_id": (5000, 1000000)},
    "embeddings": {"vec_id": (2000, 10000000)},
    "events": {"event_id": (100000, 10000000), "user_id": (1500, 10000000)},
    "lineitem": {"l_orderkey": (150000, 2**40)},
}

# Max rows per parquet row group, sized to ~0.1-5 MB of encoded data per
# group. pyarrow's default (1M rows) wrote each replicated table as ONE
# row group — and a parquet split can only start at a row-group boundary,
# so every documents scan ran on a single task no matter how many
# executors or how small spark.sql.files.maxPartitionBytes (measured in
# r15: text-kernel sf3/sf1 ratios read 4.6-5.7x for row-linear operators
# because the single scan task serialized 3x the strings). A real corpus
# is millions of multi-row-group files; bounded groups restore that.
ROW_GROUP_ROWS = {
    "documents": 1000,
    "embeddings": 2000,
    "events": 100000,
    "lineitem": 250000,
}


def word_trigrams(text):
    ws = text.lower().split()
    return {tuple(ws[i:i + 3]) for i in range(len(ws) - 2)}


def jac(a, b):
    return len(a & b) / len(a | b) if (a or b) else 0.0


def light_doc(text, k):
    """Replica k in 1..g-1: drop ONE word at a k-dependent position —
    a ~50-word doc keeps word-3-gram jaccard ~0.85+ vs the base and vs
    the other light mutants, far above the 0.5 pair threshold."""
    ws = text.split()
    if len(ws) < 4:
        return text  # too short to mutate safely; stays an exact dup
    drop = (k * 7) % len(ws)
    return " ".join(ws[:drop] + ws[drop + 1:])


def heavy_doc(text, doc_id, k):
    """Replica k >= g: every 2nd word becomes a (doc, replica,
    position)-unique token, so every 3-gram contains at least one token
    no other document anywhere shares — zero 3-gram overlap with the
    base, with other heavy replicas, and with other groups. Word count
    (and so corpus stats shape) is preserved."""
    ws = text.split()
    for j in range(1, len(ws), 2):
        ws[j] = f"w{doc_id}x{k}x{j}"
    return " ".join(ws)


def perturb_documents(tab, n, g):
    ids = tab.column("doc_id").to_pylist()
    texts = tab.column("text").to_pylist()
    parts = []
    off = PLANS["documents"]["doc_id"][0]
    for k in range(n):
        if k == 0:
            parts.append(tab)
            continue
        if k < g:
            new_texts = [t if t is None else light_doc(t, k) for t in texts]
        else:
            new_texts = [t if t is None else heavy_doc(t, i, k)
                         for i, t in zip(ids, texts)]
        rep = tab.set_column(tab.schema.get_field_index("doc_id"), "doc_id",
                             pc.add(tab.column("doc_id"), k * off))
        rep = rep.set_column(rep.schema.get_field_index("text"), "text",
                             pa.array(new_texts, type=pa.string()))
        if "n_chars" in rep.schema.names:
            rep = rep.set_column(
                rep.schema.get_field_index("n_chars"), "n_chars",
                pa.array([None if t is None else len(t) for t in new_texts],
                         type=tab.schema.field("n_chars").type))
        parts.append(rep)
    return pa.concat_tables(parts)


def synth_embeddings(tab, n, g):
    """Replica vectors: k in 1..g-1 = base + seeded noise at relative
    scale 0.15 (cosine ~0.989 vs base, ~0.978 between two light
    replicas — above the 0.95 threshold); k >= g = fresh seeded random
    vectors at the base vector's norm (cosine ~N(0, 1/sqrt(64)) against
    everything — never reaches 0.95). float32 end to end."""
    base = np.array(tab.column("embedding").to_pylist(), dtype=np.float32)
    norms = np.linalg.norm(base, axis=1, keepdims=True)
    off = PLANS["embeddings"]["vec_id"][0]
    parts = []
    for k in range(n):
        if k == 0:
            parts.append(tab)
            continue
        rng = np.random.RandomState(0xC0FFEE + k)  # fixed salt per replica
        if k < g:
            noise = rng.standard_normal(base.shape).astype(np.float32)
            noise /= np.linalg.norm(noise, axis=1, keepdims=True)
            vecs = base + 0.15 * norms * noise
        else:
            vecs = rng.standard_normal(base.shape).astype(np.float32)
            vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True) * norms
        rep = tab.set_column(tab.schema.get_field_index("vec_id"), "vec_id",
                             pc.add(tab.column("vec_id"), k * off))
        rep = rep.set_column(
            rep.schema.get_field_index("embedding"), "embedding",
            pa.array([row for row in vecs.astype(np.float32).tolist()],
                     type=tab.schema.field("embedding").type))
        parts.append(rep)
    return pa.concat_tables(parts)


def assert_planted_geometry(doc_tab, emb_tab, n_doc, n_emb, g, mode):
    """Sampled invariants the pair queries' expected counts rest on —
    fail the BUILD, not the bench, if the mutation scheme drifts."""
    if mode == "perturbed" and doc_tab is not None and n_doc > 1:
        n = n_doc
        ids = doc_tab.column("doc_id").to_pylist()
        texts = doc_tab.column("text").to_pylist()
        by_id = dict(zip(ids, texts))
        base_off = PLANS["documents"]["doc_id"][0]
        checked = 0
        for b in range(0, 5000, 251):
            if b not in by_id or by_id[b] is None:
                continue
            t0 = word_trigrams(by_id[b])
            if len(by_id[b].split()) < 10:
                continue
            for k in range(1, min(n, g)):
                jl = jac(t0, word_trigrams(by_id[b + k * base_off]))
                assert jl >= 0.55, f"light mutant too far: doc {b} k={k} j={jl}"
            for k in range(g, min(n, g + 3)):
                jh = jac(t0, word_trigrams(by_id[b + k * base_off]))
                assert jh <= 0.1, f"heavy mutant too close: doc {b} k={k} j={jh}"
                if k + 1 < min(n, g + 3):
                    jhh = jac(word_trigrams(by_id[b + k * base_off]),
                              word_trigrams(by_id[b + (k + 1) * base_off]))
                    assert jhh <= 0.05, f"heavy replicas overlap: {b} k={k}"
            checked += 1
        assert checked >= 10, "geometry sample too small"
    if emb_tab is not None and n_emb > 1:
        n = n_emb
        ids = emb_tab.column("vec_id").to_pylist()
        embs = emb_tab.column("embedding").to_pylist()
        by_id = dict(zip(ids, embs))
        off = PLANS["embeddings"]["vec_id"][0]

        def cos(a, b):
            a, b = np.asarray(a), np.asarray(b)
            return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        for b in range(0, 2000, 137):
            for k in range(1, min(n, g)):
                c = cos(by_id[b], by_id[b + k * off])
                assert c >= 0.95, f"light vec too far: {b} k={k} cos={c}"
            for k in range(g, min(n, g + 3)):
                c = cos(by_id[b], by_id[b + k * off])
                assert c < 0.8, f"heavy vec too close: {b} k={k} cos={c}"


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    mode = sys.argv[4] if len(sys.argv) > 4 else "verbatim"
    g = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    assert mode in ("verbatim", "perturbed"), mode
    os.makedirs(dst, exist_ok=True)
    # Durable record of the EFFECTIVE per-table factor (caps below can
    # silently lower it) so scaling ratios are quoted against reality
    # even after the stdout note scrolls away.
    manifest = {"src": src, "requested_replicas": replicas, "mode": mode,
                "group_size": g, "tables": {}}
    doc_tab = emb_tab = None
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        name = f[: -len(".parquet")]
        if name not in PLANS:
            shutil.copy(os.path.join(src, f), os.path.join(dst, f))
            manifest["tables"][name] = {"replicas": 1, "capped": False}
            continue
        # Per-table replica cap (r16): each table replicates at most as
        # far as its planted-id ceiling allows — one more replica and
        # replica ids collide with query-planted rows, corrupting the
        # queries. The ACTUAL factor lands in the manifest; scaling
        # ratios must be quoted against it, not the requested factor.
        max_k = min((ceil - 1) // off for _, (off, ceil)
                    in PLANS[name].items())
        n = min(replicas, max_k)
        if n < replicas:
            print(f"# {name}: capped at {n} replicas "
                  f"(planted-id ceiling; requested {replicas})")
        tab = pq.read_table(os.path.join(src, f))
        if name == "documents" and mode == "perturbed":
            out = perturb_documents(tab, n, g)
            doc_tab = out
        elif name == "embeddings":
            out = synth_embeddings(tab, n, g)
            emb_tab = out
        else:
            parts = []
            for k in range(n):
                rep = tab
                for col, (off, _) in PLANS[name].items():
                    i = rep.schema.get_field_index(col)
                    rep = rep.set_column(i, col,
                                         pc.add(rep.column(col), k * off))
                parts.append(rep)
            out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(dst, f), compression="snappy",
                       row_group_size=ROW_GROUP_ROWS[name])
        print(name, out.num_rows, f"x{n}")
        manifest["tables"][name] = {
            "replicas": n, "capped": n < replicas, "rows": out.num_rows}
    if emb_tab is not None or doc_tab is not None:
        assert_planted_geometry(
            doc_tab, emb_tab,
            manifest["tables"].get("documents", {}).get("replicas", 1),
            manifest["tables"].get("embeddings", {}).get("replicas", 1),
            g, mode)
        print("# planted geometry asserted (sampled)")
    if mode == "perturbed":
        ng = manifest["tables"]["documents"]["rows"] // max(
            1, manifest["tables"]["documents"]["replicas"])
        reps = manifest["tables"]["documents"]["replicas"]
        expected = ng * (min(reps, g) * (min(reps, g) - 1) // 2)
        manifest["expected_group_pairs"] = expected
        print(f"# expected near-dup group pairs ~{expected} "
              f"(+ corpus-linear query plants)")
    with open(os.path.join(dst, "MANIFEST.json"), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
        fh.write("\n")


if __name__ == "__main__":
    main()
