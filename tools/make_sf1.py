#!/usr/bin/env python3
"""Build a replicated bench dataset: the driver's sf0.1 tables with the
four large tables replicated Nx under disjoint key spaces (each replica's
ids offset by k * max_id_range so per-replica joins/plants stay
self-contained and below the queries' planted-id offsets), small tables
copied as-is. BENCH-ONLY data — correctness stays on the driver's own
sf directories. Text/vector payloads are replicated verbatim, so dup-
density-sensitive queries (minhash, embed pairs) see an Nx-denser,
strictly HARDER input; their observed scaling is an upper bound (see
BASELINE.md). At N replicas an identical-payload group has C(N,2) pairs,
so pair-list queries grow ~N^2 in the replica count BY CONSTRUCTION —
quote ratios with that caveat.

Usage: python3 tools/make_sf1.py [src=/root/testdata/sf0.1] [dst=/tmp/sf1]
                                 [replicas=10]
e.g. a 30x ("sf3") build: python3 tools/make_sf1.py /root/testdata/sf0.1 /tmp/sf3 30
"""
import json, os, shutil, sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# id column -> (per-replica offset, replica-id ceiling). Offsets exceed
# the column's max at sf0.1; the ceiling is the smallest planted-mutation
# offset any query adds to that column (documents +1000000, embeddings
# +100000, events/lineitem replicated ids must stay under the streaming
# sentinel/plant ranges) — replicas*offset must stay strictly below it or
# replica ids collide with planted rows and corrupt the queries.
PLANS = {
    "documents": {"doc_id": (5000, 1000000)},
    "embeddings": {"vec_id": (2000, 100000)},
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


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    # Durable record of the EFFECTIVE per-table factor (caps below can
    # silently lower it) so scaling ratios are quoted against reality
    # even after the stdout note scrolls away.
    manifest = {"src": src, "requested_replicas": replicas, "tables": {}}
    for f in os.listdir(src):
        if not f.endswith(".parquet"):
            continue
        name = f[: -len(".parquet")]
        if name not in PLANS:
            shutil.copy(os.path.join(src, f), os.path.join(dst, f))
            manifest["tables"][name] = {"replicas": 1, "capped": False}
            continue
        # Per-table replica cap (r16, needed past ~49 replicas): each
        # table replicates at most as far as its planted-id ceiling
        # allows — one more replica and replica ids collide with
        # query-planted rows, corrupting the queries. The ACTUAL factor
        # is printed per table; scaling ratios must be quoted against
        # it, not the requested factor (BASELINE.md does).
        max_k = min((ceil - 1) // off for _, (off, ceil)
                    in PLANS[name].items())
        n = min(replicas, max_k)
        if n < replicas:
            print(f"# {name}: capped at {n} replicas "
                  f"(planted-id ceiling; requested {replicas})")
        tab = pq.read_table(os.path.join(src, f))
        parts = []
        for k in range(n):
            rep = tab
            for col, (off, _) in PLANS[name].items():
                i = rep.schema.get_field_index(col)
                rep = rep.set_column(i, col, pc.add(rep.column(col), k * off))
            parts.append(rep)
        out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(dst, f), compression="snappy",
                       row_group_size=ROW_GROUP_ROWS[name])
        print(name, out.num_rows, f"x{n}")
        manifest["tables"][name] = {
            "replicas": n, "capped": n < replicas, "rows": out.num_rows}
    with open(os.path.join(dst, "MANIFEST.json"), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)
        fh.write("\n")


if __name__ == "__main__":
    main()
