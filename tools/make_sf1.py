#!/usr/bin/env python3
"""Build the /tmp/sf1 bench dataset: the driver's sf0.1 tables with the
four large tables replicated 10x under disjoint key spaces (each replica's
ids offset by k * max_id_range so per-replica joins/plants stay
self-contained and below the queries' planted-id offsets), small tables
copied as-is. BENCH-ONLY data — correctness stays on the driver's own
sf directories. Text/vector payloads are replicated verbatim, so dup-
density-sensitive queries (minhash, embed pairs) see a 10x-denser, strictly
HARDER input; their observed scaling is an upper bound (see BASELINE.md).

Usage: python3 tools/make_sf1.py [src=/root/testdata/sf0.1] [dst=/tmp/sf1]
"""
import os, shutil, sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPLICAS = 10
# id column -> per-replica offset (> the column's max at sf0.1, and small
# enough that replica ids stay below the planted-mutation offsets the
# queries add: documents +1000000/+2000000, embeddings +100000)
PLANS = {
    "documents": {"doc_id": 5000},
    "embeddings": {"vec_id": 2000},
    "events": {"event_id": 100000, "user_id": 1500},
    "lineitem": {"l_orderkey": 150000},
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(src):
        if not f.endswith(".parquet"):
            continue
        name = f[: -len(".parquet")]
        if name not in PLANS:
            shutil.copy(os.path.join(src, f), os.path.join(dst, f))
            continue
        tab = pq.read_table(os.path.join(src, f))
        parts = []
        for k in range(REPLICAS):
            rep = tab
            for col, off in PLANS[name].items():
                i = rep.schema.get_field_index(col)
                rep = rep.set_column(i, col, pc.add(rep.column(col), k * off))
            parts.append(rep)
        out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(dst, f), compression="snappy")
        print(name, out.num_rows)


if __name__ == "__main__":
    main()
