#!/usr/bin/env python3
"""Stress-set generator (dev tooling, driver-side python only).

Replicates sf0.1's documents/embeddings/events by FACTOR with disjoint id
spaces, scaled-OUT document blocking groups (source-i suffixes keep each
group at sf0.1 size, matching how real corpora grow), and texts/vectors
copied verbatim (so every doc gains FACTOR-1 exact duplicates — a
deliberate duplication stress). Other tables are copied verbatim. This is
the same recipe as round 2's /tmp/graft_sf1 (BASELINE.md "Scaling
profile"); parameterized so any decade can be rebuilt after /tmp is wiped.

Usage: python3 tools/gen_stress.py <srcDir> <outDir> <factor>
"""
import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPLICATED = ["documents", "embeddings", "events"]
ID_COLS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}


def replicate(src, out, name, factor):
    t = pq.read_table(f"{src}/{name}.parquet")
    # clean power-of-ten offset keeps replica ids human-readable
    max_id = max(pc.max(t[c]).as_py() for c in ID_COLS[name])
    offset = 10 ** len(str(max_id))
    writer = pq.ParquetWriter(f"{out}/{name}.parquet", t.schema)
    for i in range(factor):
        r = t
        for c in ID_COLS[name]:
            r = r.set_column(r.schema.get_field_index(c), c,
                             pc.add(r[c], i * offset).cast(r.schema.field(c).type))
        if i > 0 and "source" in r.column_names:
            # scale groups OUT, not up: each replica is its own block
            r = r.set_column(r.schema.get_field_index("source"), "source",
                             pc.binary_join_element_wise(
                                 r["source"], f"-{i}", ""))
        writer.write_table(r)
    writer.close()
    print(f"{name}: {t.num_rows} x {factor} -> {t.num_rows * factor}")


def main(src, out, factor):
    Path(out).mkdir(parents=True, exist_ok=True)
    for p in Path(src).glob("*.parquet"):
        if p.stem not in REPLICATED:
            shutil.copy(p, f"{out}/{p.name}")
    for name in REPLICATED:
        replicate(src, out, name, factor)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
