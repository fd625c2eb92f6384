#!/usr/bin/env python3
"""Boilerplate-corpus stress generator (dev tooling, driver-side python).

Plants one shared multi-token header on 30% of documents (doc_id % 10 in
{0,1,2}) and appends a per-doc unique token, so the planted docs are all
DISTINCT content — exact dedup cannot collapse them, and every one of
them shares the header's 8-gram shingles. This is the hot-key class the
containmentPairs maxDocFreq cap exists for: without the cap each header
shingle joins 0.3N x 0.3N rows (quadratic in corpus size); with it the
header shingles exceed the doc-frequency threshold and drop before the
pair join. Other tables copy verbatim.

Usage: python3 tools/gen_boilerplate.py <srcDir> <outDir>
"""
import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

HEADER = ("license header governance notice all rights reserved "
          "do not remove this standard corporate banner text")


def main(src, out):
    Path(out).mkdir(parents=True, exist_ok=True)
    for p in Path(src).glob("*.parquet"):
        if p.stem != "documents":
            shutil.copy(p, f"{out}/{p.name}")
    t = pq.read_table(f"{src}/documents.parquet")
    ids = t["doc_id"].combine_chunks()
    hit = pa.chunked_array([pa.array(
        [(v % 10) < 3 for v in ids.to_pylist()], pa.bool_())])
    uniq = pc.binary_join_element_wise(
        HEADER + " ", t["text"], " uniq", pc.cast(t["doc_id"], pa.string()),
        "")
    text = pc.if_else(hit, uniq, t["text"])
    t = t.set_column(t.schema.get_field_index("text"), "text",
                     text.cast(t.schema.field("text").type))
    pq.write_table(t, f"{out}/documents.parquet")
    n_hit = pc.sum(pc.cast(hit, pa.int64())).as_py()
    print(f"documents: {t.num_rows} rows, {n_hit} with planted header")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
