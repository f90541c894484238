#!/usr/bin/env python
"""Generate an sfN-equivalent of the driver testdata by FK-consistent
replication of /root/testdata/sf0.1 (VERDICT r3 task #5: the driver ships
sf0.001/0.01/0.1 only; a locally generated sf1 lets the oracle gate run at
10x to shake out size-dependent issues — band-bucket collisions, agg
overflow, float-rounding drift).

Each copy k offsets every key column by k * (max_key + 1) so joins stay
referentially intact (lineitem -> orders -> customer, part, supplier);
nation/region stay fixed dimensions. Documents get a per-copy " repK" text
suffix (k > 0) so the corpus is near- rather than exact-duplicated and
n_chars is recomputed; embeddings get a small per-copy, per-dimension
offset so distance ties don't explode combinatorially. Copy 0 is the
original data unchanged.

Usage: python scripts/gen_sf.py OUT_DIR [MULTIPLIER] [SRC_DIR]
"""

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC_DEFAULT = "/root/testdata/sf0.1"

# table -> {column: stride} (stride = max+1 of the sf0.1 key space)
OFFSETS = {
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000,
                 "l_suppkey": 1_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "customer": {"c_custkey": 15_000},
    "part": {"p_partkey": 20_000},
    "supplier": {"s_suppkey": 1_000},
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
FIXED = ("region", "nation")


def replicate(table: str, src: Path, mult: int) -> pa.Table:
    t = pq.read_table(src / f"{table}.parquet")
    if table in FIXED or mult == 1:
        return t
    copies = []
    for k in range(mult):
        cols = {name: t.column(name) for name in t.column_names}
        for col, stride in OFFSETS.get(table, {}).items():
            arr = cols[col].to_numpy(zero_copy_only=False) + k * stride
            cols[col] = pa.array(arr, type=t.schema.field(col).type)
        if table == "documents" and k > 0:
            txt = [f"{s} rep{k}" for s in cols["text"].to_pylist()]
            cols["text"] = pa.array(txt, type=pa.string())
            cols["n_chars"] = pa.array([len(s) for s in txt],
                                       type=pa.int64())
        if table == "embeddings" and k > 0:
            vecs = cols["embedding"].to_pylist()
            dim = len(vecs[0])
            bump = (0.0005 * k * ((np.arange(dim) % 7) - 3)).astype(
                np.float32)
            vecs = [(np.asarray(v, dtype=np.float32) + bump).tolist()
                    for v in vecs]
            cols["embedding"] = pa.array(
                vecs, type=t.schema.field("embedding").type)
        copies.append(pa.table(cols, schema=t.schema))
    return pa.concat_tables(copies)


def main() -> None:
    out = Path(sys.argv[1])
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = Path(sys.argv[3]) if len(sys.argv) > 3 else Path(SRC_DEFAULT)
    out.mkdir(parents=True, exist_ok=True)
    for table in list(OFFSETS) + list(FIXED):
        rep = replicate(table, src, mult)
        pq.write_table(rep, out / f"{table}.parquet")
        print(f"{table}: {rep.num_rows} rows")


if __name__ == "__main__":
    main()
