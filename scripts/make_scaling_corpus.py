"""Build a K-times scaled MEASUREMENT corpus from an existing sf dir
(default: 10x sf0.1 ~= "sf1.0-equivalent") so the bench's parallel
scaling becomes observable (VERDICT r12 what's-wrong #2: at sf0.1
every query is fixed-overhead-bound and the c8/c32 ratio measures
nothing). This corpus is NEVER used for correctness or for the
driver's bench — timing only, written to a scratch dir outside
/root/testdata.

Construction (deterministic, pyarrow only — no Spark):
- fact tables (documents, embeddings, events, lineitem, orders,
  customer, part, supplier): K copies with all entity keys offset by
  copy*ID_OFF so each copy is internally join-consistent and keys
  never collide across copies;
- documents: copies i>0 get a copy-marker token prepended so the
  corpus does not become 10x exact duplicates (which would distort
  dedup/LSH candidate densities quadratically); n_chars updated;
- embeddings: copies i>0 get small deterministic per-copy jitter
  (seeded RNG, +-0.5% of each component) so LSH/ANN bucket densities
  scale like a real 10x corpus instead of 10-way exact vector twins;
- dimension tables (region, nation): copied unchanged (foreign keys
  still resolve; replicating them would multiply join matches).

Each copy lands as its own part file inside <name>.parquet/ so scan
parallelism scales with K.

Usage: python scripts/make_scaling_corpus.py [src_sf_dir] [dst_dir] [K]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ID_OFF = 100_000_000

KEY_COLS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
}
DIM_TABLES = ["region", "nation"]


def _offset_keys(tbl: pa.Table, cols: list[str], off: int) -> pa.Table:
    for c in cols:
        idx = tbl.schema.get_field_index(c)
        tbl = tbl.set_column(idx, c, pc.add(tbl.column(c), off))
    return tbl


def _perturb_documents(tbl: pa.Table, copy: int) -> pa.Table:
    marker = f"v{copy}x "
    text = pc.binary_join_element_wise(pa.scalar(marker), tbl.column("text"), "")
    tbl = tbl.set_column(tbl.schema.get_field_index("text"), "text", text)
    n_chars = pc.add(tbl.column("n_chars"), len(marker))
    return tbl.set_column(tbl.schema.get_field_index("n_chars"), "n_chars", n_chars)


def _perturb_embeddings(tbl: pa.Table, copy: int) -> pa.Table:
    col = tbl.column("embedding").combine_chunks()
    chunk = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
    values = chunk.values.to_numpy(zero_copy_only=False).astype(np.float32)
    rng = np.random.default_rng(42 + copy)
    jitter = (rng.random(values.shape, dtype=np.float32) - 0.5) * 0.01
    new_values = values * (1.0 + jitter)
    new_chunk = pa.ListArray.from_arrays(
        chunk.offsets, pa.array(new_values, type=pa.float32())
    )
    return tbl.set_column(
        tbl.schema.get_field_index("embedding"), "embedding", new_chunk
    )


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/scratch/sf1x10"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    for name in DIM_TABLES:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} rows (dimension, 1 copy)")
    for name, keys in KEY_COLS.items():
        base = pq.read_table(os.path.join(src, f"{name}.parquet"))
        out_dir = os.path.join(dst, f"{name}.parquet")
        os.makedirs(out_dir, exist_ok=True)
        for i in range(k):
            t = _offset_keys(base, keys, i * ID_OFF) if i else base
            if i and name == "documents":
                t = _perturb_documents(t, i)
            if i and name == "embeddings":
                t = _perturb_embeddings(t, i)
            pq.write_table(t, os.path.join(out_dir, f"part-{i:02d}.parquet"))
        print(f"{name}: {base.num_rows} x {k} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
