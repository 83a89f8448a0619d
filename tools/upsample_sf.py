"""Deterministic 10x upsample of an sf directory for the sf1 spot-bench
(round-4 VERDICT #8: sf0.1 hides complexity cliffs).

No external data: every new row is derived from /root/testdata/sf0.1 by a
seeded, copy-indexed transform that preserves each table's workload
character while keeping keys unique and joins intact:

- dims (region/nation/customer/supplier/part): copied as-is — scaling the
  fact side 10x against fixed dims is the realistic fleet shape (the
  broadcast side stays broadcast-able).
- orders/lineitem: copy k offsets o_orderkey/l_orderkey by k*KEY_STRIDE
  (stride > max key) so orders⋈lineitem still matches 1:N within a copy;
  o_custkey/l_partkey/l_suppkey stay in the original dim domain.
- events: event_id offset per copy; user_id stays in domain (sessionize/
  funnel/retention get 10x events over the same user population — the
  skew shape a real 10x traffic growth produces).
- documents: copy 0 is the original corpus. Copies 1..9 REMIX each text:
  every word is deterministically replaced with a draw from the observed
  global vocabulary (hash(doc_id, copy, position)), keeping the exact
  word COUNT per doc. Length/lang/source distributions are preserved
  exactly; cross-copy Jaccard collapses to the vocab-overlap baseline,
  so the corpus dup-RATE (not dup-count) matches sf0.1 and MinHash/LSH
  work per row is unchanged.
- embeddings: copy k rotates each vector by a seeded sign-flip + swap
  pattern (norm-preserving, deterministic), vec_id offset per copy.

Usage: python tools/upsample_sf.py [--src /root/testdata/sf0.1]
                                   [--dst /tmp/sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIMS = ["region", "nation", "customer", "supplier", "part"]
KEY_STRIDE = 10_000_000


def _seed_rng(*parts: object) -> np.random.Generator:
    h = hashlib.md5("|".join(str(p) for p in parts).encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "little"))


def _copy_dims(src: str, dst: str) -> None:
    for t in DIMS:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        pq.write_table(tbl, os.path.join(dst, f"{t}.parquet"))


def _upsample_keyed(src: str, dst: str, table: str, key_cols: list[str], copies: int) -> int:
    tbl = pq.read_table(os.path.join(src, f"{table}.parquet"))
    out = []
    for k in range(copies):
        t = tbl
        if k:
            for c in key_cols:
                arr = pa.compute.add(t[c], pa.scalar(k * KEY_STRIDE, t.schema.field(c).type))
                t = t.set_column(t.schema.get_field_index(c), c, arr)
        out.append(t)
    merged = pa.concat_tables(out)
    pq.write_table(merged, os.path.join(dst, f"{table}.parquet"))
    return merged.num_rows


def _upsample_documents(src: str, dst: str, copies: int) -> int:
    tbl = pq.read_table(os.path.join(src, "documents.parquet"))
    df = tbl.to_pandas()
    words_per_doc = [t.split() for t in df["text"]]
    vocab = sorted({w for ws in words_per_doc for w in ws})
    varr = np.array(vocab)
    n = len(df)
    outs = [tbl]
    for k in range(1, copies):
        rng = _seed_rng("documents", k)
        texts = []
        for i, ws in enumerate(words_per_doc):
            idx = rng.integers(0, len(varr), size=len(ws))
            texts.append(" ".join(varr[idx]))
        d2 = df.copy()
        d2["doc_id"] = df["doc_id"] + k * KEY_STRIDE
        d2["text"] = texts
        d2["n_chars"] = [len(t) for t in texts]
        outs.append(pa.Table.from_pandas(d2, schema=tbl.schema, preserve_index=False))
    merged = pa.concat_tables(outs)
    pq.write_table(merged, os.path.join(dst, "documents.parquet"))
    return merged.num_rows


def _upsample_embeddings(src: str, dst: str, copies: int) -> int:
    tbl = pq.read_table(os.path.join(src, "embeddings.parquet"))
    df = tbl.to_pandas()
    mat = np.stack([np.asarray(v, dtype=np.float32) for v in df["embedding"]])
    dim = mat.shape[1]
    outs = [tbl]
    for k in range(1, copies):
        rng = _seed_rng("embeddings", k)
        signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
        perm = rng.permutation(dim)
        m2 = (mat * signs)[:, perm]
        d2 = df.copy()
        d2["vec_id"] = df["vec_id"] + k * KEY_STRIDE
        d2["embedding"] = [row for row in m2]
        outs.append(pa.Table.from_pandas(d2, schema=tbl.schema, preserve_index=False))
    merged = pa.concat_tables(outs)
    pq.write_table(merged, os.path.join(dst, "embeddings.parquet"))
    return merged.num_rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    _copy_dims(args.src, args.dst)
    rows = {}
    rows["orders"] = _upsample_keyed(args.src, args.dst, "orders", ["o_orderkey"], args.copies)
    rows["lineitem"] = _upsample_keyed(args.src, args.dst, "lineitem", ["l_orderkey"], args.copies)
    rows["events"] = _upsample_keyed(args.src, args.dst, "events", ["event_id"], args.copies)
    rows["documents"] = _upsample_documents(args.src, args.dst, args.copies)
    rows["embeddings"] = _upsample_embeddings(args.src, args.dst, args.copies)
    for t, n in rows.items():
        print(f"{t}: {n:,} rows")


if __name__ == "__main__":
    main()
