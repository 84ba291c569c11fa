#!/usr/bin/env python3
"""Scale-up fixture generator: emit an N-fold copy of a driver testdata dir.

The driver ships sf0.001/sf0.01/sf0.1 (TESTDATA.md, read-only). Scale-proof
runs (VERDICT round 5, "Next round #1") need a 10x fixture; this generator
derives it deterministically from sf0.1 by key-shifted replication:

  * every dimension/fact key is shifted by copy_index * (max_key + 1), with
    the SAME shift constant applied to every foreign-key reference — so
    referential integrity (customer<-orders<-lineitem, part/supplier<-
    lineitem) holds exactly and every join family exercises 10x the rows;
  * region/nation are fixed dimensions and copied as-is (like TPC-H, they
    do not scale);
  * document texts are copied VERBATIM — each sf0.1 text appears 10x, which
    stresses the dedup/LSH families with known-size duplicate groups while
    keeping per-copy doc_ids unique for deterministic tiebreaks;
  * embeddings get deterministic per-copy jitter (seeded by copy index) so
    ANN distance ties stay non-degenerate; copy 0 is bit-identical to the
    source.

Correctness at the new scale is still engine-vs-engine on the SAME parquet
(Spark result vs DuckDB oracle), so distributional fidelity to the driver's
generator is not required — only schema fidelity (preserved exactly via
pyarrow) and non-degenerate value distributions (preserved by replication).

With --mutate, document texts in copies > 0 are perturbed instead of
copied verbatim: ~10% of whitespace tokens get a content-hash-seeded
suffix (deterministic per (text, copy)), which drops cross-copy shingle
Jaccard well below the 0.8 dedup threshold and re-randomizes the
md5-derived multimodal payloads. Verbatim replication makes pair-output
queries output-bound (audio_fp_pairs grew 9,416x at sf1 — unreadable as
a plan-scaling signal); the mutate run is the complementary fixture where
pair outputs scale ~linearly and super-linear time IS a plan smell.
n_chars is recomputed so the n_chars == length(text) fixture invariant
holds for mutated rows.

Usage: python3 tools/gen_sf.py <srcDir> <dstDir> [copies=10] [--mutate]
"""
import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SEED = 42

# table -> {column: shift-domain} ; every column sharing a domain shifts by
# the same constant so joins stay consistent across tables
KEY_DOMAINS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
COPY_AS_IS = ["region", "nation"]


def domain_strides(src):
    """max_key + 1 per shift domain, read from the source tables."""
    strides = {}
    for table, cols in KEY_DOMAINS.items():
        t = pq.read_table(os.path.join(src, f"{table}.parquet"),
                          columns=list(cols))
        for col, dom in cols.items():
            m = pc.max(t.column(col)).as_py()
            strides[dom] = max(strides.get(dom, 0), int(m) + 1)
    return strides


def shifted_copy(table, name, copy_idx, strides):
    cols = []
    for field in table.schema:
        col = table.column(field.name)
        dom = KEY_DOMAINS.get(name, {}).get(field.name)
        if dom is not None and copy_idx > 0:
            col = pc.add(col, pa.scalar(copy_idx * strides[dom],
                                        type=field.type))
        cols.append(col)
    return pa.table(cols, schema=table.schema)


def jitter_embeddings(table, copy_idx):
    """Per-copy deterministic noise (~1e-3) on the vectors; copy 0 exact."""
    if copy_idx == 0:
        return table
    emb = table.column("embedding").combine_chunks()
    values = emb.values.to_numpy(zero_copy_only=False).astype(np.float32)
    rng = np.random.RandomState(SEED + copy_idx)
    noised = values + rng.uniform(-1e-3, 1e-3, size=values.shape) \
        .astype(np.float32)
    new_emb = pa.ListArray.from_arrays(emb.offsets, pa.array(
        noised, type=pa.float32()))
    idx = table.schema.get_field_index("embedding")
    return table.set_column(idx, table.schema.field(idx), new_emb)


def mutate_documents(table, copy_idx):
    """Content-hash-seeded token perturbation (copies > 0): ~10% of tokens
    get a deterministic suffix, killing cross-copy near-dup matches."""
    if copy_idx == 0:
        return table
    texts = table.column("text").to_pylist()
    out = []
    for t in texts:
        h = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16)
        rng = np.random.RandomState((h ^ (SEED + copy_idx * 0x9E3779))
                                    % (2 ** 32))
        toks = t.split(" ")
        k = max(1, len(toks) // 10)
        for i in rng.choice(len(toks), size=min(k, len(toks)),
                            replace=False):
            toks[i] = f"{toks[i]}x{rng.randint(0, 1296):x}"
        out.append(" ".join(toks))
    for col, vals in (("text", pa.array(out, type=table.schema
                                        .field("text").type)),
                      ("n_chars", pa.array([len(s) for s in out],
                                           type=table.schema
                                           .field("n_chars").type))):
        idx = table.schema.get_field_index(col)
        table = table.set_column(idx, table.schema.field(idx), vals)
    return table


def main():
    argv = [a for a in sys.argv[1:] if a != "--mutate"]
    mutate = "--mutate" in sys.argv
    src, dst = argv[0], argv[1]
    copies = int(argv[2]) if len(argv) > 2 else 10
    os.makedirs(dst, exist_ok=True)
    strides = domain_strides(src)
    print(f"strides: {strides}")
    for name in COPY_AS_IS:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} rows (copied)")
    for name in KEY_DOMAINS:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        parts = []
        for i in range(copies):
            c = shifted_copy(t, name, i, strides)
            if name == "embeddings":
                c = jitter_embeddings(c, i)
            if mutate and name == "documents":
                c = mutate_documents(c, i)
            parts.append(c)
        out = pa.concat_tables(parts)
        # Many row groups, not one: a mono-row-group file gives Spark's
        # scan exactly one split regardless of maxPartitionBytes, which
        # serializes every per-row-heavy projection above it and hides
        # real plan parallelism from the scaling runs. ~32 groups per
        # table mirrors the many-split layout any real corpus has.
        rgs = max(4096, out.num_rows // 32)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"),
                       row_group_size=rgs)
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows (rg={rgs})")


if __name__ == "__main__":
    main()
