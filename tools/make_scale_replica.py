"""Materialize an ~sfN parquet replica of the sf0.1 testdata.

The driver only ships sf{0.001,0.01,0.1}; the 2x-band bench has
therefore only ever been checked at sf0.1. This tool writes a bench-
shaped scale directory (same filenames, same schemas) holding N
id-shifted copies of each sf0.1 table so `bench.py` can run unmodified
at ~sfN via SPARK_GRAFT_SF_DIR.

Replication rules keep query semantics scale-faithful:
- region/nation are DIMENSIONS: copied verbatim (TPC-H holds them
  fixed across scale factors; replicating them would multiply join
  fan-out instead of data volume).
- fact/key columns shift by copy_index * 10^8 CONSISTENTLY across
  tables (o_custkey shifts with c_custkey, l_orderkey with o_orderkey,
  ...), so every within-copy join matches exactly once, like real data.
- documents.text gets a per-copy prefix: otherwise each doc would have
  N-1 identical twins and every near-dup query's OUTPUT grows as
  C(N,2) per doc — a property of replica data, not of scale. With the
  prefix, cross-copy pairs are genuine non-dups and dedup output
  scales linearly, matching a real corpus's dup-rate.
- events timestamps / order dates are left alone: time-range density
  grows with volume, which is exactly what a bigger day of traffic
  looks like.

Usage: python tools/make_scale_replica.py [N] [outdir]
       (default N=10, outdir=/tmp/sf_replica_{N}x)
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from retrieval_augmented_generation_rag_data_pipeline_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
OFFSET = 100_000_000

# table -> columns shifted by copy_index * OFFSET
SHIFT_KEYS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMENSIONS = {"region", "nation"}


def replicate_table(spark, name: str, n: int, outdir: str) -> int:
    # raw parquet read on purpose: the replica must carry the same
    # physical types as the source (load_events normalization happens
    # at query time, same as for the driver's own scale dirs)
    df = spark.read.parquet(f"{SRC}/{name}.parquet")
    if name in DIMENSIONS:
        out = df
    else:
        copies = []
        for i in range(n):
            c = df
            for col in SHIFT_KEYS[name]:
                c = c.withColumn(col, F.col(col) + F.lit(i * OFFSET))
            if name == "documents":
                # per-copy text prefix: cross-copy pairs are real
                # non-dups, so dedup output scales linearly (see module
                # docstring)
                c = c.withColumn(
                    "text", F.concat(F.lit(f"c{i} "), F.col("text"))
                ).withColumn("n_chars", F.col("n_chars") + F.lit(len(f"c{i} ")))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
    out.write.mode("overwrite").parquet(f"{outdir}/{name}.parquet")
    return spark.read.parquet(f"{outdir}/{name}.parquet").count()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sf_replica_{n}x"
    spark = get_spark("make_scale_replica")
    for name in SHIFT_KEYS:
        rows = replicate_table(spark, name, n, outdir)
        print(f"{name}: {rows} rows")

    # Scale-appropriate SemDeDup quantizer (round-12 verdict item 2):
    # SemDeDup's contract is cells ~ corpus (the paper: 50k cells / 5B
    # embeddings; ~250 vectors per cell here), and the dedup_semantic
    # gate prefers <dir>/quantizer.json over the frozen gate-scale
    # artifact — so a replica bench run pairs within right-sized cells
    # instead of pushing Nx the vectors through sf0.01-sized ones (the
    # quadratic 32s sf1 reading this replaces). Same train/freeze/apply
    # seam as tools/train_quantizer.py, trained on the replica itself.
    import json

    from retrieval_augmented_generation_rag_data_pipeline_spark.operators.vectors import (
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{outdir}/embeddings.parquet")
    n_vec = emb.count()
    n_cells = max(8, n_vec // 250)
    cents = train_ivf_centroids(emb, n_cells=n_cells, seed=42)
    art = {
        "trained_on": outdir,
        "dim": len(cents[0]),
        "n_cells": n_cells,
        "seed": 42,
        "centroids": cents,
    }
    pathlib.Path(f"{outdir}/quantizer.json").write_text(json.dumps(art))
    print(f"quantizer: {n_cells} cells over {n_vec} vectors")
    print(f"wrote {outdir}")


if __name__ == "__main__":
    main()
