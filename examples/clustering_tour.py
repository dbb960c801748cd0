#!/usr/bin/env python
"""Deterministic embedding clustering, end to end (r8 sixth wave):

1. **Fit** quantized k-means on the embeddings table — integer-exact
   Lloyd steps, so the model (and everything built on it) reproduces
   bit-for-bit across re-runs, partitionings, and engines.
2. **Persist** the model as a parquet artifact (params in schema
   metadata) and reload it — the fit-once/assign-many split every
   standing corpus needs.
3. **Assign** cluster ids with a map-only projection (the k×d centroid
   table compiles into the plan as literals — no join, no shuffle; the
   same expression runs unchanged inside a readStream).
4. **SemDeDup** (Abbas et al. 2023) over the k-means cells: semantic
   near-dup pruning compares pairs only within a cell, so the blow-up
   is bounded by the largest cluster.
5. **Cluster-balanced corpus**: cap per-cell document counts so no
   embedding region dominates the training mix (the embedding-space
   analog of RefinedWeb's per-domain cap).

Run: python examples/clustering_tour.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mongo_arrow_spark.operators import selection
from mongo_arrow_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
    load_kmeans,
    save_kmeans,
)
from mongo_arrow_spark.operators.dedup import semantic_dedup
from mongo_arrow_spark.session import get_spark, load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("clustering-tour", shuffle_partitions=8)
    t = load_tables(spark, sf_dir)
    emb, docs = t["embeddings"], t["documents"]

    # 1-2. fit once, persist, reload
    model = kmeans_fit(emb, k=8, iters=2)
    path = os.path.join(tempfile.mkdtemp(prefix="kmeans_"), "model")
    save_kmeans(spark, model, path)
    model = load_kmeans(spark, path)
    print(f"model: k={model.k} dim={model.dim} (artifact at {path})")

    # 3. assign — map-only projection
    assigned = kmeans_assign(emb, model)
    assigned.groupBy("cluster").count().orderBy("cluster").show()

    # 4. SemDeDup within cells
    survivors = semantic_dedup(emb, threshold=0.3, kmeans_model=model)
    print(f"semdedup: {emb.count()} -> {survivors.count()} embeddings")

    # 5. cluster-balanced selection: join cluster ids onto documents,
    # cap per cell (longest-first, deterministic tie-break)
    clustered_docs = docs.join(
        assigned.select(F.col("vec_id").alias("doc_id"), "cluster"), "doc_id"
    )
    balanced = selection.cap_per_group(
        clustered_docs,
        "cluster",
        n=30,
        order_by=[F.length("text").desc(), F.col("doc_id").asc()],
        id_col="doc_id",
    )
    balanced.groupBy("cluster").count().orderBy("cluster").show()
    print(f"balanced corpus: {balanced.count()} docs (<=30 per cell)")
    spark.stop()


if __name__ == "__main__":
    main()
