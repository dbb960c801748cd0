#!/usr/bin/env python
"""Coverage, relevance, and authority over one embedding corpus — the
r8 session-3 tiers composed end-to-end:

1. **Stratified coreset**: JL-project 64→8 dims (seeded ±1 matrix, no
   artifact), cluster the cheap space with the integer-exact k-means,
   then greedy k-center INSIDE each cluster — k diverse representatives
   per region of the space (annotation budgets, eval-set picking).
2. **MMR rerank**: the 8 rows most relevant to a query vector but
   mutually non-redundant (λ = 1/2 as an exact integer rational).
3. **PQ index**: fit 8×8-code product-quantization codebooks, encode
   the corpus to 8 small codes, answer the same query with the ADC
   table scan, and compose IVF routing on top (cells → partition
   pruning at scale).
4. **Authority**: integer-exact PageRank over a near-dup pair graph
   picks each mirror set's canonical document (centrality_survivors).
5. **Trainer handoff**: stride-interleave two sources at 2:1 (exact
   recipe proportions in every stream prefix) and cut token-balanced
   shards.

Every step is deterministic and integer-exact, so a re-run — or the
DuckDB battery oracles — reproduces identical picks, codes, ranks, and
shard ids.

Run: python examples/diversity_ranking_tour.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mongo_arrow_spark.operators import clustering, dedup, diversity, packing
from mongo_arrow_spark.operators import selection, similarity
from mongo_arrow_spark.session import get_spark, load_tables


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("diversity_ranking_tour", shuffle_partitions=8)
    t = load_tables(spark, sf_dir)
    emb, docs = t["embeddings"], t["documents"]

    # 1. stratified coreset: project -> cluster -> per-cluster k-center
    proj = clustering.random_projection(emb, out_dim=8, seed="tour", dim=64)
    km = clustering.kmeans_fit(proj, k=4, iters=2, vec_col="proj", scale=1)
    cells = clustering.kmeans_assign(proj, km, vec_col="proj")
    coreset = diversity.kcenter_select(
        cells, 3, vec_col="proj", group_col="cluster", scale=1
    )
    picks = coreset.collect()
    print(f"coreset: {len(picks)} rows across "
          f"{len({r['cluster'] for r in picks})} clusters")
    assert all(r["sel_rank"] <= 3 for r in picks)

    # 2. MMR rerank against the md5-min row's vector
    qrow = emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id").first()
    query = list(qrow["embedding"])
    mmr = diversity.mmr_select(emb, 8, query_vec=query).collect()
    print("mmr picks:", [r["vec_id"] for r in sorted(mmr, key=lambda r: r["sel_rank"])])

    # 3. PQ index + ADC query, then IVF-routed variant
    pq = similarity.fit_pq(emb, m=8, codes=8, iters=1, dim=64)
    encoded = similarity.pq_encode(emb, pq)
    adc = similarity.pq_topk(encoded, pq, query, k=5).collect()
    routed = similarity.ivf_pq_topk(
        emb, pq, query, k=5, n_clusters=4, n_probe=4
    ).collect()
    assert [tuple(r) for r in adc] == [tuple(r) for r in routed]
    print("pq top-5:", [(r["vec_id"], r["pq_dist"]) for r in adc])

    # 4. authority: canonical docs by centrality over near-dup pairs
    # (a deterministic id-filtered sample — LIMIT without ORDER BY may
    # resolve differently across jobs on a multi-partition source)
    sample = docs.filter(F.col("doc_id") < 200)
    pairs = dedup.banded_jaccard_pairs(sample, threshold=0.2)
    kept = dedup.centrality_survivors(sample, pairs)
    print(f"centrality survivors: {kept.count()} of {sample.count()}")

    # 5. trainer handoff: interleave two sources 2:1, shard by tokens
    two = docs.filter(F.col("source").isin("src0", "src1"))
    order = selection.interleave_sources(two, {"src0": 2, "src1": 1})
    sharded = packing.assign_token_shards(
        order, 2000, order_by=[F.col("train_order").asc()]
    )
    stats = (
        sharded.groupBy("shard")
        .agg(F.count("*").alias("docs"), F.sum("n_tokens").alias("tokens"))
        .orderBy("shard")
        .collect()
    )
    print("shards:", [(r["shard"], r["docs"], r["tokens"]) for r in stats])
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
