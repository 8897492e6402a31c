"""End-to-end corpus pipeline over a generated corpus: the operators
composed the way a training-data run composes them, with the invariant at
every stage asserted — the 'works as a system' capstone on top of the
per-operator oracles.

Corpus: synthdocs (deterministic, 20% planted exact duplicates via
dup_every=5) plus synthesized NEAR-duplicates (every 7th doc re-emitted
with one appended token under a shifted id) — so exact dedup, LSH
near-dup detection, clustering, canonical selection, leakage-safe
splitting, and packing all have real work to do and known ground truth.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from team_126_spark.operators import dedup as D
from team_126_spark.operators import relational as R
from team_126_spark.operators import textops as TO
from team_126_spark.sources.synth import register

N_DOCS = 4000
DUP_EVERY = 5
NEAR_STRIDE = 7
NEAR_OFFSET = 1_000_000


@pytest.fixture(scope="module")
def corpus(spark):
    register(spark)
    base = (
        spark.read.format("synthdocs")
        .options(rows=str(N_DOCS), partitions="8", seed="11", dup_every=str(DUP_EVERY))
        .load()
    )
    near = (
        base.filter(F.col("doc_id") % NEAR_STRIDE == 0)
        .select(
            (F.col("doc_id") + NEAR_OFFSET).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra")).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + 6).alias("n_chars"),
        )
    )
    return base.unionByName(near).cache()


def test_full_batch_pipeline_invariants(spark, corpus):
    n_total = corpus.count()
    assert n_total == N_DOCS + (N_DOCS + NEAR_STRIDE - 1) // NEAR_STRIDE

    # 1. exact dedup: planted copies collapse; survivors = distinct texts
    groups = D.exact_dedup(corpus, "text", "doc_id")
    n_distinct = groups.count()
    assert n_distinct == corpus.select("text").distinct().count()
    assert n_distinct < n_total  # the planted copies actually collapsed
    canon = corpus.join(
        groups.select(F.col("canonical_id").alias("doc_id")), "doc_id", "left_semi"
    ).cache()
    assert canon.count() == n_distinct

    # 2. near-dup pairs on the exact-deduped corpus: every planted
    # (base, base+offset) pair whose base survived must be found — the
    # one-token edit keeps Jaccard far above threshold
    pairs = (
        D.minhash_lsh_pairs(canon, "text", "doc_id", k=3, bands=16, threshold=0.5)
        .select("id_a", "id_b")
        .cache()
    )
    planted = (
        canon.filter(F.col("doc_id") < NEAR_OFFSET)
        .filter(F.col("doc_id") % NEAR_STRIDE == 0)
        .join(
            canon.filter(F.col("doc_id") >= NEAR_OFFSET)
            .select((F.col("doc_id") - NEAR_OFFSET).alias("doc_id")),
            "doc_id",
            "left_semi",
        )
        .select("doc_id")
    )
    found_base = pairs.select(
        F.least("id_a", F.col("id_b") % NEAR_OFFSET).alias("doc_id")
    ).distinct()
    missed = planted.join(found_base, "doc_id", "left_anti").count()
    assert missed == 0, f"{missed} planted near-dup pairs not recovered by LSH"

    # 3. connected components label every paired doc; representatives self-label
    comp = D.dedup_components(pairs, "id_a", "id_b").cache()
    labels = {r["id"]: r["cluster_id"] for r in comp.collect()}
    assert all(labels[c] == c for c in set(labels.values()))

    # 4. canonical selection: one survivor per cluster, unpaired docs untouched
    clustered = canon.join(comp, canon["doc_id"] == comp["id"], "left").select(
        "doc_id", "text", "source", F.coalesce("cluster_id", "doc_id").alias("cluster")
    )
    survivors = R.latest_per_group(
        clustered.withColumn("prio", F.col("doc_id")), ["cluster"], "prio", "doc_id"
    ).cache()
    n_clusters = clustered.select("cluster").distinct().count()
    assert survivors.count() == n_clusters
    # no surviving pair is still a near-dup of each other
    leftover = (
        pairs.join(survivors.select(F.col("doc_id").alias("id_a")), "id_a", "left_semi")
        .join(survivors.select(F.col("doc_id").alias("id_b")), "id_b", "left_semi")
        .count()
    )
    assert leftover == 0

    # 5. leakage-safe split: hash the CLUSTER, so near-dups can't straddle
    split = TO.hash_split(
        clustered.select(F.col("cluster").alias("doc_id")).distinct(), "doc_id"
    ).select(F.col("doc_id").alias("cluster"), "split")
    straddle = (
        pairs.join(comp, pairs["id_a"] == comp["id"])
        .select("id_a", "id_b", "cluster_id")
        .join(split, F.col("cluster_id") == F.col("cluster"))
        .select("id_a", "id_b", "split")
        .distinct()
        .groupBy("id_a", "id_b")
        .agg(F.count_distinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddle == 0

    # 6. packing conserves tokens over the final corpus
    final = survivors.select("doc_id", "text")
    packed = TO.pack_sequences(final, "text", "doc_id", budget=256)
    total_in = final.select(
        F.sum(F.size(F.split(F.trim(F.regexp_replace("text", r"\s+", " ")), " ")))
    ).first()[0]
    total_out = packed.select(F.sum("n_tokens")).first()[0]
    assert total_in == total_out

    # 7. expectations gate on the shipped corpus: all checks clean
    checks = R.expect_checks(
        final,
        {
            "nonempty_text": F.length("text") > 0,
            "id_present": F.col("doc_id").isNotNull(),
        },
        fail_on_violation=True,
    ).first()
    assert checks["nonempty_text"] == 0 and checks["id_present"] == 0
