"""Hostile-embedding robustness sweep (the vector-side twin of
test_hostile_corpus): NULL vectors, zero-norm vectors, NaN/Inf
components, and duplicate vectors through the similarity/dedup vector
operators — each must complete and exclude undefined-cosine rows per
its documented contract, never throw or let a NaN outrank real
neighbors."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def hostile_vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, None),                                # NULL vector
        (5, [0.0, 0.0, 0.0, 0.0]),                # zero norm
        (6, [float("nan"), 1.0, 0.0, 0.0]),       # NaN component
        (7, [float("inf"), 0.0, 0.0, 0.0]),       # Inf component
        (8, [1.0, 0.0, 0.0, 0.0]),                # exact dup of 1
        (9, [-1.0, 0.0, 0.0, 0.0]),
        (10, [0.5, 0.5, 0.5, 0.5]),
    ]
    return spark.createDataFrame(rows,
                                 "vec_id int, embedding array<double>")


CLEAN = {1, 2, 3, 8, 9, 10}  # rows with a defined, finite cosine


def test_cosine_topk_both_backends_exclude_undefined(hostile_vecs):
    from sparvi_spark.operators.similarity import cosine_topk

    q = hostile_vecs.where(F.col("vec_id").isin(1, 3, 4, 5, 6))
    for backend in ("fold", "gram"):
        got = cosine_topk(hostile_vecs, q, k=5, backend=backend).collect()
        assert got, backend
        # no undefined-cosine row ever ranks, as query or neighbor
        assert all(r["neighbor_id"] in CLEAN for r in got), backend
        assert all(math.isfinite(r["cosine"]) for r in got), backend
        qids = {r["query_id"] for r in got}
        assert 4 not in qids and 6 not in qids, backend
        # exact duplicate of query 1 ranks first (cosine 1.0)
        top1 = min((r for r in got if r["query_id"] == 1),
                   key=lambda r: r["rank"])
        assert top1["neighbor_id"] == 8 and top1["cosine"] == 1.0, backend


def test_embedding_neardup_and_semantic_dedup_complete(hostile_vecs):
    from sparvi_spark.operators.dedup import (
        embedding_neardup_pairs,
        semantic_dedup,
    )

    pairs = embedding_neardup_pairs(hostile_vecs, "vec_id", "embedding",
                                    threshold=0.9).collect()
    ids = {x for r in pairs for x in (r["id_a"], r["id_b"])}
    assert ids <= CLEAN and (1, 8) in {(r["id_a"], r["id_b"])
                                       for r in pairs}
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    kept = semantic_dedup(hostile_vecs, "vec_id", "embedding",
                          threshold=0.95, centroids=cents).collect()
    kept_ids = {r["vec_id"] for r in kept}
    assert 1 in kept_ids and 8 not in kept_ids  # dup dropped, min id kept


def test_trained_ivf_paths_complete(hostile_vecs):
    from sparvi_spark.operators.similarity import (
        ivf_topk_trained,
        kmeans_train_sampled,
    )

    clean = hostile_vecs.where(F.col("vec_id").isin(*CLEAN))
    cents = kmeans_train_sampled(clean, k=2, sample_size=16, iters=3)
    got = ivf_topk_trained(hostile_vecs, clean.where("vec_id in (1, 3)"),
                           cents, k=3, nprobe=2).collect()
    assert got
    assert all(r["neighbor_id"] in CLEAN for r in got)
    assert all(math.isfinite(r["cosine"]) for r in got)
