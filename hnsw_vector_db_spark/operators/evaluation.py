"""Retrieval-quality evaluation operators: nDCG@k, precision/recall@k.

The reference serves searches but never measures their quality (no
recall harness anywhere — SURVEY.md §5). An engine whose approximate
paths (LSH/IVF/PQ/HNSW) trade recall for speed needs evaluation as a
first-class operator, not a notebook afterthought: rank a query's
results, grade them against a relevance table, and emit the standard IR
metrics — all inside the engine, so the evaluation itself scales to a
query LOG, not one query.

Scale shape: the ranking side is top-k (tiny) by construction; the
relevance side may be corpus-sized, but DCG touches it through a k-row
join and IDCG through orderBy().limit(k) (TakeOrderedAndProject — the
bounded heap, never a full sort). Everything is a Column expression —
no UDFs, fully codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ndcg_at_k(
    ranking: DataFrame,
    relevance: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """nDCG@k of ``ranking`` (id, rank 1..n) against graded ``relevance``
    (id, rel >= 0; ids absent from the table grade 0).

    gain(d) = (2^rel - 1) / log2(rank + 1); DCG sums the ranking's top
    k gains; IDCG sums the k best relevances in ideal order (ties
    contribute the same sum regardless of order, so the deterministic
    id tiebreak is cosmetic). Output: one row per ranked position
    (rank, id, rel, gain) with the summary (dcg, idcg, ndcg) repeated —
    flat rows so an independent engine can replay every term.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ranked = ranking.filter(F.col(rank_col) <= k)
    graded = (
        ranked.join(relevance, id_col, "left")
        .withColumn(rel_col, F.coalesce(F.col(rel_col), F.lit(0)))
        .withColumn(
            "gain",
            (F.pow(F.lit(2.0), F.col(rel_col)) - 1.0)
            / F.log2(F.col(rank_col) + F.lit(1.0)),
        )
    )
    dcg = graded.agg(F.sum("gain").alias("dcg"))
    # IDCG: the k best relevances in ideal positions — TakeOrdered, then
    # a k-row window for the ideal ranks
    ideal = (
        relevance.orderBy(F.col(rel_col).desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn(
            "irnk",
            F.row_number().over(
                Window.orderBy(F.col(rel_col).desc(), F.col(id_col).asc())
            ),
        )
    )
    idcg = ideal.agg(
        F.sum(
            (F.pow(F.lit(2.0), F.col(rel_col)) - 1.0)
            / F.log2(F.col("irnk") + F.lit(1.0))
        ).alias("idcg")
    )
    summary = dcg.join(F.broadcast(idcg)).select(
        "dcg",
        "idcg",
        F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
        .otherwise(F.lit(0.0))
        .alias("ndcg"),
    )
    return graded.select(rank_col, id_col, rel_col, "gain").join(
        F.broadcast(summary)
    )


def precision_recall_at_k(
    ranking: DataFrame,
    relevant: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Precision@k and recall@k of ``ranking`` against a binary
    ``relevant`` id set. One row: (k, hits, n_relevant, precision,
    recall). The relevant side may be large — it is touched by one
    k-row semi-join and one count aggregate."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ranked = ranking.filter(F.col(rank_col) <= k)
    hits = ranked.join(relevant.select(id_col), id_col, "left_semi").agg(
        F.count(F.lit(1)).alias("hits")
    )
    n_rel = relevant.agg(F.countDistinct(id_col).alias("n_relevant"))
    return (
        hits.join(F.broadcast(n_rel))
        .select(
            F.lit(k).alias("k"),
            "hits",
            "n_relevant",
            (F.col("hits") / F.lit(float(k))).alias("precision"),
            F.when(
                F.col("n_relevant") > 0, F.col("hits") / F.col("n_relevant")
            ).otherwise(F.lit(0.0)).alias("recall"),
        )
    )
