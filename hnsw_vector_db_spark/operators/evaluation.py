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


def dedup_eval(
    docs: DataFrame,
    planted_pairs: DataFrame,
    k: int = 16,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    collapse_exact: bool = True,
) -> DataFrame:
    """Evaluation-as-operator for the near-dup tier (the ndcg_eval
    pattern applied to dedup): measure what
    :func:`~.dedup.minhash_lsh_near_dup` actually achieves against a
    KNOWN ground truth of ``planted_pairs`` ((doc_a, doc_b) rows whose
    documents are near-duplicates by construction).

    Ground truth is COMPUTED, not assumed: a planted pair counts as
    true only if its exact n-gram Jaccard clears ``threshold``
    (:func:`~.dedup.jaccard_pairs` with the planted pairs as the
    candidate set — a pairwise join on the planted list, never
    all-pairs). The measured quantities:

      - ``recall`` = found ∩ truth / truth — the banding miss rate,
        THE number an LSH configuration trades away (r rows per band:
        P(candidate) = 1-(1-J^r)^bands);
      - ``precision`` = found ∩ truth / found-planted — provably 1.0
        because the pipeline exact-verifies every candidate; the eval
        PINS that guarantee rather than assuming it;
      - ``n_extra`` — found pairs outside the planted set (natural
        near-dups in the corpus; informational, not errors).

    All counts are exact integers (planted pairs are deterministic), so
    the whole row is oracle-checkable. One row:
    (threshold, n_planted, n_truth, n_found, n_found_planted, n_hit,
    n_extra, recall, precision, recall_ok).

    ``collapse_exact`` (default True) runs the tier-0 exact collapse
    before the LSH pipeline — the production configuration (see
    :func:`~.dedup.exact_groups`): the corpus shrinks to one min-id
    representative per identical text and planted pairs map through the
    representatives (self-pairs dropped, mapped pairs deduped). Without
    it, a corpus with d exact copies per text pays C(d, 2) banded
    candidate pairs per text group for zero information — the r8
    bench_scale run measured the uncollapsed form at **241x wall for
    64x data** on the repeated-text replica (1,004 s vs 16 s collapsed);
    evaluating the collapsed pipeline is both the honest configuration
    and the one that survives scale.

    Output contract under ``collapse_exact=True`` (changed default as
    of r8): ``n_planted``/``n_truth`` count POST-collapse mapped pairs
    (representative-to-representative, self-pairs dropped, duplicates
    merged), not the raw planted list — callers comparing against a
    pre-collapse pair count must map through the representatives the
    same way. NULL-text caveat: the collapse routes docs through
    ``exact_groups``/``exact_dedup``, whose min/max collision-witness
    filter evaluates to NULL for NULL text, so NULL-text rows are
    silently DROPPED from the evaluated corpus — a divergence from a
    plain ``PARTITION BY text`` replay, which groups NULLs together.
    Coalesce text to ``''`` upstream if NULL rows must participate."""
    from hnsw_vector_db_spark.operators.dedup import (
        exact_dedup,
        exact_groups,
        jaccard_pairs,
        minhash_lsh_near_dup,
    )

    pp = planted_pairs.select(
        F.col("doc_a").cast("long"), F.col("doc_b").cast("long")
    )
    if collapse_exact:
        mapping = exact_groups(docs, text_col=text_col, id_col=id_col)
        ra = mapping.select(
            F.col(id_col).alias("doc_a"), F.col("rep_id").alias("_ra")
        )
        rb = mapping.select(
            F.col(id_col).alias("doc_b"), F.col("rep_id").alias("_rb")
        )
        pp = (
            pp.join(ra, "doc_a")
            .join(rb, "doc_b")
            .filter(F.col("_ra") != F.col("_rb"))
            .select(
                F.least("_ra", "_rb").alias("doc_a"),
                F.greatest("_ra", "_rb").alias("doc_b"),
            )
            .distinct()
        )
        docs = exact_dedup(docs, text_col=text_col, id_col=id_col)
    # r13 (guide §1.2/§5): the truth stage, the LSH signature stage and
    # the LSH verify stage all consume the SAME per-doc shingle sets over
    # the same (collapsed) corpus — previously three independent
    # tokenize+shingle passes. Materialize once, share everywhere; the
    # localCheckpoint also truncates what was a ~2 s plan-analysis tree.
    from hnsw_vector_db_spark.operators.dedup import _doc_shingle_sets

    sets = _doc_shingle_sets(docs, n, text_col, id_col).localCheckpoint()
    truth = jaccard_pairs(
        docs, n, threshold, text_col, id_col, candidates=pp, sets=sets
    ).select("doc_a", "doc_b")
    found = minhash_lsh_near_dup(
        docs, k=k, bands=bands, n=n, threshold=threshold,
        text_col=text_col, id_col=id_col, sets=sets,
    ).select("doc_a", "doc_b")
    # ONE pass over the found stream: annotate membership with two left
    # joins (planted and truth are bounded by the plant size — broadcast
    # at runtime), fold every count in a single aggregate. The LSH
    # pipeline is the expensive fork; never evaluate it three times.
    ann = found.join(
        pp.withColumn("_p", F.lit(True)), ["doc_a", "doc_b"], "left"
    ).join(truth.withColumn("_t", F.lit(True)), ["doc_a", "doc_b"], "left")
    fc = ann.agg(
        F.count(F.lit(1)).alias("n_found"),
        F.sum(F.when(F.col("_p"), 1).otherwise(0)).alias("n_found_planted"),
        F.sum(
            F.when(F.col("_p") & F.col("_t"), 1).otherwise(0)
        ).alias("n_hit"),
    )
    n_planted = pp.agg(F.count(F.lit(1)).alias("n_planted"))
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    row = fc.crossJoin(n_planted).crossJoin(n_truth)  # 1-row scalar joins
    return row.select(
        (F.lit(threshold) + F.lit(0.0)).alias("threshold"),
        "n_planted",
        "n_truth",
        "n_found",
        "n_found_planted",
        "n_hit",
        (F.col("n_found") - F.col("n_found_planted")).alias("n_extra"),
        (F.round(F.col("n_hit") / F.col("n_truth"), 6) + F.lit(0.0)).alias(
            "recall"
        ),
        (
            F.round(F.col("n_hit") / F.col("n_found_planted"), 6)
            + F.lit(0.0)
        ).alias("precision"),
        (F.col("n_hit") / F.col("n_truth") >= 0.9).alias("recall_ok"),
    )


def ann_tune(
    vectors: DataFrame,
    queries: DataFrame,
    n_cells: int = 8,
    nprobes: "tuple[int, ...]" = (1, 2, 4, 8),
    k: int = 10,
    target_recall: float = 0.9,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    cache_handles: "list | None" = None,
) -> DataFrame:
    """ANN operating-point TUNER (evaluation-as-operator, the dedup_eval
    pattern applied to the recall/cost knob): sweep ``nprobes`` over the
    seed-centroid IVF index against exact ground truth on a query
    sample, and SELECT the cheapest point meeting ``target_recall`` —
    the inverse of the question the recall entries answer (they pin one
    operating point; a curator asks which point to pin). The
    reference's ef knob (`core/hnsw/graph.py:175-181`) is exactly this
    trade-off with no measurement attached.

    Per sweep point: recall@k over the whole sample, the CANDIDATE
    count (the true scan cost an operating point buys — probed_frac
    says 2/8 of cells, n_candidates says how many vectors that was),
    ``meets_target``, and ``chosen`` = cheapest nprobe meeting target
    (all false when none does — the honest answer that the index needs
    more cells or a wider grid, never a silent best-effort pick).

    Deterministic end to end: seed centroids (ivf_fit_seeded), argmin
    routing with id tiebreaks, fixed query sample — so every recall is
    an exact integer ratio and the full sweep + selection is
    oracle-replayable (unlike HNSW's beam, whose ef analog stays a
    rows-only entry: hnsw_ef_sweep).

    Scale shape: the index assignment is computed once and reused by
    every sweep point (persisted; pass ``cache_handles`` to unpersist);
    per point the cost is one cell-pruned scan + one k-row window per
    query — the evaluation costs what ~sum(nprobes)/n_cells of serving
    costs, nothing quadratic. Output one row per nprobe:
    (nprobe, n_candidates, n_hits, recall, probed_frac, meets_target,
    chosen).
    """
    from hnsw_vector_db_spark.functions.distance import distance
    from hnsw_vector_db_spark.operators.knn import knn_batch
    from hnsw_vector_db_spark.operators.similarity import ivf_fit_seeded

    if not nprobes or any(p < 1 or p > n_cells for p in nprobes):
        raise ValueError(
            f"nprobes must be within [1, n_cells={n_cells}], got {nprobes}"
        )
    spark = vectors.sparkSession
    assigned, centroids = ivf_fit_seeded(
        vectors, n_cells=n_cells, id_col=id_col, vector_col=vector_col
    )
    assigned = assigned.persist()
    if cache_handles is not None:
        cache_handles.append(assigned)
    n_queries = queries.count()  # bounded: queries are a sample
    # r12 (guide §5): every sweep point left-semi-joins against the
    # exact ground truth, and the union of sweep branches shares the
    # SUBTREE, not the result — unpersisted, the full exact kNN re-ran
    # once per nprobe. Persist it like the assignment (it is tiny:
    # n_queries * k rows); released through the same cache_handles
    # lifecycle below.
    exact = knn_batch(
        queries, vectors, k=k, metric=metric,
        id_col=id_col, vector_col=vector_col,
    ).select(query_id_col, id_col).persist()
    if cache_handles is not None:
        cache_handles.append(exact)
    seeds = spark.createDataFrame(
        [(i, [float(x) for x in centroids[i]]) for i in range(len(centroids))],
        "seed_id int, seed_vec array<double>",
    )
    qd = distance(F.col("seed_vec"), F.col(query_vec_col), metric)
    worder = Window.partitionBy(query_id_col).orderBy("_qd", "seed_id")
    qorder = (
        queries.crossJoin(F.broadcast(seeds))
        .select(query_id_col, query_vec_col, "seed_id", qd.alias("_qd"))
        .select(
            query_id_col,
            query_vec_col,
            F.col("seed_id").alias("cell"),
            F.row_number().over(worder).alias("cell_rank"),
        )
    )
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("_d").asc(), F.col(id_col).asc()
    )
    parts = []
    for npb in nprobes:
        probe = qorder.filter(F.col("cell_rank") <= npb).select(
            query_id_col, query_vec_col, "cell"
        )
        cand = assigned.join(F.broadcast(probe), "cell")
        n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        top = (
            cand.select(
                F.col(query_id_col),
                F.col(id_col),
                distance(
                    F.col(vector_col), F.col(query_vec_col), metric
                ).alias("_d"),
            )
            .withColumn("rank", F.row_number().over(wq))
            .filter(F.col("rank") <= k)
        )
        hits = top.join(
            exact, [query_id_col, id_col], "left_semi"
        ).agg(F.count(F.lit(1)).alias("n_hits"))
        parts.append(
            hits.crossJoin(F.broadcast(n_cand)).select(
                F.lit(npb).alias("nprobe"), "n_candidates", "n_hits"
            )
        )
    from functools import reduce

    rows = reduce(lambda a, b: a.unionByName(b), parts)
    wall = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    recall = F.round(F.col("n_hits") / F.lit(float(n_queries * k)), 6) + F.lit(0.0)
    meets = F.col("recall") >= F.lit(target_recall)
    result = (
        rows.select(
            "nprobe",
            "n_candidates",
            "n_hits",
            recall.alias("recall"),
            (
                F.round(F.col("nprobe") / F.lit(float(n_cells)), 6)
                + F.lit(0.0)
            ).alias("probed_frac"),
        )
        .withColumn("meets_target", meets)
        .withColumn(
            "chosen",
            F.coalesce(
                F.col("meets_target")
                & (
                    F.col("nprobe")
                    == F.min(
                        F.when(F.col("meets_target"), F.col("nprobe"))
                    ).over(wall)
                ),
                F.lit(False),
            ),
        )
    )
    if cache_handles is None:
        # no handle to hand the persist back through: materialize the
        # (len(nprobes)-row) sweep now and release the assignment cache
        # here, so repeated calls in a long-lived session don't leak
        # persisted DataFrames (localCheckpoint is eager by default)
        result = result.localCheckpoint()
        assigned.unpersist()
        exact.unpersist()
    return result
