"""Physical-plan shape locks for the driver-contract queries: filters
pushed to the scan, column pruning, broadcast joins on small sides,
TakeOrderedAndProject for top-k, no accidental cartesian products.

The reference has no optimizer (SURVEY.md §4) — for this engine the
optimizer IS the execution story, so plan shape is contract, not
implementation detail: these properties are exactly what keeps the same
code viable at 100 TB."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from pyspark.sql import functions as F
from hnsw_vector_db_spark.plans.explain import (
    assert_no_cartesian,
    broadcast_join_count,
    has_take_ordered,
    physical_plan,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return entry_mod.queries()


def test_knn_point_is_take_ordered(spark, qs):
    # orderBy+limit must plan as the bounded-heap physical op, the analog
    # of the reference's ef-bounded heap (core/hnsw/graph.py:120-124)
    assert has_take_ordered(qs["knn_cosine"](spark, SF))


def test_dim_join_broadcasts(spark, qs):
    # metadata enrichment = broadcast hash join, never a shuffle join
    assert broadcast_join_count(qs["knn_metadata"](spark, SF)) >= 1
    assert broadcast_join_count(qs["top_orders"](spark, SF)) >= 1
    assert broadcast_join_count(qs["customer_cube"](spark, SF)) >= 1


def test_no_cartesian_anywhere(spark, qs):
    for name in (
        "similarity_join",
        "jaccard_pairs",
        "minhash_lsh_neardup",
        "simhash_neardup",
        "embedding_neardup",
        "range_join",
        "asof_join",
    ):
        assert_no_cartesian(qs[name](spark, SF))


def test_scan_prunes_columns(spark, qs):
    # pricing_summary reads 600k-row lineitem: the scan must NOT read all
    # 16 columns for a 7-column aggregate
    plan = physical_plan(qs["pricing_summary"](spark, SF))
    scan = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln)
    assert "l_comment" not in scan and "l_partkey" not in scan


def test_filter_pushdown_reaches_scan(spark, qs):
    # another test module may have .cache()d this table, which swaps the
    # parquet scan for InMemoryTableScan and hides PushedFilters
    spark.catalog.clearCache()
    plan = physical_plan(qs["knn_batch"](spark, SF))
    assert "PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,5)" in plan


def test_dedup_pair_joins_are_hash_joins(spark, qs):
    # candidate generation must be equi-joins on derived keys (shingle /
    # band bucket / simhash chunk), never a nested-loop pair scan
    for name in ("minhash_lsh_neardup", "simhash_neardup"):
        plan = physical_plan(qs[name](spark, SF))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


def test_embedding_neardup_lsh_path_no_nested_loop(spark):
    """The at-scale default for embedding near-dup must be a bucket
    equi-join — never the brute BroadcastNestedLoopJoin pair scan."""
    from hnsw_vector_db_spark.operators.dedup import embedding_neardup
    from hnsw_vector_db_spark.sources.parquet import load_table

    emb = load_table(spark, SF, "embeddings")
    out = embedding_neardup(emb, threshold=0.3, method="lsh", n_planes=6)
    plan = physical_plan(out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_group_topk_rank_pushes_below_exchange(spark, qs):
    """row_number()<=k must plan WindowGroupLimit BELOW the exchange: map
    tasks pre-prune to local top-k per key before shuffling."""
    plan = physical_plan(qs["top_orders_per_cust"](spark, SF))
    lines = plan.splitlines()
    wgl = [i for i, ln in enumerate(lines) if "WindowGroupLimit" in ln]
    exch = [i for i, ln in enumerate(lines) if "Exchange" in ln]
    assert wgl and exch
    assert max(wgl) > min(exch), plan  # a WindowGroupLimit sits below the shuffle


def test_not_exists_plans_as_anti_join(spark, qs):
    # NOT EXISTS must decorrelate to one hash anti-join — never a per-row
    # subquery and never a nested loop
    plan = physical_plan(qs["customers_no_orders"](spark, SF))
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert_no_cartesian(qs["customers_no_orders"](spark, SF))


def test_tpch_q21_semi_and_anti_plan_as_joins(spark, qs):
    """Q21's two self-correlations on lineitem must both plan as real
    joins — one LeftSemi, one LeftAnti, the anti applied AFTER the semi
    (plan order is inside-out: the semi join node sits under the anti
    node) — never a per-row subquery, nested loop, or cartesian."""
    df = qs["tpch_q21"](spark, SF)
    plan = physical_plan(df)
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert_no_cartesian(df)
    # anti-after-semi: in the formatted plan tree the LAST-applied join
    # appears first (outermost); the anti must be applied to the semi's
    # output, so its node id is smaller (earlier in the dump)
    anti_pos = plan.index("LeftAnti")
    semi_pos = plan.index("LeftSemi")
    assert anti_pos < semi_pos, "anti join must consume the semi's output"
    # the report-side dim joins broadcast
    assert broadcast_join_count(df) >= 2


def test_tpch_q18_having_semi_before_wide_joins(spark, qs):
    """Q18's HAVING-sum subquery must collapse lineitem to qualifying
    orderkeys and semi-join BEFORE the customer/orders joins — a
    LeftSemi with a partial-aggregate input, no nested loop."""
    df = qs["tpch_q18"](spark, SF)
    plan = physical_plan(df)
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert_no_cartesian(df)
    assert has_take_ordered(df)  # the top-100 cut is a bounded heap


def test_tpch_q2_correlated_min_decorrelates(spark, qs):
    """Q2's correlated min subquery must decorrelate to a per-partkey
    aggregate + equi-join — never a per-row subquery execution or a
    nested loop."""
    df = qs["tpch_q2"](spark, SF)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert_no_cartesian(df)
    # the decorrelated min shows up as an extra aggregate over ps
    assert plan.count("HashAggregate") >= 2
    assert has_take_ordered(df)


def test_tpch_q20_nested_semi_decorrelates(spark, qs):
    """Q20: the outer IN must plan as a real LeftSemi join and the inner
    correlated SUM must decorrelate to a grouped aggregate + join —
    never a per-row subquery or nested loop."""
    df = qs["tpch_q20"](spark, SF)
    plan = physical_plan(df)
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert_no_cartesian(df)
    # ps aggregate + the decorrelated windowed aggregate
    assert plan.count("HashAggregate") >= 2


def test_tpch_q20_fast_single_lineitem_scan(spark, qs):
    """The conditional-aggregation twin reads lineitem ONCE (the
    decorrelated original reads it twice) and still semi-joins."""
    df = qs["tpch_q20_fast"](spark, SF)
    plan = physical_plan(df)
    assert plan.count("FileScan parquet") == 4  # lineitem+part+supplier+nation
    assert "LeftSemi" in plan
    assert_no_cartesian(df)
    fast = sorted(map(tuple, df.collect()))
    slow = sorted(map(tuple, qs["tpch_q20"](spark, SF).collect()))
    assert fast == slow and len(fast) > 0


def test_tpch_q2_fast_single_lineitem_scan(spark, qs):
    """The production twin must read lineitem ONCE (the correlated form
    pays a second full aggregate — Spark doesn't materialize CTEs) and
    push the rank=1 cut map-side via WindowGroupLimit."""
    df = qs["tpch_q2_fast"](spark, SF)
    plan = physical_plan(df)
    assert plan.count("FileScan parquet") == 3  # lineitem + part + supplier
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert_no_cartesian(df)
    assert has_take_ordered(df)


def test_tpch_q17_correlated_avg_decorrelates(spark, qs):
    """Q17's correlated AVG over the same fact table must decorrelate
    to a per-partkey grouped AVG + equi-join with the quantity cut as
    the join residual — never a per-row re-scan or nested loop."""
    df = qs["tpch_q17"](spark, SF)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert_no_cartesian(df)
    # outer agg + the decorrelated per-partkey AVG (partial+final pairs)
    assert plan.count("HashAggregate") >= 2
    # the decorrelated form still pays two lineitem scans — the honest
    # cost the _fast twin removes
    assert plan.count("FileScan parquet") == 3  # lineitem x2 + part


def test_tpch_q17_fast_single_lineitem_scan(spark, qs):
    """The window twin reads lineitem ONCE and matches the correlated
    form exactly (same oracle, and pinned here row-for-row)."""
    df = qs["tpch_q17_fast"](spark, SF)
    plan = physical_plan(df)
    assert plan.count("FileScan parquet") == 2  # lineitem + part
    assert "Window" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    fast = sorted(map(tuple, df.collect()))
    slow = sorted(map(tuple, qs["tpch_q17"](spark, SF).collect()))
    assert fast == slow and len(fast) == 1


def test_tpch_q13_outer_join_stays_outer(spark, qs):
    """Q13: the non-key predicate lives in the join's ON clause, so the
    join must remain LeftOuter (a WHERE placement would let Catalyst
    convert it to inner and drop zero-order customers) and both
    aggregations must partial-combine."""
    df = qs["tpch_q13"](spark, SF)
    plan = physical_plan(df)
    assert "LeftOuter" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert_no_cartesian(df)
    assert plan.count("HashAggregate") >= 4  # two partial+final pairs
    # zero-order customers must exist in the result (c_count = 0 row) —
    # the semantic the ON-vs-WHERE placement protects
    assert any(r["c_count"] == 0 for r in df.collect())


def test_tpch_q22_anti_join_and_scalar_subquery(spark, qs):
    """Q22: the NOT EXISTS must plan as a real LeftAnti hash join and
    the global AVG as a one-row scalar subquery — never a per-row
    re-aggregation or nested loop."""
    df = qs["tpch_q22"](spark, SF)
    plan = physical_plan(df)
    assert "LeftAnti" in plan
    assert "Subquery" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert_no_cartesian(df)


def test_tpch_q19_disjunction_factors_to_hash_join(spark, qs):
    """Q19: BooleanSimplification must factor the common
    p_partkey = l_partkey equality out of the three OR'd bands so the
    join plans as a HASH join on partkey with the band disjunction as
    residual — the raw OR would be a nested-loop (quadratic) join."""
    df = qs["tpch_q19"](spark, SF)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert_no_cartesian(df)
    assert (
        "BroadcastHashJoin" in plan
        or "ShuffledHashJoin" in plan
        or "SortMergeJoin" in plan
    )


def test_tpch_q4_exists_with_correlated_residual(spark, qs):
    """Q4: the EXISTS references the outer's o_orderdate inside its
    predicate — must plan as a LeftSemi hash join on l_orderkey with
    the date inequality as the join residual, never a per-row subquery
    or nested loop."""
    df = qs["tpch_q4"](spark, SF)
    plan = physical_plan(df)
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert_no_cartesian(df)
    rows = df.collect()
    # both classes populated: qualifying orders exist but not all
    assert 0 < sum(r["order_count"] for r in rows)


def test_tpch_q15_scalar_max_subquery(spark, qs):
    """Q15: the MAX over the revenue relation must plan as a one-row
    scalar subquery (its own aggregate job), and ties at the max are
    kept — never a nested loop."""
    df = qs["tpch_q15"](spark, SF)
    plan = physical_plan(df)
    assert "Subquery" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert_no_cartesian(df)
    rows = df.collect()
    assert len(rows) >= 1
    assert len({r["total_revenue"] for r in rows}) == 1  # all at the max


def test_tpch_q16_not_in_plans_null_aware_anti_hash_join(spark, qs):
    """Q16's single-column NOT IN must plan as a NULL-AWARE anti HASH
    join (BroadcastHashJoin ... LeftAnti ... isNullAware=true) — the
    fallback for this shape is a nested loop, which is quadratic."""
    df = qs["tpch_q16"](spark, SF)
    plan = physical_plan(df)
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert_no_cartesian(df)
    import re

    # the trailing boolean on BHJ's argument list is isNullAwareAntiJoin
    assert re.search(r"BroadcastHashJoin .*LeftAnti.*true", plan)


def test_tpch_star_queries_broadcast_dims(spark, qs):
    """Q7/Q8/Q9: every dimension join broadcasts, the pair/band
    disjunctions evaluate as residuals/filters — no nested loop
    anywhere in the star."""
    for name, min_bhj in (("tpch_q7", 4), ("tpch_q8", 6), ("tpch_q9", 3)):
        df = qs[name](spark, SF)
        plan = physical_plan(df)
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert_no_cartesian(df)
        assert broadcast_join_count(df) >= min_bhj, name


def test_tpch_q11_group_vs_global_scalar(spark, qs):
    """Q11: the 0.1%-of-total threshold plans as a one-row scalar
    subquery over the ps relation — never a per-row re-aggregation."""
    df = qs["tpch_q11"](spark, SF)
    plan = physical_plan(df)
    assert "Subquery" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert_no_cartesian(df)


def test_partition_prune_filters_at_planning_time(spark, qs):
    """The hive-partitioned read must prune whole directories at
    planning time: the month filter appears as PartitionFilters on the
    scan (not a post-scan Filter), and the scan's partition count
    reflects only the two selected months."""
    df = qs["partition_prune"](spark, SF)
    plan = physical_plan(df)
    assert "PartitionFilters" in plan
    after = plan.split("PartitionFilters", 1)[1][:250]
    assert "o_month" in after, after
    rows = df.collect()
    assert [r["o_month"] for r in rows] == ["1996-03", "1996-04"]


def test_tpch_q2_fast_matches_correlated_form(spark, qs):
    """Window-rank rewrite == correlated-MIN original, row for row
    (ties at the per-part min are kept by both)."""
    fast = sorted(map(tuple, qs["tpch_q2_fast"](spark, SF).collect()))
    slow = sorted(map(tuple, qs["tpch_q2"](spark, SF).collect()))
    assert fast == slow


def test_pivot_is_single_aggregate(spark, qs):
    # pivot with explicit values = ONE aggregate pass over orders (no
    # distinct-scan for values, no union of per-status re-scans)
    plan = physical_plan(qs["orders_pivot"](spark, SF))
    assert plan.count("FileScan parquet") == 1


def test_full_outer_is_hash_join(spark, qs):
    plan = physical_plan(qs["nation_balance_fo"](spark, SF))
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan


def test_rag_search_is_take_ordered(spark, qs):
    """The end-to-end text->embed->search pipeline must still terminate
    in TakeOrderedAndProject (never a global sort) — the embedding
    construction composes underneath the same top-k physical strategy
    as plain knn."""
    assert has_take_ordered(qs["rag_search"](spark, SF))
    assert_no_cartesian(qs["hash_embed"](spark, SF))


def test_funnel_single_exchange_on_events_key(spark, qs):
    """The 3-step funnel's chained windows + per-key collapse share ONE
    Exchange on the user key (the whole point of the window
    formulation)."""
    plan = physical_plan(qs["funnel_steps"](spark, SF))
    assert plan.count("Exchange") == 1, plan


def test_cohort_retention_has_no_join(spark, qs):
    """The first-signup timestamp comes from a window over the events'
    own key partitioning — the join-back formulation measured 31x slower
    at 64x and must not regress back in."""
    plan = physical_plan(qs["cohort_retention"](spark, SF))
    assert "Join" not in plan, plan


def test_unigram_vocab_join_not_on_raw_tokens(spark, qs):
    """The vocabulary joins against per-doc TERM FREQUENCIES, not the
    raw token stream: the tf-side aggregate must sit BELOW the term join
    in the plan (the 15x fix measured at 64x)."""
    plan = physical_plan(qs["unigram_logprob"](spark, SF))
    lines = plan.splitlines()
    joins = [i for i, ln in enumerate(lines) if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln or "BroadcastHashJoin" in ln]
    aggs = [i for i, ln in enumerate(lines) if "HashAggregate" in ln]
    assert joins and aggs
    # at least one aggregate below (larger line index than) the last join
    assert max(aggs) > max(joins), plan


def test_rolling_revenue_range_frame_no_self_join(spark, qs):
    """The trailing-90-day revenue runs as ONE custkey Exchange feeding a
    RANGE-frame WindowExec — the naive inequality self-join formulation
    (O(n^2) per customer) must never appear."""
    df = qs["rolling_revenue"](spark, SF)
    plan = physical_plan(df)
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan
    assert "RangeFrame" in plan, plan


def test_rolling_revenue_known_values(spark):
    """Hand-computed RANGE frame incl. the same-day-symmetry property a
    ROWS frame would get wrong."""
    from hnsw_vector_db_spark.operators.relational import rolling_revenue

    rows = [
        (1, 101, "1992-01-01", 10.0),
        (1, 102, "1992-01-31", 20.0),   # day 30: includes 101
        (1, 103, "1992-07-01", 40.0),   # day 182: alone
        (1, 104, "1992-07-01", 5.0),    # same day: sees 103 and vice versa
        (2, 201, "1992-01-05", 7.0),
    ]
    orders = spark.createDataFrame(
        [(c, o, d + " 00:00:00", p) for c, o, d, p in rows],
        "o_custkey long, o_orderkey long, o_orderdate string, o_totalprice double",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    got = {
        r["o_orderkey"]: (r["rolling_total"], r["n_in_window"])
        for r in rolling_revenue(orders, days=90).collect()
    }
    assert got[101] == (10.0, 1)
    assert got[102] == (30.0, 2)
    assert got[103] == (45.0, 2)  # same-day symmetry: 103 sees 104
    assert got[104] == (45.0, 2)  # ...and 104 sees 103
    assert got[201] == (7.0, 1)


def test_semantic_dedup_pair_join_keyed_on_cell(spark, qs):
    """SemDeDup's within-cluster pair scan must be a hash equi-join on
    `cell` (per-cluster pairwise), and the only nested-loop join in the
    plan is the bounded argmin against the n_clusters seed rows — never
    a corpus x corpus pair scan. The cell-keyed window and the cell-keyed
    self-join should share hash partitioning (at most one exchange each
    side of the join, none re-shuffling an already-cell-keyed stream)."""
    plan = physical_plan(qs["semantic_dedup"](spark, SF))
    # the self-join on cell is a hash join...
    assert "SortMergeJoin [cell" in plan or "ShuffledHashJoin [cell" in plan or (
        "BroadcastHashJoin [cell" in plan
    ), plan
    # ...and any nested-loop node is the seed-side argmin (seeds are
    # n_clusters rows), not a corpus pair scan: corpus x corpus would
    # need TWO parquet-scan children under one BNLJ — assert the plan
    # never joins embeddings to embeddings without an equi-key
    assert "CartesianProduct" not in plan


def test_salted_join_spreads_hot_keys_no_broadcast(spark, qs):
    """salted_join must plan a ShuffledHashJoin whose keys include the
    salt (hot keys spread over n_salt tasks) — never a broadcast (which
    would make the salt pointless) and never a plain single-key
    shuffle."""
    plan = physical_plan(qs["salted_join"](spark, SF))
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan
    join_line = next(ln for ln in plan.splitlines() if "ShuffledHashJoin" in ln)
    assert "_salt" in join_line, join_line


def test_pack_best_fit_single_shard_exchange(spark):
    """The FFD packer's contract plan (PLANS.md r11): ONE shuffle keyed
    on shard feeding the lengths-only Pandas kernel — over a bare id
    stream there must be exactly one Exchange in the whole plan, and it
    must hash-partition on shard."""
    from hnsw_vector_db_spark.operators.corpus import pack_best_fit
    from hnsw_vector_db_spark.plans.explain import physical_plan

    ids_df = spark.createDataFrame(
        [(i, list(range(i % 7 + 1))) for i in range(40)],
        "doc_id long, ids array<long>",
    )
    plan = physical_plan(pack_best_fit(ids_df, seq_len=8, n_shards=4))
    assert "FlatMapGroupsInPandas" in plan
    exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "Broadcast" not in ln
    ]
    assert len(exchanges) == 1, plan
    assert "hashpartitioning(shard" in exchanges[0], exchanges[0]


def test_epoch_manifest_prunes_token_payload(spark):
    """PLANS.md r11: the manifest consumes identity columns only, so
    Catalyst must prune the pack chain's token-array assembly
    (collect_list) out of the plan entirely — the manifest never
    materializes a token array, which is WHY its per-epoch cost is flat
    in seq_len. Also: exactly two shuffles (pack window + re-deal
    window)."""
    from hnsw_vector_db_spark.operators.corpus import (
        epoch_manifest,
        pack_token_ids,
    )
    from hnsw_vector_db_spark.plans.explain import physical_plan

    ids_df = spark.createDataFrame(
        [(i, list(range(20))) for i in range(40)],
        "doc_id long, ids array<long>",
    )
    packed = pack_token_ids(ids_df, seq_len=8, n_shards=4)
    plan = physical_plan(epoch_manifest(packed, epoch=1, n_shards=4))
    assert "collect_list" not in plan, plan
    exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "Broadcast" not in ln
    ]
    assert len(exchanges) == 2, plan


def test_retraction_joins_stay_broadcast(spark):
    """PLANS.md r12: takedown lists are tiny by contract, so BOTH
    retraction modes must plan as broadcast joins over the big scans —
    a LeftSemi over the sidecar (mask mode) and a LeftAnti over the
    manifests (drop mode), with no sort-merge join anywhere: the
    retraction itself never shuffles the artifact-sized side."""
    from hnsw_vector_db_spark.operators.corpus import (
        epoch_manifests,
        pack_doc_spans,
        pack_token_ids,
        retract_manifest,
        retract_spans,
    )
    from hnsw_vector_db_spark.plans.explain import physical_plan

    ids_df = spark.createDataFrame(
        [(i, list(range(20))) for i in range(40)],
        "doc_id long, ids array<long>",
    )
    spans = pack_doc_spans(ids_df, seq_len=8, n_shards=4)
    retract = spark.createDataFrame([(3,), (17,)], "doc_id long")
    mask_plan = physical_plan(retract_spans(spans, retract))
    assert "BroadcastHashJoin" in mask_plan and "LeftSemi" in mask_plan
    assert "SortMergeJoin" not in mask_plan, mask_plan
    packed = pack_token_ids(ids_df, seq_len=8, n_shards=4)
    mans = epoch_manifests(packed, n_epochs=2, n_shards=4)
    drop_plan = physical_plan(retract_manifest(mans, spans, retract))
    assert "BroadcastHashJoin" in drop_plan and "LeftAnti" in drop_plan
    assert "SortMergeJoin" not in drop_plan, drop_plan
