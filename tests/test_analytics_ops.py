"""Round-5 analytics batch: profile, skyline, heavy hitters, EMA,
weighted sampling, PageRank, perceptual-hash image near-dup — each vs a
naive-Python or brute-force ground truth."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hnsw_vector_db_spark.operators.corpus import SAMPLE_GRAIN, weighted_sample
from hnsw_vector_db_spark.operators.events import ema_smooth
from hnsw_vector_db_spark.operators.graph import bipartite_edges, pagerank
from hnsw_vector_db_spark.operators.multimodal import (
    perturb_images,
    phash_features,
    phash_near_dup,
    synthesize_media,
)
from hnsw_vector_db_spark.operators.relational import _local_skyline, skyline
from hnsw_vector_db_spark.operators.stats import profile_columns
from hnsw_vector_db_spark.operators.text_analysis import heavy_hitters
from hnsw_vector_db_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


# -- profile_columns -------------------------------------------------------


def test_profile_columns_exact(spark):
    df = spark.createDataFrame(
        [
            (1.0, "a"),
            (2.5, "b"),
            (None, "a"),
            (2.5, None),
        ],
        "x double, s string",
    )
    rows = {r["col_name"]: r for r in profile_columns(df, ["x"], ["s"]).collect()}
    x = rows["x"]
    assert (x["n_rows"], x["n_nulls"], x["n_distinct"]) == (4, 1, 2)
    assert (x["min_num"], x["max_num"]) == (1.0, 2.5)
    assert x["min_str"] is None and x["max_str"] is None
    s = rows["s"]
    assert (s["n_rows"], s["n_nulls"], s["n_distinct"]) == (4, 1, 2)
    assert (s["min_str"], s["max_str"]) == ("a", "b")
    assert s["min_num"] is None


def test_profile_columns_approx_tier(spark):
    """approx=True swaps the cardinality term for HLL++ but keeps every
    other statistic identical — and on small exact cardinalities the
    HLL estimate is exact, so the whole row matches the exact tier."""
    df = spark.createDataFrame(
        [(float(i % 7), str(i % 5)) for i in range(200)] + [(None, None)],
        "x double, s string",
    )
    exact = {r["col_name"]: r for r in profile_columns(df, ["x"], ["s"]).collect()}
    approx = {
        r["col_name"]: r
        for r in profile_columns(df, ["x"], ["s"], approx=True).collect()
    }
    for c in ("x", "s"):
        e, a = exact[c], approx[c]
        assert (a["n_rows"], a["n_nulls"]) == (e["n_rows"], e["n_nulls"])
        assert (a["min_num"], a["max_num"]) == (e["min_num"], e["max_num"])
        assert (a["min_str"], a["max_str"]) == (e["min_str"], e["max_str"])
        # rsd=0.02 on single-digit true cardinality: HLL is exact
        assert a["n_distinct"] == e["n_distinct"]


def test_profile_approx_plan_has_no_distinct_expand(spark):
    """The approx tier must aggregate HLL sketches map-side — the plan
    may not contain the exact tier's per-distinct-value Expand/shuffle
    (the one term that grows with cardinality at 100 TB)."""
    def exchanges_on_value(plan: str) -> list[str]:
        # the cardinality-sized exchange keys on (col_name, v) — any
        # hashpartitioning carrying the melted value column v#NNN
        return [
            ln
            for ln in plan.splitlines()
            if "Exchange hashpartitioning" in ln and " v#" in ln
        ]

    df = spark.createDataFrame([(1.0, "a")], "x double, s string")
    plan = (
        profile_columns(df, ["x"], ["s"], approx=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    exact_plan = (
        profile_columns(df, ["x"], ["s"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # HLL sketches fold map-side before the shuffle
    assert "partial_approx_count_distinct" in plan
    # sanity: the exact tier really does shuffle one row per (col, value)
    assert exchanges_on_value(exact_plan)
    # ...and the approx tier must not
    assert not exchanges_on_value(plan)


def test_profile_columns_needs_columns(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        profile_columns(df, [], [])


# -- skyline ---------------------------------------------------------------


def _brute_skyline(mat: np.ndarray) -> set[int]:
    """All-minimize Pareto front by the O(n^2) definition."""
    keep = set()
    for i in range(len(mat)):
        dominated = False
        for j in range(len(mat)):
            if i == j:
                continue
            if (mat[j] <= mat[i]).all() and (mat[j] < mat[i]).any():
                dominated = True
                break
        if not dominated:
            keep.add(i)
    return keep


def test_local_skyline_matches_brute():
    rng = np.random.default_rng(7)
    for d in (1, 2, 3):
        mat = rng.integers(0, 12, size=(80, d)).astype(float)
        got = set(_local_skyline(mat).tolist())
        assert got == _brute_skyline(mat)


def test_skyline_distributed_matches_brute(spark):
    rng = np.random.default_rng(11)
    rows = [
        (i, float(x), float(y), float(z))
        for i, (x, y, z) in enumerate(rng.integers(0, 15, size=(200, 3)))
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double, z double").repartition(7)
    got = {r["id"] for r in skyline(df, minimize=["x", "y"], maximize=["z"]).collect()}
    mat = np.array([[x, y, -z] for _, x, y, z in rows])
    want = {rows[i][0] for i in _brute_skyline(mat)}
    assert got == want


def test_skyline_keeps_all_dim_ties(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 1.0, 1.0), (3, 2.0, 2.0)], "id long, x double, y double"
    )
    got = {r["id"] for r in skyline(df, minimize=["x", "y"]).collect()}
    assert got == {1, 2}


def test_skyline_drops_null_dims(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 0.5)], "id long, x double"
    )
    got = {r["id"] for r in skyline(df, minimize=["x"]).collect()}
    assert got == {3}


# -- heavy_hitters ---------------------------------------------------------


def test_heavy_hitters_exact_under_decrements(spark):
    # Zipf-ish corpus; capacity far below the vocabulary so the
    # Misra-Gries decrement path actually runs, yet top-5 stays exact
    # (their counts are way above N/capacity).
    words = []
    for i in range(40):
        words += [f"hot{i}"] * (200 - 4 * i)
    for i in range(400):
        words += [f"cold{i}"] * 2
    rng = np.random.default_rng(3)
    rng.shuffle(words)
    chunk = len(words) // 50
    docs = spark.createDataFrame(
        [(i, " ".join(words[i * chunk:(i + 1) * chunk])) for i in range(50)],
        "doc_id long, text string",
    ).repartition(5)
    got = [(r["term"], r["cnt"]) for r in heavy_hitters(docs, k=5, capacity=64).collect()]
    from collections import Counter

    placed = Counter(words[: 50 * chunk])
    want = sorted(placed.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == want


def test_heavy_hitters_tiebreak(spark):
    docs = spark.createDataFrame(
        [(0, "b b a a c")], "doc_id long, text string"
    )
    got = [r["term"] for r in heavy_hitters(docs, k=2, capacity=16).collect()]
    assert got == ["a", "b"]  # count desc, term asc


# -- ema_smooth ------------------------------------------------------------


def test_ema_matches_python_fold(spark):
    import datetime as dt

    rng = np.random.default_rng(5)
    rows = [
        (i, int(i % 3), dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), float(v))
        for i, v in enumerate(rng.uniform(0, 100, 60))
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    got = {r["event_id"]: r["ema"] for r in ema_smooth(ev, alpha=0.3).collect()}
    # python reference, same literal order
    by_user: dict[int, list] = {}
    for i, u, ts, v in sorted(rows, key=lambda r: (r[2], r[0])):
        prev = by_user.get(u)
        ema = v if prev is None else 0.3 * v + (1.0 - 0.3) * prev
        by_user[u] = ema
        assert got[i] == ema  # bit-exact: identical fold order


# -- weighted_sample -------------------------------------------------------


def test_weighted_sample_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, 10 + (i * 37) % 400) for i in range(300)], "doc_id long, n_chars long"
    )
    got = [r["doc_id"] for r in weighted_sample(docs, k=25).collect()]

    def poly(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * 131 + ord(ch)) % 2147483647
        return h

    keys = []
    for i in range(300):
        w = 10 + (i * 37) % 400
        u = (poly(f"{i}#wsample1") % SAMPLE_GRAIN + 0.5) / float(SAMPLE_GRAIN)
        keys.append((math.log(u) / w, -i))
    want = [-i for _, i in sorted(keys, reverse=True)[:25]]
    assert got == want


def test_weighted_sample_excludes_nonpositive_weight(spark):
    docs = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 10)], "doc_id long, n_chars long"
    )
    got = [r["doc_id"] for r in weighted_sample(docs, k=10).collect()]
    assert got == [3]


# -- pagerank --------------------------------------------------------------


def test_pagerank_matches_numpy(spark):
    edges_py = [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1), (3, 0), (0, 3)]
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=4).collect()}
    nodes = sorted({n for e in edges_py for n in e})
    outdeg = {n: sum(1 for s, _ in edges_py if s == n) for n in nodes}
    rank = {n: 1.0 / len(nodes) for n in nodes}
    for _ in range(4):
        contrib = {n: 0.0 for n in nodes}
        for s, d in edges_py:
            contrib[d] += rank[s] / outdeg[s]
        rank = {n: 0.15 / len(nodes) + 0.85 * contrib[n] for n in nodes}
    for n in nodes:
        assert got[n] == pytest.approx(rank[n], abs=1e-12)


def test_pagerank_mass_conservation_no_dangling(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pr = pagerank(bipartite_edges(od, li), iterations=2)
    total = pr.agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-9)  # symmetric graph: no leak


def test_pagerank_rejects_negative_iterations(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(edges, iterations=-1)


# -- perceptual hash -------------------------------------------------------


@pytest.fixture(scope="module")
def small_media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(90)
    return synthesize_media(docs).filter(
        F.col("modality").startswith("image")
    ).cache()


def test_phash_planted_twins_are_close(small_media):
    twins = perturb_images(small_media, id_offset=100_000, delta=1)
    hashes = phash_features(small_media.unionByName(twins))
    h = {r["doc_id"]: r["phash"] for r in hashes.collect()}
    planted = [(i, i + 100_000) for i in h if i < 100_000 and i + 100_000 in h]
    assert len(planted) >= 20
    close = [
        (a, b) for a, b in planted if bin((h[a] ^ h[b]) & (2**64 - 1)).count("1") <= 6
    ]
    # a 1-step pixel nudge moves few aHash bits
    assert len(close) >= 0.8 * len(planted)


def test_phash_near_dup_complete_vs_brute(small_media):
    twins = perturb_images(small_media, id_offset=100_000, delta=1)
    hashes = phash_features(small_media.unionByName(twins)).cache()
    h = {r["doc_id"]: r["phash"] for r in hashes.collect()}
    ids = sorted(h)
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin((h[a] ^ h[b]) & (2**64 - 1)).count("1") <= 6
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in phash_near_dup(hashes, max_hamming=6).collect()
    }
    assert got == want  # pigeonhole banding is complete AND exact


# -- bloom runtime filter --------------------------------------------------


def test_bloom_semi_join_exact(spark):
    from hnsw_vector_db_spark.operators.relational import bloom_semi_join

    fact = spark.createDataFrame(
        [(i, i % 97) for i in range(2000)], "row_id long, k long"
    )
    dim = spark.createDataFrame([(j * 3,) for j in range(20)], "dk long")
    got = {r["row_id"] for r in bloom_semi_join(fact, dim, "k", "dk").collect()}
    want = {
        r["row_id"]
        for r in fact.join(
            dim.selectExpr("dk as k"), "k", "left_semi"
        ).collect()
    }
    assert got == want


def test_bloom_false_positives_are_removed_but_pruning_happens(spark):
    from hnsw_vector_db_spark.operators.relational import (
        bloom_build,
        bloom_contains,
        bloom_semi_join,
    )

    fact = spark.createDataFrame(
        [(i, i) for i in range(5000)], "row_id long, k long"
    )
    dim = spark.createDataFrame([(j * 50,) for j in range(100)], "dk long")
    # deliberately undersized filter => false positives guaranteed
    bits, k = 256, 2
    words = bloom_build(dim, "dk", num_bits=bits, num_hashes=k)
    passed = fact.filter(bloom_contains(words, "k", num_bits=bits, num_hashes=k)).count()
    matched = fact.join(dim.selectExpr("dk as k"), "k", "left_semi").count()
    assert matched == 100
    assert passed > matched  # FPs exist at this load...
    assert passed < 5000     # ...but the filter still prunes
    got = bloom_semi_join(fact, dim, "k", "dk", num_bits=bits, num_hashes=k).count()
    assert got == matched    # ...and the closing semi-join removes every FP


def test_bloom_probe_runs_before_the_shuffle(spark):
    from hnsw_vector_db_spark.operators.relational import bloom_semi_join
    from hnsw_vector_db_spark.plans.explain import physical_plan

    fact = spark.createDataFrame([(i, i % 7) for i in range(100)], "row_id long, k long")
    dim = spark.createDataFrame([(3,), (5,)], "dk long")
    plan = physical_plan(bloom_semi_join(fact, dim, "k", "dk"))
    # the probe (xxhash64 filter) must sit BELOW the join's exchange —
    # i.e. later in the top-down printout — so pruned rows never shuffle
    assert "xxhash64" in plan
    assert plan.index("xxhash64") > plan.index("Exchange")


def test_bloom_build_validates_num_bits(spark):
    from hnsw_vector_db_spark.operators.relational import bloom_build

    dim = spark.createDataFrame([(1,)], "dk long")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bloom_build(dim, "dk", num_bits=100)


# -- incremental aggregate state -------------------------------------------


def test_merge_agg_states_equals_full(spark):
    from hnsw_vector_db_spark.operators.relational import agg_state, merge_agg_states

    rng = np.random.default_rng(13)
    rows = [(int(i % 5), float(v)) for i, v in enumerate(rng.uniform(-50, 50, 600))]
    full = spark.createDataFrame(rows, "k long, v double")
    parts = [
        spark.createDataFrame(rows[i::3], "k long, v double") for i in range(3)
    ]
    merged = {
        r["k"]: r
        for r in merge_agg_states(*[agg_state(p, "k", "v") for p in parts]).collect()
    }
    want = {r["k"]: r for r in agg_state(full, "k", "v").collect()}
    assert set(merged) == set(want)
    for k in want:
        assert merged[k]["cnt"] == want[k]["cnt"]
        assert merged[k]["vmin"] == want[k]["vmin"]
        assert merged[k]["vmax"] == want[k]["vmax"]
        assert merged[k]["vsum"] == pytest.approx(want[k]["vsum"], rel=1e-12)


def test_merge_agg_states_associative(spark):
    from hnsw_vector_db_spark.operators.relational import agg_state, merge_agg_states

    mk = lambda rows: agg_state(  # noqa: E731
        spark.createDataFrame(rows, "k long, v double"), "k", "v"
    )
    a, b, c = mk([(1, 2.0), (2, 3.0)]), mk([(1, 7.0)]), mk([(2, -1.0), (3, 5.0)])
    left = {r["k"]: r for r in merge_agg_states(merge_agg_states(a, b), c).collect()}
    right = {r["k"]: r for r in merge_agg_states(a, merge_agg_states(b, c)).collect()}
    assert {k: (v["cnt"], v["vsum"], v["vmin"], v["vmax"]) for k, v in left.items()} == {
        k: (v["cnt"], v["vsum"], v["vmin"], v["vmax"]) for k, v in right.items()
    }


def test_merge_agg_states_requires_input():
    from hnsw_vector_db_spark.operators.relational import merge_agg_states

    with pytest.raises(ValueError):
        merge_agg_states()


# -- quantile_scale --------------------------------------------------------


def test_quantile_scale_matches_python(spark):
    from hnsw_vector_db_spark.operators.relational import quantile_scale

    rng = np.random.default_rng(17)
    rows = [(i, "g" + str(i % 2), float(v)) for i, v in enumerate(rng.uniform(0, 10, 40))]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    got = {r["id"]: r for r in quantile_scale(df, "g", "v", ["id"]).collect()}
    import statistics

    for gname in ("g0", "g1"):
        vals = [(v, i) for i, g, v in rows if g == gname]
        xs = [v for v, _ in vals]
        mu, sd, lo, hi = statistics.mean(xs), statistics.stdev(xs), min(xs), max(xs)
        order = sorted(vals)
        n = len(order)
        for rank, (v, i) in enumerate(order):
            r = got[i]
            assert r["zscore"] == pytest.approx((v - mu) / sd, abs=1e-6)
            assert r["minmax"] == pytest.approx((v - lo) / (hi - lo), abs=1e-6)
            # ntile: first (n % 4) tiles get ceil(n/4) rows
            q, rem = divmod(n, 4)
            boundary = [(q + 1) * t if t <= rem else rem * (q + 1) + (t - rem) * q for t in range(5)]
            tile = next(t for t in range(1, 5) if rank < boundary[t])
            assert r["tile"] == tile


def test_quantile_scale_degenerate_group(spark):
    from hnsw_vector_db_spark.operators.relational import quantile_scale

    df = spark.createDataFrame(
        [(1, "g", 5.0), (2, "g", 5.0)], "id long, g string, v double"
    )
    rows = {r["id"]: r for r in quantile_scale(df, "g", "v", ["id"]).collect()}
    assert rows[1]["zscore"] == 0.0 and rows[1]["minmax"] == 0.5


# -- window_chunks UDTF ----------------------------------------------------


def test_window_chunks_matches_python(spark):
    from hnsw_vector_db_spark.operators.text_analysis import window_chunks

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g"),      # 7 words, w=3 s=2 -> 4 chunks
            (1, "x y z"),               # exactly one full window + tail
            (2, ""),                    # empty -> no rows
            (3, None),                  # null -> no rows
            (4, "p q r s t u"),         # exact multiple of stride
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk"], r["n_words"])
        for r in window_chunks(docs, width=3, stride=2).collect()
    }
    want = {}
    for did, text in [(0, "a b c d e f g"), (1, "x y z"), (4, "p q r s t u")]:
        words = text.split()
        for idx, start in enumerate(range(0, len(words), 2)):
            piece = words[start:start + 3]
            want[(did, idx)] = (" ".join(piece), len(piece))
    assert got == want


def test_window_chunks_validates_params(spark):
    from hnsw_vector_db_spark.operators.text_analysis import window_chunk_udtf

    with pytest.raises(ValueError):
        window_chunk_udtf(0, 2)
    with pytest.raises(ValueError):
        window_chunk_udtf(3, 0)


# -- evaluation: nDCG@k, precision/recall@k --------------------------------


def _hand_ndcg(ranked_rels, all_rels, k):
    import math

    dcg = sum(
        (2**r - 1) / math.log2(i + 2) for i, r in enumerate(ranked_rels[:k])
    )
    ideal = sorted(all_rels, reverse=True)[:k]
    idcg = sum((2**r - 1) / math.log2(i + 2) for i, r in enumerate(ideal))
    return dcg / idcg if idcg > 0 else 0.0


def test_ndcg_matches_hand_computation(spark):
    from hnsw_vector_db_spark.operators.evaluation import ndcg_at_k

    ranking = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank int"
    )
    relevance = spark.createDataFrame(
        [(10, 1), (11, 3), (13, 2)], "doc_id long, rel int"  # 12 ungraded -> 0
    )
    rows = ndcg_at_k(ranking, relevance, k=3).collect()
    assert len(rows) == 3
    want = _hand_ndcg([1, 3, 0], [1, 3, 2, 0], 3)
    assert rows[0]["ndcg"] == pytest.approx(want, abs=1e-12)


def test_ndcg_perfect_ranking_is_one(spark):
    from hnsw_vector_db_spark.operators.evaluation import ndcg_at_k

    relevance = spark.createDataFrame(
        [(i, 5 - i) for i in range(5)], "doc_id long, rel int"
    )
    perfect = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "doc_id long, rank int"
    )
    row = ndcg_at_k(perfect, relevance, k=5).collect()[0]
    assert row["ndcg"] == pytest.approx(1.0, abs=1e-12)
    reversed_ = spark.createDataFrame(
        [(i, 5 - i) for i in range(5)], "doc_id long, rank int"
    )
    worse = ndcg_at_k(reversed_, relevance, k=5).collect()[0]["ndcg"]
    assert worse < 1.0


def test_precision_recall_at_k(spark):
    from hnsw_vector_db_spark.operators.evaluation import precision_recall_at_k

    ranking = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "doc_id long, rank int"
    )
    relevant = spark.createDataFrame(
        [(0,), (1,), (2,), (50,), (51,)], "doc_id long"
    )
    row = precision_recall_at_k(ranking, relevant, k=10).collect()[0]
    assert row["hits"] == 3
    assert row["precision"] == pytest.approx(0.3)
    assert row["recall"] == pytest.approx(3 / 5)


def test_dedup_eval_counts_planted_truth_exactly(spark):
    """Hand-built corpus: doc 0/1 are near-dups (planted pair, Jaccard
    above threshold), doc 2/3 share nothing. Planted pairs: (0,1) true,
    (2,3) false (Jaccard 0). recall counts only the true pair; the
    false plant shrinks n_truth, not recall; precision stays 1.0."""
    from hnsw_vector_db_spark.operators.evaluation import dedup_eval

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base + " today"),
            (2, "completely different words about spark physics"),
            (3, "nothing shared here at all in any way whatsoever"),
        ],
        "doc_id long, text string",
    )
    planted = spark.createDataFrame(
        [(0, 1), (2, 3)], "doc_a long, doc_b long"
    )
    row = dedup_eval(
        docs, planted, k=16, bands=8, n=3, threshold=0.5
    ).collect()[0]
    assert row["n_planted"] == 2
    assert row["n_truth"] == 1          # (2,3) has Jaccard 0
    assert row["n_hit"] == 1
    assert row["recall"] == 1.0
    assert row["precision"] == 1.0
    assert row["recall_ok"]
    assert row["n_extra"] == row["n_found"] - row["n_found_planted"]


def test_dedup_eval_collapse_invariance(spark):
    """The tier-0 exact collapse (r8 bench_scale defect fix: 241x wall
    at 64x on a repeated-text replica) must not CHANGE the eval: a
    corpus where every text appears d times, with the planted pair
    replicated across copies, yields the identical row to the
    single-copy corpus — copies collapse to min-id reps, the mapped
    planted pairs dedup to one, and the pipeline sees each text once."""
    from hnsw_vector_db_spark.operators.evaluation import dedup_eval

    base = "the quick brown fox jumps over the lazy dog again and again"
    uniq = [
        (0, base),
        (1, base + " today"),
        (2, "completely different words about spark physics"),
    ]
    d = 8
    copies = [
        (i + 100 * (r + 1), t) for i, t in uniq for r in range(d - 1)
    ]
    docs1 = spark.createDataFrame(uniq, "doc_id long, text string")
    docsd = spark.createDataFrame(
        uniq + copies, "doc_id long, text string"
    )
    planted1 = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
    # plant the pair once per copy generation — all must map to (0, 1)
    plantedd = spark.createDataFrame(
        [(0, 1)] + [(100 * (r + 1), 1 + 100 * (r + 1)) for r in range(d - 1)],
        "doc_a long, doc_b long",
    )
    r1 = dedup_eval(docs1, planted1, k=16, bands=8, n=3, threshold=0.5)
    rd = dedup_eval(docsd, plantedd, k=16, bands=8, n=3, threshold=0.5)
    assert r1.collect() == rd.collect()


def test_eval_validates_k(spark):
    from hnsw_vector_db_spark.operators.evaluation import (
        ndcg_at_k,
        precision_recall_at_k,
    )

    df = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
    with pytest.raises(ValueError):
        ndcg_at_k(df, df, k=0)
    with pytest.raises(ValueError):
        precision_recall_at_k(df, df, k=0)


# -- triangle counting -------------------------------------------------------

def test_triangle_count_known_graph(spark):
    """K4 plus a pendant vertex: each K4 node is in C(3,2)=3 triangles,
    the pendant in none (and so absent from the output)."""
    from hnsw_vector_db_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = spark.createDataFrame(k4 + [(3, 9)], "u long, v long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_count_matches_brute_force(spark):
    """Degree-oriented counts == brute-force enumeration on the real
    co-supply graph (dedupes reversed/duplicate input edges too)."""
    from itertools import combinations

    from hnsw_vector_db_spark.operators.graph import (
        co_supply_edges,
        triangle_count,
    )

    li = load_table(spark, SF, "lineitem")
    edges = co_supply_edges(li)
    pairs = {(r["u"], r["v"]) for r in edges.collect()}
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    brute = {n: 0 for n in adj}
    for n, nbrs in adj.items():
        for x, y in combinations(sorted(nbrs), 2):
            if y in adj.get(x, ()):  # noqa: SIM118 - set membership
                brute[n] += 1
    brute = {n: c for n, c in brute.items() if c}
    got = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert got == brute
    # feeding both directions of every edge must not change anything
    rev = edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    got2 = {r["node"]: r["n_triangles"]
            for r in triangle_count(edges.unionByName(rev)).collect()}
    assert got2 == brute


# ---- salted_join -----------------------------------------------------------

def test_salted_join_equals_plain_join(spark):
    from pyspark.sql import Row

    from hnsw_vector_db_spark.operators.relational import salted_join

    facts = spark.createDataFrame(
        [Row(k="a", v=i) for i in range(50)]
        + [Row(k="b", v=i) for i in range(3)]
        + [Row(k="c", v=99)]  # no dim row -> dropped by inner join
    )
    dim = spark.createDataFrame([Row(k="a", w=1.0), Row(k="b", w=2.0)])
    got = sorted(map(tuple, salted_join(facts, dim, "k", n_salt=4).collect()))
    want = sorted(map(tuple, facts.join(dim, "k").collect()))
    assert got == want  # the salt routes, never changes the result
    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(facts, dim, "k", n_salt=0)


def test_salted_join_rejects_dim_preserving_modes(spark):
    """right/full/outer would null-extend each UNMATCHED dim row n_salt
    times (r6 ADVICE) — must raise, not silently duplicate."""
    from pyspark.sql import Row

    import pytest as _pytest

    from hnsw_vector_db_spark.operators.relational import salted_join

    facts = spark.createDataFrame([Row(k="a", v=1)])
    dim = spark.createDataFrame([Row(k="a", w=1.0), Row(k="z", w=9.0)])
    for how in ("right", "rightouter", "full", "outer", "full_outer"):
        with _pytest.raises(ValueError, match="dim-preserving"):
            salted_join(facts, dim, "k", n_salt=4, how=how)
    # fact-preserving modes stay allowed and exact
    got = sorted(
        map(tuple, salted_join(facts, dim, "k", n_salt=4, how="left").collect())
    )
    want = sorted(map(tuple, facts.join(dim, "k", "left").collect()))
    assert got == want


def test_salted_join_accepts_bare_semi_anti_aliases(spark):
    """Spark's JoinType parser accepts bare 'semi'/'anti' for
    left_semi/left_anti; both are fact-preserving so the guard must
    allow them (r7 ADVICE)."""
    from pyspark.sql import Row

    from hnsw_vector_db_spark.operators.relational import salted_join

    facts = spark.createDataFrame([Row(k="a", v=1), Row(k="b", v=2)])
    dim = spark.createDataFrame([Row(k="a", w=1.0)])
    semi = sorted(
        map(tuple, salted_join(facts, dim, "k", n_salt=4, how="semi").collect())
    )
    assert semi == sorted(map(tuple, facts.join(dim, "k", "semi").collect()))
    anti = sorted(
        map(tuple, salted_join(facts, dim, "k", n_salt=4, how="anti").collect())
    )
    assert anti == sorted(map(tuple, facts.join(dim, "k", "anti").collect()))


# ---- integrity audit -------------------------------------------------------

def test_integrity_report_finds_planted_orphans(spark):
    from pyspark.sql import Row

    from hnsw_vector_db_spark.operators.stats import fk_orphans, integrity_report

    parent = spark.createDataFrame([Row(pk=1), Row(pk=2)])
    child = spark.createDataFrame(
        [Row(fk=1), Row(fk=1), Row(fk=2), Row(fk=9), Row(fk=None)]
    )
    orphans = fk_orphans(child, parent, "fk", "pk").collect()
    assert sorted(r["fk"] for r in orphans if r["fk"] is not None) == [9]
    assert sum(1 for r in orphans if r["fk"] is None) == 1  # null fk = orphan
    rep = integrity_report([("r", child, "fk", parent, "pk")]).collect()
    assert rep[0]["n_child"] == 5 and rep[0]["n_orphans"] == 2
    assert rep[0]["n_null_fk"] == 1 and not rep[0]["ok"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        integrity_report([])


# ---- label propagation -----------------------------------------------------

def test_label_propagation_two_cliques_converge(spark):
    from pyspark.sql import Row

    from hnsw_vector_db_spark.operators.graph import label_propagation

    # two triangles bridged by nothing: each converges to its min label
    edges = spark.createDataFrame(
        [Row(u=1, v=2), Row(u=2, v=3), Row(u=1, v=3),
         Row(u=10, v=11), Row(u=11, v=12), Row(u=10, v=12)]
    )
    out = {r["node"]: r["label"]
           for r in label_propagation(edges, iterations=3).collect()}
    assert {out[1], out[2], out[3]} == {1}
    assert {out[10], out[11], out[12]} == {10}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        label_propagation(edges, iterations=0)


def test_label_propagation_is_deterministic(spark):
    from pyspark.sql import Row

    from hnsw_vector_db_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [Row(u=i, v=(i * 7) % 23 + 30) for i in range(1, 20)]
    )
    a = sorted(map(tuple, label_propagation(edges, 3).collect()))
    b = sorted(map(tuple, label_propagation(edges, 3).collect()))
    assert a == b


# ---- corpus_report (r7 curation dashboard) ----------------------------------

def test_corpus_report_hand_fixture(spark):
    """Planted fixture: source A has one exact-dup pair and one English
    doc of three; source B is all-unique all-en."""
    from hnsw_vector_db_spark.operators.stats import corpus_report

    rows = [
        (0, "the same text here ok", "en", "A"),
        (1, "the same text here ok", "de", "A"),   # exact dup of 0
        (2, "completely different words", "en", "A"),
        (3, "unique one", "en", "B"),
        (4, "unique two", "en", "B"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {r["source"]: r.asDict() for r in corpus_report(df).collect()}
    assert got["A"]["n_docs"] == 3 and got["A"]["n_exact_dups"] == 1
    assert got["A"]["n_en"] == 2
    assert got["B"]["n_docs"] == 2 and got["B"]["n_exact_dups"] == 0
    assert got["B"]["pct_en"] == 1.0
    assert 0.0 <= got["A"]["avg_quality"] <= 1.0


# ---------------------------------------------------------------------------
# ann_tune: operating-point sweep + selection
# ---------------------------------------------------------------------------

def test_ann_tune_sweep_and_selection(spark, sf_dir):
    from hnsw_vector_db_spark.operators.evaluation import ann_tune
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    handles = []
    rows = (
        ann_tune(emb, queries, n_cells=8, nprobes=(1, 4, 8), k=10,
                 target_recall=0.5, cache_handles=handles)
        .orderBy("nprobe")
        .collect()
    )
    for h in handles:
        h.unpersist()
    assert [r["nprobe"] for r in rows] == [1, 4, 8]
    # probed-cell prefixes are supersets -> recall and candidate count
    # are non-decreasing in nprobe; nprobe = n_cells scans everything
    recalls = [r["recall"] for r in rows]
    assert recalls == sorted(recalls)
    cands = [r["n_candidates"] for r in rows]
    assert cands == sorted(cands)
    assert rows[-1]["recall"] == 1.0  # all cells probed == exact
    # chosen = the CHEAPEST point meeting target, exactly one
    meeting = [r for r in rows if r["meets_target"]]
    chosen = [r for r in rows if r["chosen"]]
    assert len(chosen) == 1
    assert chosen[0]["nprobe"] == min(r["nprobe"] for r in meeting)


def test_ann_tune_no_point_meets_target(spark, sf_dir):
    from hnsw_vector_db_spark.operators.evaluation import ann_tune
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    rows = ann_tune(
        emb, queries, n_cells=8, nprobes=(1, 2), k=10, target_recall=0.99
    ).collect()
    # honest empty selection, never a silent best-effort pick
    assert all(not r["chosen"] for r in rows)


def test_ann_tune_validates_grid(spark, sf_dir):
    import pytest as _pytest

    from hnsw_vector_db_spark.operators.evaluation import ann_tune
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.limit(1).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    with _pytest.raises(ValueError, match="nprobes"):
        ann_tune(emb, q, n_cells=8, nprobes=(0, 4))
    with _pytest.raises(ValueError, match="nprobes"):
        ann_tune(emb, q, n_cells=8, nprobes=(16,))
