#!/usr/bin/env python
"""64x scale harness: measure each query at 1x (the sf dir) and at Nx
(a disjoint-key replica of the same tables) and emit BENCH_SCALE.json.

This checks in the methodology behind BASELINE.md's 64x tables (rounds
5-8), which previously lived in ad-hoc /tmp scripts:

* **Replica layout** (`--data-dir`, default /tmp/scale64_data): every
  fact table is replicated `--mult` times with DISJOINT KEY SPACES —
  copy i offsets each key column by `i * (max_key_at_source + 1)`, and
  the offsets are applied CONSISTENTLY across tables (orders copy i
  joins customer copy i; lineitem copy i joins orders/part/supplier
  copy i), so every join's fanout per key is identical to the source.
  `nation`/`region` are dimension tables and are copied unreplicated
  (they broadcast at any scale). `documents` keeps its TEXT byte-equal
  across copies under disjoint doc_ids — the boilerplate-duplicate
  shape real crawled corpora have, which is what makes the dedup
  operators' 64x numbers honest. `embeddings` keeps vectors byte-equal
  under disjoint vec_ids. Each output is repartitioned so the replica
  has real scan parallelism (a 64x table written as one file would
  serialize the scan — the dsir single-split lesson, BASELINE.md r6).
* **Timing** (same contract as bench.py): min-of-2 runs, the timed
  action is a NOOP-SINK write (count() lets Catalyst prune every
  column expression), and `spark.catalog.clearCache()` runs before
  every timed run so operators that persist a forked intermediate are
  measured cold, not as a cache read (bench action correction #2).
* **Output**: BENCH_SCALE.json next to this script —
  {"mult": N, "queries": {name: {"wall_1x": s, "wall_Nx": s,
  "ratio": r}}} — plus one compact JSON line on stdout. "ratio" is
  wall at Nx / wall at 1x FOR Nx THE DATA: sublinear (< N) means the
  plan's scan/shuffle shape absorbs scale; ~N means the cost is
  honestly linear (e.g. full-batch classifier training); > N is a
  defect (a pair blowup, a re-evaluated fork, a single-task funnel)
  and has historically been this repo's best defect-finder
  (BASELINE.md: pagerank's unpersisted edges, dsir's single split,
  the classifier's Generate re-evaluation, minhash's explode).

Usage:
    python bench_scale.py                       # default r8 query set
    python bench_scale.py --queries a,b,c       # explicit set
    python bench_scale.py --mult 8 --rebuild    # smaller replica, fresh
Queries must be keys of __spark_entry__.queries(); each runs with
sf_dir = the source dir (1x) and sf_dir = the replica dir (Nx).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from hnsw_vector_db_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

# key columns to offset, per table. Tables not listed are copied
# verbatim (dimensions). The SAME logical entity gets the same offset
# base in every table that references it, keeping join fanout identical
# to the source: e.g. o_custkey and c_custkey both offset by
# (max c_custkey + 1), so orders copy i still finds its customers.
_KEY_GROUPS: dict[str, str] = {
    # column -> entity whose max defines the offset stride
    "c_custkey": "custkey",
    "o_custkey": "custkey",
    "o_orderkey": "orderkey",
    "l_orderkey": "orderkey",
    "l_partkey": "partkey",
    "p_partkey": "partkey",
    "l_suppkey": "suppkey",
    "s_suppkey": "suppkey",
    "event_id": "event_id",
    "user_id": "user_id",
    "doc_id": "doc_id",
    "vec_id": "vec_id",
}

_REPLICATED = [
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
_VERBATIM = ["region", "nation"]

# output partition count per replicated table: enough splits that
# local[32] (and a real cluster's executors) see parallel scans.
_OUT_PARTITIONS = 64

# planted-skew tier (r8 judge #7): the uniform replica can't see a
# skew defect — real crawls are Zipf in host, so the skew replica
# rewrites documents.source to a HOT value on 60% of rows (everything
# else byte-identical) and the skew queries are measured at Nx-uniform
# vs Nx-skew. skew_ratio ~1.0 means the claimed map-side-collapse /
# megagroup-isolation actually holds; >>1 is a hot-key funnel (the
# defect class AQE skew-join + salting exist for).
_SKEW_HOT_FRAC_MOD = (5, 3)  # doc_id % 5 < 3 -> 60% of docs share one host
_DEFAULT_SKEW_QUERIES = ["url_dedup", "boilerplate_strip", "cap_per_group"]

# default measurement set — round-8 additions. quality_classifier
# (full-batch, ~190 s at 64x) is deliberately NOT here; its sampled
# tier is, because flat-vs-corpus per-iteration cost is the claim.
_DEFAULT_QUERIES = [
    "tpch_q2_fast",
    "tpch_q20",
    "tpch_q20_fast",
    "quality_classifier_sampled",
    "stream_knn_ann",
    "dedup_eval",
    "corpus_report",
    "tpch_q17",
    "tpch_q17_fast",
    "tpch_q13",
    "tpch_q22",
    "tpch_q19",
    "url_dedup",
    "wet_scan",
    "tpch_q4",
    "tpch_q15",
    "pipeline_crawl",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q11",
    "tpch_q12",
    "tpch_q14",
    "tpch_q16",
    "wet_scan_gz",
    "partition_prune",
    "tokenizer_stats",
    # r9 additions
    "token_shards",
    "token_shards_audit",
    "token_pack",
    "pipeline_pretrain",
    "html_extract",
    "pipeline_crawl_html",
    "corpus_report_stored",
    "ann_tune",
    "ann_tune_ef",
]


def _strides(spark, sf_dir: str) -> dict[str, int]:
    """max_key + 1 per entity, computed once from the source tables."""
    strides: dict[str, int] = {}
    per_table: dict[str, list[str]] = {}
    for tbl in _REPLICATED:
        cols = [c for c in spark.read.parquet(
            os.path.join(sf_dir, f"{tbl}.parquet")).columns
            if c in _KEY_GROUPS]
        per_table[tbl] = cols
    for tbl, cols in per_table.items():
        if not cols:
            continue
        df = spark.read.parquet(os.path.join(sf_dir, f"{tbl}.parquet"))
        row = df.agg(*[F.max(c).alias(c) for c in cols]).collect()[0]
        for c in cols:
            ent = _KEY_GROUPS[c]
            strides[ent] = max(strides.get(ent, 0), int(row[c]) + 1)
    return strides


def build_replica(spark, sf_dir: str, out_dir: str, mult: int) -> None:
    """Materialize the disjoint-key Nx replica layout at out_dir."""
    marker = os.path.join(out_dir, "_SCALE_MARKER.json")
    want = {"source": os.path.abspath(sf_dir), "mult": mult, "v": 1}
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == want:
                return  # layout already built for this (source, mult)
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    strides = _strides(spark, sf_dir)
    for tbl in _VERBATIM:
        src = os.path.join(sf_dir, f"{tbl}.parquet")
        spark.read.parquet(src).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{tbl}.parquet"))
    for tbl in _REPLICATED:
        src = os.path.join(sf_dir, f"{tbl}.parquet")
        df = spark.read.parquet(src)
        keyed = [c for c in df.columns if c in _KEY_GROUPS]
        rep = df.withColumn(
            "_r", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
        for c in keyed:
            rep = rep.withColumn(
                c, F.col(c) + F.col("_r") * F.lit(strides[_KEY_GROUPS[c]]))
        rep = rep.drop("_r").repartition(_OUT_PARTITIONS)
        rep.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{tbl}.parquet"))
    with open(marker, "w") as f:
        json.dump(want, f)


def build_skew_replica(spark, replica_dir: str, out_dir: str) -> None:
    """Derive the SKEWED replica from the uniform one: documents.source
    (the host every synthesized URL embeds) is rewritten to one hot
    value on 60% of rows; every other table is referenced verbatim via
    the filesystem (copied) so the two layouts differ ONLY in the host
    distribution."""
    marker = os.path.join(out_dir, "_SKEW_MARKER.json")
    want = {"source": os.path.abspath(replica_dir), "v": 1,
            "hot": _SKEW_HOT_FRAC_MOD}
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == want:
                return
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    mod, thr = _SKEW_HOT_FRAC_MOD
    docs = spark.read.parquet(os.path.join(replica_dir, "documents.parquet"))
    skewed = docs.withColumn(
        "source",
        F.when(F.col("doc_id") % mod < thr, F.lit("src0")).otherwise(
            F.col("source")
        ),
    ).repartition(_OUT_PARTITIONS)
    skewed.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet"))
    for tbl in _REPLICATED + _VERBATIM:
        if tbl == "documents":
            continue
        src = os.path.join(replica_dir, f"{tbl}.parquet")
        dst = os.path.join(out_dir, f"{tbl}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            shutil.copytree(src, dst)
    with open(marker, "w") as f:
        json.dump(want, f)


def _time_query(spark, fn, sf_dir: str) -> float:
    best = None
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(_DEFAULT_QUERIES),
                    help="comma-separated keys of __spark_entry__.queries()")
    ap.add_argument("--mult", type=int, default=64)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--data-dir", default="/tmp/scale64_data")
    ap.add_argument("--rebuild", action="store_true",
                    help="force replica rebuild even if the marker matches")
    ap.add_argument("--skew-queries", default="",
                    help="comma-separated queries to ALSO measure on the "
                         "planted-hot-host replica (uniform-Nx vs skew-Nx); "
                         "pass 'default' for "
                         + ",".join(_DEFAULT_SKEW_QUERIES))
    ap.add_argument("--skew-dir", default="/tmp/scale64_skew")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_SCALE.json"))
    args = ap.parse_args()

    spark = get_spark("bench_scale")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    names = [q.strip() for q in args.queries.split(",") if q.strip()]
    unknown = [q for q in names if q not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    if args.rebuild and os.path.exists(args.data_dir):
        shutil.rmtree(args.data_dir)
    build_replica(spark, args.sf_dir, args.data_dir, args.mult)

    results: dict[str, dict[str, float]] = {}
    for name in names:
        fn = queries[name]
        w1 = _time_query(spark, fn, args.sf_dir)
        wN = _time_query(spark, fn, args.data_dir)
        results[name] = {
            "wall_1x": round(w1, 3),
            f"wall_{args.mult}x": round(wN, 3),
            "ratio": round(wN / w1, 2),
        }
        print(f"# {name}: 1x {w1:.2f}s  {args.mult}x {wN:.2f}s  "
              f"ratio {wN / w1:.2f}x", file=sys.stderr)

    skew_results: dict[str, dict[str, float]] = {}
    skew_names = [q.strip() for q in args.skew_queries.split(",") if q.strip()]
    if skew_names == ["default"]:
        skew_names = list(_DEFAULT_SKEW_QUERIES)
    unknown = [q for q in skew_names if q not in queries]
    if unknown:
        raise SystemExit(f"unknown skew queries: {unknown}")
    if skew_names:
        build_skew_replica(spark, args.data_dir, args.skew_dir)
        for name in skew_names:
            fn = queries[name]
            wU = _time_query(spark, fn, args.data_dir)
            wS = _time_query(spark, fn, args.skew_dir)
            skew_results[name] = {
                "wall_uniform": round(wU, 3),
                "wall_skew": round(wS, 3),
                "skew_ratio": round(wS / wU, 2),
            }
            print(f"# skew {name}: uniform {wU:.2f}s  hot-host {wS:.2f}s  "
                  f"ratio {wS / wU:.2f}x", file=sys.stderr)

    # MERGE into an existing same-mult file: a partial re-run (new
    # queries, the skew tier) must never silently drop the committed
    # rows it didn't re-measure
    payload = {
        "metric": "scale_ratio",
        "mult": args.mult,
        "sf_dir": args.sf_dir,
        "data_dir": args.data_dir,
        "queries": results,
    }
    if os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f)
        if prior.get("mult") == args.mult:
            merged = dict(prior.get("queries", {}))
            merged.update(results)
            payload["queries"] = merged
            if "skew" in prior and not skew_results:
                payload["skew"] = prior["skew"]
            elif skew_results:
                # same merge-not-overwrite rule for the skew tier: a
                # re-run measuring a different skew subset must keep
                # the committed rows it didn't re-measure
                merged_skew = dict(
                    prior.get("skew", {}).get("queries", {})
                )
                merged_skew.update(skew_results)
                skew_results = merged_skew
    if skew_results:
        payload["skew"] = {
            "hot_frac": _SKEW_HOT_FRAC_MOD[1] / _SKEW_HOT_FRAC_MOD[0],
            "queries": skew_results,
        }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(json.dumps({
        "metric": "scale_ratio", "mult": args.mult,
        "queries": {k: v["ratio"] for k, v in results.items()},
        "skew": {k: v["skew_ratio"] for k, v in skew_results.items()},
        "detail": os.path.basename(args.out),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
