"""Approximate search quality: recall@k against brute-force ground truth —
the validation the reference never does (SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hnsw_vector_db_spark.operators import similarity
from hnsw_vector_db_spark.operators.hnsw_partition import LocalHNSW, hnsw_topk
from hnsw_vector_db_spark.operators.knn import knn_batch
from hnsw_vector_db_spark.sources.parquet import load_table

K = 10
N_QUERIES = 10


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).cache()


@pytest.fixture(scope="module")
def ground_truth(queries, emb):
    gt = knn_batch(queries, emb, k=K, metric="cosine").collect()
    out: dict[int, set[int]] = {}
    for r in gt:
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def _recall(result_rows, ground_truth) -> float:
    got: dict[int, set[int]] = {}
    for r in result_rows:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(got.get(q, set()) & gt) / len(gt) for q, gt in ground_truth.items()
    ]
    return float(np.mean(recalls))


def test_local_hnsw_recall():
    """Pure-index recall on random data: HNSW ef=64 vs exact, >= 0.9."""
    rng = np.random.RandomState(0)
    X = rng.randn(2000, 32)
    index = LocalHNSW(m=8, ef_construction=64, metric="cosine", seed=0)
    index.build(X)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    recalls = []
    for qi in range(20):
        q = X[qi]
        exact = set(np.argsort(1 - Xn @ (q / np.linalg.norm(q)))[:K].tolist())
        got = {i for i, _ in index.search(q, K, ef=64)}
        recalls.append(len(got & exact) / K)
    assert np.mean(recalls) >= 0.9, f"LocalHNSW recall {np.mean(recalls)}"


def test_hnsw_topk_distributed_recall(spark, emb, queries, ground_truth):
    """NOTE: the testdata embeddings are uniform random (no cluster
    structure — verified: within-label mean cosine sim 0.0016 vs cross
    0.0003), so recall of ANY partition-pruned ANN is bounded by the
    candidate fraction. nprobe=3 of 4 cells probes ~75% of the corpus;
    HNSW inside each probed cell is near-exact, so recall ~= fraction."""
    assigned, centroids = similarity.ivf_fit(emb, n_cells=4)
    out = hnsw_topk(
        queries, assigned, centroids, k=K, ef=96, nprobe=3, metric="cosine"
    ).collect()
    r = _recall(out, ground_truth)
    assert r >= 0.65, f"distributed HNSW recall {r}"


def test_ivf_recall(spark, emb, ground_truth):
    """nprobe=6 of 8 cells ~= 75% candidate fraction on unclustered data
    (see note above); exact within probed cells."""
    assigned, centroids = similarity.ivf_fit(emb, n_cells=8)
    rows = []
    for qid in range(N_QUERIES):
        qv = emb.filter(F.col("vec_id") == qid).first()["embedding"]
        for r in similarity.ivf_topk(
            assigned, centroids, qv, k=K, nprobe=6, metric="cosine"
        ).collect():
            rows.append({"query_id": qid, "vec_id": r["vec_id"]})
    r = _recall(rows, ground_truth)
    assert r >= 0.6, f"IVF recall {r}"


def test_lsh_multiprobe_improves_recall(spark, emb, queries, ground_truth):
    """Sign-bit LSH on unclustered data: recall tracks buckets probed.
    probe_hamming=2 probes 22 of 64 buckets; must beat single-bucket."""
    r0 = _recall(
        similarity.lsh_ann_topk(
            queries, emb, k=K, n_planes=6, dim=64, probe_hamming=0
        ).collect(),
        ground_truth,
    )
    r2 = _recall(
        similarity.lsh_ann_topk(
            queries, emb, k=K, n_planes=6, dim=64, probe_hamming=2
        ).collect(),
        ground_truth,
    )
    assert r2 >= r0, f"multi-probe should not lower recall ({r0} -> {r2})"
    assert r2 >= 0.35, f"LSH probe=2 recall {r2}"


def test_similarity_join_symmetric_threshold(spark, emb):
    pairs = similarity.similarity_join(emb.limit(100), threshold=0.2).collect()
    assert all(r["id_a"] < r["id_b"] for r in pairs)
    assert all(r["sim"] >= 0.2 for r in pairs)


def test_assign_to_centroids_matches_numpy(spark, emb):
    from pyspark.sql import functions as SF

    from hnsw_vector_db_spark.operators.similarity import assign_to_centroids

    seeds = emb.filter(SF.col("vec_id") < 8).select(
        SF.col("vec_id").alias("seed_id"), SF.col("embedding").alias("seed_vec")
    )
    got = {r["vec_id"]: r["cell"] for r in assign_to_centroids(emb, seeds).collect()}
    X = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()}
    S = {i: X[i] for i in range(8)}
    for vid, x in X.items():
        dists = {sid: float(np.linalg.norm(x - sv)) for sid, sv in S.items()}
        best = min(dists, key=lambda s: (dists[s], s))
        assert got[vid] == best
    # incremental property: assigning a subset gives the same cells
    sub = emb.filter(SF.col("vec_id") % 3 == 0)
    inc = {r["vec_id"]: r["cell"] for r in assign_to_centroids(sub, seeds).collect()}
    assert all(got[v] == c for v, c in inc.items())


def test_pq_adc_recall(spark, emb, ground_truth):
    """ADC over PQ codes is a coarse approximation; with 8 seed codebooks
    its top-30 should still catch most of the exact top-10 — and exact
    re-rank of those candidates restores precision."""
    from pyspark.sql import functions as SF

    from hnsw_vector_db_spark.operators.knn import knn_point
    from hnsw_vector_db_spark.operators.similarity import pq_adc_topk, pq_encode

    seeds = emb.filter(SF.col("vec_id") < 8).select(
        SF.col("vec_id").alias("seed_id"), SF.col("embedding").alias("seed_vec")
    )
    codes = pq_encode(emb, seeds).cache()
    qv = emb.filter(SF.col("vec_id") == 0).first()["embedding"]
    exact = {
        r["vec_id"]
        for r in knn_point(emb, qv, k=10, metric="euclidean").collect()
    }
    adc = [r["vec_id"] for r in pq_adc_topk(codes, seeds, qv, k=30).collect()]
    assert len(adc) == 30
    # candidate recall: most exact neighbors inside the ADC shortlist
    assert len(exact & set(adc)) >= 5
    # exact re-rank of the shortlist must rank the true NN (itself) first
    shortlist = emb.join(
        spark.createDataFrame([(v,) for v in adc], "vec_id long"), "vec_id"
    )
    rer = knn_point(shortlist, qv, k=1, metric="euclidean").first()
    assert rer["vec_id"] == 0


def test_pq_learned_codebooks_beat_seed_codebooks(spark, emb):
    """Per-subspace k-means codebooks (real PQ training) must cut mean
    quantization distortion vs the seed-row codebook, and the full
    ADC+re-rank path must hit recall@10 >= 0.9 on its worst case
    (unclustered gaussians)."""
    from pyspark.sql import functions as SF

    from hnsw_vector_db_spark.operators.knn import knn_point
    from hnsw_vector_db_spark.operators.similarity import (
        pq_adc_rerank,
        pq_encode,
        pq_encode_codebook,
        pq_fit_codebooks,
    )

    seeds = emb.filter(SF.col("vec_id") < 8).select(
        SF.col("vec_id").alias("seed_id"), SF.col("embedding").alias("seed_vec")
    )
    seed_dist = pq_encode(emb, seeds).agg(SF.avg("dist")).first()[0]
    cb = pq_fit_codebooks(emb, n_subspaces=8, n_codes=16, dim=64).cache()
    learned_dist = pq_encode_codebook(emb, cb).agg(SF.avg("dist")).first()[0]
    assert learned_dist < seed_dist, (learned_dist, seed_dist)

    cb16 = pq_fit_codebooks(emb, n_subspaces=16, n_codes=32, dim=64).cache()
    codes = pq_encode_codebook(emb, cb16, n_subspaces=16).select(
        "vec_id", "m", "code"
    ).cache()
    recalls = []
    for qid in range(3):
        qv = emb.filter(SF.col("vec_id") == qid).first()["embedding"]
        approx = {
            r["vec_id"]
            for r in pq_adc_rerank(
                emb, cb16, qv, k=10, shortlist=200, metric="euclidean",
                codes=codes, n_subspaces=16,
            ).collect()
        }
        exact = {
            r["vec_id"]
            for r in knn_point(emb, qv, k=10, metric="euclidean").collect()
        }
        recalls.append(len(approx & exact) / 10)
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_ivf_pq_composed_index(spark, emb):
    """IVF-PQ (residual PQ under a coarse quantizer): recall@10 >= 0.9
    with nprobe=half the cells, and the ADC join scans ONLY probed
    cells (inner join on the per-cell LUT prunes the rest)."""
    from hnsw_vector_db_spark.operators.knn import knn_point
    from hnsw_vector_db_spark.operators.similarity import ivf_pq_fit, ivf_pq_topk

    from pyspark.sql import functions as SF

    codes, centroids, codebook = ivf_pq_fit(emb, n_cells=8, n_subspaces=16, n_codes=32)
    codes = codes.cache()
    codebook = codebook.cache()
    recalls = []
    for qid in range(3):
        qv = emb.filter(SF.col("vec_id") == qid).first()["embedding"]
        out = ivf_pq_topk(
            emb, codes, centroids, codebook, qv, k=10, nprobe=4,
            shortlist=200, n_subspaces=16,
        )
        approx = {r["vec_id"] for r in out.collect()}
        exact = {
            r["vec_id"] for r in knn_point(emb, qv, k=10, metric="euclidean").collect()
        }
        recalls.append(len(approx & exact) / 10)
    assert sum(recalls) / len(recalls) >= 0.9, recalls

    # determinism: same fit twice -> identical codes (seeded KMeans + Lloyd's)
    codes2, _, _ = ivf_pq_fit(emb, n_cells=8, n_subspaces=16, n_codes=32)
    assert codes.exceptAll(codes2).count() == 0
    assert codes2.exceptAll(codes).count() == 0


def test_ivf_pq_insert_appends_searchable_codes(spark, emb):
    """New vectors encoded against the frozen quantizers are found by
    the composed search, and existing code rows are untouched
    (append-only)."""
    from pyspark.sql import functions as SF

    from hnsw_vector_db_spark.operators.similarity import (
        ivf_pq_fit,
        ivf_pq_insert,
        ivf_pq_topk,
    )

    codes, centroids, codebook = ivf_pq_fit(emb, n_cells=8, n_subspaces=16, n_codes=32)
    codes = codes.cache()
    codebook = codebook.cache()
    new = emb.filter(SF.col("vec_id") < 2).select(
        (SF.col("vec_id") + 5_000_000).alias("vec_id"), "embedding"
    )
    merged = ivf_pq_insert(
        codes, new, centroids, codebook, n_subspaces=16
    ).cache()
    # append-only: old rows unchanged, exactly 2*16 new rows
    assert merged.count() == codes.count() + 2 * 16
    assert codes.exceptAll(merged).count() == 0

    all_vecs = emb.select("vec_id", "embedding").unionByName(new)
    for qid in (0, 1):
        qv = emb.filter(SF.col("vec_id") == qid).first()["embedding"]
        top = ivf_pq_topk(
            all_vecs, merged, centroids, codebook, qv, k=2, nprobe=4,
            shortlist=100, n_subspaces=16,
        ).collect()
        ids = {r["vec_id"] for r in top}
        # the duplicate pair (original + inserted copy) dominates top-2
        assert ids == {qid, qid + 5_000_000}


# ---- scalar quantization ---------------------------------------------------

def test_sq_encode_roundtrip_error_bound(spark, emb):
    """Dequantization error is bounded by scale/2 per element — the
    defining property of round-to-nearest scalar quantization."""
    import numpy as np

    from hnsw_vector_db_spark.operators.similarity import sq_encode

    enc = sq_encode(emb).limit(50).collect()
    orig = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.limit(200).collect()}
    for r in enc:
        x = orig[r["vec_id"]]
        codes = np.asarray(r["codes"], dtype=np.float64)
        xhat = r["mn"] + codes * r["scale"]
        assert np.abs(x - xhat).max() <= r["scale"] / 2 + 1e-12
        assert codes.min() >= 0 and codes.max() <= 255


def test_sq_encode_constant_vector(spark):
    from hnsw_vector_db_spark.operators.similarity import sq_encode

    df = spark.createDataFrame(
        [(1, [2.5, 2.5, 2.5])], "vec_id long, embedding array<double>"
    )
    r = sq_encode(df).first()
    assert r["codes"] == [0, 0, 0] and r["scale"] == 1.0 and r["mn"] == 2.5


def test_sq_knn_matches_exact_with_wide_shortlist(spark, emb):
    """With shortlist >= corpus the quantized phase cannot lose the true
    top-k: sq_knn == exact knn_point, distances identical (phase 2 is
    exact)."""
    from hnsw_vector_db_spark.operators.knn import knn_point
    from hnsw_vector_db_spark.operators.similarity import sq_knn

    q = emb.filter(F.col("vec_id") == 3).first()["embedding"]
    n = emb.count()
    got = [(r["vec_id"], r["dist"]) for r in
           sq_knn(emb, q, k=10, shortlist=n, metric="euclidean").collect()]
    want = [(r["vec_id"], round(r["dist"], 6)) for r in
            knn_point(emb, q, k=10, metric="euclidean").collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-6


def test_sq_knn_recall_at_default_shortlist(spark, emb):
    """Default shortlist=50 on the gaussian testdata: recall@10 vs exact
    should be high (int8 quantization loses little at 64 dims)."""
    from hnsw_vector_db_spark.operators.knn import knn_point
    from hnsw_vector_db_spark.operators.similarity import sq_knn

    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    got = {r["vec_id"] for r in sq_knn(emb, q, k=10, shortlist=50).collect()}
    want = {r["vec_id"] for r in knn_point(emb, q, k=10, metric="euclidean").collect()}
    assert len(got & want) >= 9


# ---- binary quantization ---------------------------------------------------

def test_bq_encode_matches_python_packer(spark, emb):
    """Every packed word equals the driver-side Horner fold over the
    same 32-bit slice — the cross-engine packing contract."""
    import numpy as np

    from hnsw_vector_db_spark.operators.similarity import (
        bq_encode,
        pack_query_bits,
    )

    orig = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.limit(100).collect()}
    enc = bq_encode(emb.filter(F.col("vec_id") < 100), 64).collect()
    assert len(enc) == len(orig)
    for r in enc:
        assert r["words"] == pack_query_bits(orig[r["vec_id"]], 64)
        assert all(w >= 0 for w in r["words"])  # 32 bits/word: no sign wrap


def test_bq_encode_short_vector_fixed_bit_positions(spark):
    """A vector shorter than dim must pack into the SAME bit positions
    as its zero-padded full-width twin (r6 ADVICE: the clamped-slice
    fold put short vectors' bits in low-order positions, making the
    Hamming xor compare misaligned bits for mixed-length data)."""
    from hnsw_vector_db_spark.operators.similarity import (
        bq_encode,
        pack_query_bits,
    )

    short = [1.0, -1.0, 1.0]  # 3 components, dim=8
    padded = short + [0.0] * 5
    df = spark.createDataFrame(
        [(0, short), (1, padded)], "vec_id long, embedding array<double>"
    )
    rows = {r["vec_id"]: r["words"] for r in bq_encode(df, 8, bits_per_word=8).collect()}
    assert rows[0] == rows[1]  # fixed positions: padding is a no-op
    assert rows[0] == pack_query_bits(short, 8, bits_per_word=8)
    # bit 0 (x=1.0) is the HIGH-order bit of the 8-bit word: 1,0,1,0...0
    assert rows[0] == [0b10100000]


def test_bq_encode_validates_params(spark, emb):
    from hnsw_vector_db_spark.operators.similarity import bq_encode

    with pytest.raises(ValueError):
        bq_encode(emb, 0)
    with pytest.raises(ValueError):
        bq_encode(emb, 64, bits_per_word=63)


def test_bq_hamming_equals_sign_mismatch_count(spark, emb):
    """bit_count(xor) over packed words == per-component sign-mismatch
    count — the identity the SQL oracle relies on."""
    import numpy as np

    from hnsw_vector_db_spark.operators.similarity import (
        bq_encode,
        pack_query_bits,
    )

    rows = emb.filter(F.col("vec_id") < 100).collect()
    X = {r["vec_id"]: np.asarray(r["embedding"]) for r in rows}
    q = X[0]
    qw = pack_query_bits(q, 64)
    enc = {r["vec_id"]: r["words"]
           for r in bq_encode(emb.filter(F.col("vec_id") < 100), 64).collect()}
    for vid, words in enc.items():
        ham_bits = sum(bin(a ^ b).count("1") for a, b in zip(words, qw))
        ham_sign = int(((X[vid] > 0) != (q > 0)).sum())
        assert ham_bits == ham_sign


def test_bq_knn_matches_exact_with_wide_shortlist(spark, emb):
    """shortlist >= corpus: the Hamming phase cannot lose the true
    top-k; phase 2 is exact, so bq_knn == exact knn_point."""
    from hnsw_vector_db_spark.operators.knn import knn_point
    from hnsw_vector_db_spark.operators.similarity import bq_knn

    q = emb.filter(F.col("vec_id") == 3).first()["embedding"]
    n = emb.count()
    got = [(r["vec_id"], r["dist"]) for r in
           bq_knn(emb, q, k=10, shortlist=n, metric="euclidean").collect()]
    want = [(r["vec_id"], round(r["dist"], 6)) for r in
            knn_point(emb, q, k=10, metric="euclidean").collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-6


def test_bq_knn_self_query_rank_one(spark, emb):
    """The query vector itself has Hamming 0 and exact distance 0 — it
    must always survive the shortlist and rank first."""
    from hnsw_vector_db_spark.operators.similarity import bq_knn

    q = emb.filter(F.col("vec_id") == 7).first()["embedding"]
    top = bq_knn(emb, q, k=3, shortlist=50).collect()
    assert top[0]["vec_id"] == 7 and top[0]["dist"] == 0.0


# ---- maxsim late interaction ----------------------------------------------

def _np_maxsim(docs_rows, phrases, dim=64, chunk=32):
    """Dense numpy twin of the sparse maxsim pipeline."""
    import re

    import numpy as np

    def poly(s):
        h = 0
        for c in s:
            h = (h * 131 + ord(c)) % 2147483647
        return h

    def embed_tokens(toks):
        v = np.zeros(dim)
        for t in toks:
            sgn = 1.0 if poly(t + "#s") % 2 == 0 else -1.0
            v[poly(t) % dim] += sgn
        n = np.linalg.norm(v)
        return v / n if n > 0 else None

    qvecs = [embed_tokens(re.findall(r"\S+", p)) for p in phrases]
    scores = {}
    for r in docs_rows:
        toks = re.findall(r"\S+", r["text"])
        cvecs = [embed_tokens(toks[i : i + chunk])
                 for i in range(0, len(toks), chunk)]
        cvecs = [c for c in cvecs if c is not None]
        if not cvecs:
            continue
        total = 0.0
        for q in qvecs:
            if q is None:
                continue
            total += round(max(float(q @ c) for c in cvecs), 9)
        scores[r["doc_id"]] = round(total, 6)
    return scores


def test_maxsim_matches_dense_numpy(spark, sf_dir):
    """The sparse posting-list maxsim == the dense definition (cos of
    unit vectors, max over chunks, sum over queries) on real docs."""
    from hnsw_vector_db_spark.operators.similarity import maxsim_topk
    from hnsw_vector_db_spark.operators.text_analysis import (
        hash_embed_chunk_components,
        hash_embed_query_components,
    )

    phrases = ["vector index scan", "stream window agg"]
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    queries = spark.createDataFrame(
        list(enumerate(phrases)), "qid long, phrase string"
    )
    got = {
        r["doc_id"]: r["maxsim_score"]
        for r in maxsim_topk(
            hash_embed_chunk_components(docs, 64, 32),
            hash_embed_query_components(queries, 64),
            k=60,
        ).collect()
    }
    want = _np_maxsim(docs.collect(), phrases)
    # operator emits every doc with >= 1 overlapping bucket; zero-score
    # docs (no overlap at all with any phrase) are absent from `got`
    for did, sc in got.items():
        assert abs(want[did] - sc) < 2e-6, did
    top_want = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    top_got = sorted(got.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [d for d, _ in top_want] == [d for d, _ in top_got]


def test_maxsim_zero_floor_for_missed_chunks(spark):
    """A doc whose chunks include one the query shares NO bucket with
    must floor that query's best at 0 (a no-overlap chunk has dot 0),
    never at the negative dot of an overlapping chunk."""
    from hnsw_vector_db_spark.operators.similarity import maxsim_topk

    # hand-built sparse comps: doc 1 has chunks 0 (overlap, negative
    # dot) and 1 (no shared bucket)
    chunk_comps = spark.createDataFrame(
        [(1, 0, 3, -1.0, 1.0), (1, 1, 7, 1.0, 1.0)],
        "doc_id long, chunk_idx int, b int, v double, nrm double",
    )
    query_comps = spark.createDataFrame(
        [(0, 3, 1.0, 1.0)], "qid long, b int, v double, qn double"
    )
    out = maxsim_topk(chunk_comps, query_comps, k=5).collect()
    assert len(out) == 1
    assert out[0]["maxsim_score"] == 0.0  # floored, not -1.0


def test_maxsim_no_floor_when_all_chunks_hit(spark):
    """If the query overlaps EVERY chunk, the true (possibly negative)
    max survives — the floor only stands in for unjoined zero dots."""
    from hnsw_vector_db_spark.operators.similarity import maxsim_topk

    chunk_comps = spark.createDataFrame(
        [(1, 0, 3, -1.0, 1.0), (1, 1, 3, -2.0, 2.0)],
        "doc_id long, chunk_idx int, b int, v double, nrm double",
    )
    query_comps = spark.createDataFrame(
        [(0, 3, 1.0, 1.0)], "qid long, b int, v double, qn double"
    )
    out = maxsim_topk(chunk_comps, query_comps, k=5).collect()
    assert out[0]["maxsim_score"] == -1.0  # max(-1, -1) over both chunks


# ---- random projection (JL) -------------------------------------------------

def test_random_projection_basis_vectors(spark):
    """Projecting e_i returns matrix column i / sqrt(out_dim) exactly."""
    from hnsw_vector_db_spark.operators.similarity import (
        random_projection,
        rp_sign_matrix,
    )

    dim, k = 8, 4
    m = rp_sign_matrix(dim, k)
    rows = [(i, [1.0 if j == i else 0.0 for j in range(dim)]) for i in range(dim)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["proj"] for r in random_projection(df, dim, k).collect()}
    for i in range(dim):
        want = [m[j][i] / k ** 0.5 for j in range(k)]
        assert got[i] == want


def test_random_projection_preserves_norms_on_average(spark, emb):
    """E[||Px||^2] = ||x||^2 for Rademacher/sqrt(k) — the JL engine.
    With k=32 the empirical mean squared-norm ratio over 200 real
    embeddings must sit near 1."""
    import numpy as np

    from hnsw_vector_db_spark.operators.similarity import random_projection

    sub = emb.filter(F.col("vec_id") < 200)
    orig = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in sub.collect()}
    proj = {r["vec_id"]: np.asarray(r["proj"])
            for r in random_projection(sub, 64, 32).collect()}
    ratios = [np.dot(proj[i], proj[i]) / np.dot(orig[i], orig[i])
              for i in orig if np.dot(orig[i], orig[i]) > 0]
    assert abs(float(np.mean(ratios)) - 1.0) < 0.15
    # and pairwise DISTANCES too (the actual JL statement), sampled
    ids = sorted(orig)[:40]
    dr = []
    for a in range(0, 40, 5):
        for b in range(a + 1, 40, 7):
            i, j = ids[a], ids[b]
            do = np.linalg.norm(orig[i] - orig[j])
            dp = np.linalg.norm(proj[i] - proj[j])
            if do > 0:
                dr.append((dp / do) ** 2)
    assert abs(float(np.mean(dr)) - 1.0) < 0.25


def test_random_projection_validates(spark, emb):
    from hnsw_vector_db_spark.operators.similarity import random_projection

    with pytest.raises(ValueError):
        random_projection(emb, 0, 8)
    with pytest.raises(ValueError):
        random_projection(emb, 64, 0)


# ---- radius search ---------------------------------------------------------

def test_radius_search_ivf_prunes_clusters_and_stays_exact(spark):
    """Planted 3-cluster fixture: the query sits in cluster 0, radius
    small — triangle-inequality pruning must scan ONLY that cluster's
    cell and still return exactly the brute-force hit set."""
    import numpy as np
    from pyspark.sql import Row

    from hnsw_vector_db_spark.operators.similarity import (
        radius_search_exact,
        radius_search_ivf,
    )

    rng = np.random.RandomState(7)
    centers = np.array([[0.0] * 8, [100.0] * 8, [-100.0] * 8])
    rows = []
    for i in range(90):
        c = i % 3
        rows.append(Row(vec_id=i, embedding=[float(x) for x in
                                             centers[c] + rng.rand(8)]))
    vecs = spark.createDataFrame(rows)
    assigned = vecs.withColumn("cell", (F.col("vec_id") % 3).cast("int"))
    q = [0.5] * 8
    hits, n_probed, n_cells = radius_search_ivf(
        assigned, centers, q, radius=2.0
    )
    assert n_cells == 3 and n_probed == 1  # two clusters pruned
    got = sorted(map(tuple, hits.collect()))
    want = sorted(map(tuple, radius_search_exact(vecs, q, 2.0).collect()))
    assert got == want and got  # exact, and non-empty


def test_radius_search_validates_radius(spark):
    from pyspark.sql import Row

    from hnsw_vector_db_spark.operators.similarity import radius_search_exact

    df = spark.createDataFrame([Row(vec_id=0, embedding=[0.0, 0.0])])
    with pytest.raises(ValueError):
        radius_search_exact(df, [0.0, 0.0], -1.0)


def test_similarity_join_kernel_matches_expression(spark, emb):
    """r12: the Arrow pairwise kernel (matmul prefilter + fold-order
    recompute) must be VALUE-IDENTICAL to the zip_with/aggregate
    expression path — same pair set, bit-equal rounded sims."""
    sub = emb.limit(300)
    fast_df = similarity.similarity_join(sub, threshold=0.1)
    # the kernel path is one MapInPandas stage; broadcast_right=False
    # forces the retained expression path (the semantics anchor)
    assert "MapInPandas" in fast_df._jdf.queryExecution().executedPlan().toString()
    slow_df = similarity.similarity_join(sub, threshold=0.1, broadcast_right=False)
    fast = {(r["id_a"], r["id_b"]): r["sim"] for r in fast_df.collect()}
    slow = {(r["id_a"], r["id_b"]): r["sim"] for r in slow_df.collect()}
    assert fast == slow and len(fast) > 100


def test_similarity_join_kernel_edge_cases(spark):
    """Zero vectors (sim 0 via the normalize guard), negatives, exact
    duplicates at the sim == threshold boundary, threshold <= 0 — kernel
    and expression path must agree on all of them."""
    rows = [
        (1, [1.0, 2.0, -3.0]),
        (2, [0.0, 0.0, 0.0]),   # zero norm -> normalizes to zero -> sim 0
        (3, [-1.0, -2.0, 3.0]),
        (4, [2.0, 4.0, -6.0]),  # exact multiple of id 1 -> sim rounds to 1.0
        (5, [0.3, -0.7, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for t in (-1.0, 0.0, 0.5, 1.0):
        fast = {
            (r["id_a"], r["id_b"]): r["sim"]
            for r in similarity.similarity_join(df, threshold=t).collect()
        }
        slow = {
            (r["id_a"], r["id_b"]): r["sim"]
            for r in similarity.similarity_join(
                df, threshold=t, broadcast_right=False
            ).collect()
        }
        assert fast == slow, f"threshold={t}: {fast} != {slow}"
    # sim(1,4) rounds to exactly 1.0 and must survive threshold=1.0
    at_one = similarity.similarity_join(df, threshold=1.0).collect()
    assert {(r["id_a"], r["id_b"]) for r in at_one} == {(1, 4)}


def test_similarity_join_ragged_falls_back(spark):
    """A ragged vector on the collected side disables the kernel; the
    expression path drops ragged pairs (null sim) — behavior unchanged."""
    rows = [
        (1, [1.0, 2.0, -3.0]),
        (2, [1.0, 2.0]),        # ragged -> every pair with it is dropped
        (3, [-2.0, -4.0, 6.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.similarity_join(df, threshold=-1.0)
    assert "MapInPandas" not in out._jdf.queryExecution().executedPlan().toString()
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == {(1, 3)}


def test_similarity_join_null_left_id_matches_expression(spark):
    """r13 (VERDICT_r12 #1): a null LEFT id with a qualifying vector is
    EMITTED by the non-self-join expression path (nothing filters id_a)
    — the kernel must emit it too. In the self-join the id_a < id_b
    predicate is null for such rows, so both paths drop them."""
    left = spark.createDataFrame(
        [(1, [1.0, 0.0]), (None, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    right = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    fast = similarity.similarity_join(left, right, threshold=0.5)
    assert "MapInPandas" in fast._jdf.queryExecution().executedPlan().toString()
    slow = similarity.similarity_join(
        left, right, threshold=0.5, broadcast_right=False
    )
    key = lambda r: (r["id_a"], r["id_b"], r["sim"])
    got = sorted(map(key, fast.collect()), key=str)
    want = sorted(map(key, slow.collect()), key=str)
    assert got == want
    assert any(r[0] is None for r in got)  # the null-id row IS emitted
    # self-join over a frame containing a null id: null never satisfies
    # id_a < id_b, so both paths drop it (right side has nulls -> kernel
    # falls back there; force the left-side case via distinct right)
    selfd = similarity.similarity_join(
        left.filter(F.col("vec_id").isNotNull()), threshold=0.5
    )
    assert all(r["id_a"] is not None for r in selfd.collect())


def test_similarity_join_byte_cap_falls_back(spark, monkeypatch):
    """r13 (VERDICT_r12 #2): the kernel cap is BYTE-sized — a wide-dim
    right side must fall back to the expression path instead of
    collecting rows*dim*8 bytes onto the driver."""
    import hnsw_vector_db_spark.operators.similarity as sim_mod

    dim = 64
    rows = [(i, [float(i == j) for j in range(dim)]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # shrink the byte budget so 8 rows x 64 dims x 8 B (= 4 KiB) busts it
    monkeypatch.setattr(sim_mod, "_PAIRWISE_KERNEL_BYTES", 2048)
    over = similarity.similarity_join(df, threshold=0.5)
    assert "MapInPandas" not in over._jdf.queryExecution().executedPlan().toString()
    # and the fallback still answers correctly (each vector only matches
    # itself; self-join excludes self pairs -> empty)
    assert over.count() == 0
    # restore a budget that fits and the kernel re-engages
    monkeypatch.setattr(sim_mod, "_PAIRWISE_KERNEL_BYTES", 1 << 20)
    under = similarity.similarity_join(df, threshold=0.5)
    assert "MapInPandas" in under._jdf.queryExecution().executedPlan().toString()
