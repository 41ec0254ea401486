"""Byte-pair-encoding tokenizer TRAINING and application, Spark-native.

BPE (Sennrich et al., ACL 2016 — the tokenizer-training algorithm behind
GPT/Llama-class vocabularies) is inherently iterative: count adjacent
symbol pairs, merge the most frequent pair everywhere, repeat. The
reference engine has no text tooling at all; a training-data platform
needs the tokenizer side of the house, and BPE training is its core.

Spark shape (what survives 100 TB):

- Training NEVER touches the raw token stream after the first pass: the
  corpus collapses to the DISTINCT-WORD frequency table (wf) up front —
  the classic trick (Zipf: billions of tokens -> millions of distinct
  words), and every iteration runs over that vocab-sized table.
- Each iteration is ONE keyed aggregation (explode adjacent pairs,
  weight by wf, argmax) plus ONE narrow projection (apply the merge via
  a codegen'd left fold over the symbol array — no UDF, no Python in
  the loop). The argmax is a 1-row driver fetch, same class as
  pagerank's fixed-iteration loop.
- Lineage is cut every iteration (localCheckpoint of the segmentation)
  so n_merges doesn't stack n_merges nested fold-expressions into one
  plan — with persist alone the DATA is cached but the analyzer still
  walks the ever-deeper plan and the driver dies (measured).

Tie-break: (count desc, left asc, right asc) — total order, so the
learned merge sequence is deterministic and engine-independent; the
pytest suite pins it against an independent textbook Python
implementation (tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from hnsw_vector_db_spark.functions.text import tokens

END = "</w>"  # end-of-word marker, per the original formulation


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """Apply ONE merge (left,right)->left||right to a symbol array as a
    pure codegen left fold: walk indices with a struct accumulator
    (out array + skip flag); when syms[i:i+2] == (left, right), emit the
    merged symbol and skip the next index. Leftmost-first,
    non-overlapping — exactly the sequential semantics of the textbook
    algorithm, with no UDF."""
    n = F.size(syms)
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(False).alias("skip"),
    )

    def step(acc, i):
        cur = F.element_at(syms, i + 1)
        nxt = F.element_at(syms, i + 2)  # null at the end
        is_pair = (
            (~acc["skip"]) & (cur == F.lit(left)) & (nxt == F.lit(right))
        )
        out = (
            F.when(acc["skip"], acc["out"])
            .when(is_pair, F.concat(acc["out"], F.array(F.lit(left + right))))
            .otherwise(F.concat(acc["out"], F.array(cur)))
        )
        return F.struct(out.alias("out"), is_pair.alias("skip"))

    folded = F.aggregate(
        F.sequence(F.lit(0), n - 1), init, step, lambda acc: acc["out"]
    )
    return F.when(n == 0, syms).otherwise(folded)


def _pair_counts(seg: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the segmented vocab:
    (left, right, cnt). Pair instances WITHIN a word count each
    occurrence (zip_with of the array against its own tail), weighted
    by word frequency."""
    pairs = F.zip_with(
        F.slice(F.col("syms"), 1, F.size("syms") - 1),
        F.slice(F.col("syms"), 2, F.size("syms") - 1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        seg.filter(F.size("syms") >= 2)
        .select(F.col("wf"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("wf").alias("cnt"))
    )


def word_freqs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, wf) corpus word-frequency table — the one pass over the
    raw token stream; everything after runs at vocab size."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wf"))
    )


def _initial_seg(wf: DataFrame) -> DataFrame:
    """Segment each distinct word into characters + the end marker."""
    return wf.select(
        "word",
        "wf",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END))
        ).alias("syms"),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the ordered
    list [(left, right, support), ...] — support is the weighted pair
    count at the time of the merge, and the sequence of supports is
    provably non-increasing (a merge can only create new pairs bounded
    by its own support; the driver entry pins that invariant in-row).

    Stops early when no pair occurs twice (support < 2 carries no
    compression information)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    # localCheckpoint, not persist: persist caches DATA but the logical
    # plan keeps growing — after ~20 iterations the analyzer is walking
    # 20 nested fold-aggregates and the DRIVER dies of plan blow-up
    # (measured: OOM at sf0.01 with persist; instant with checkpoint).
    # localCheckpoint truncates lineage each round, which is the correct
    # iterative-algorithm hygiene (same reason pagerank documents a
    # checkpoint-every-k recipe).
    seg = _initial_seg(word_freqs(docs, text_col, id_col)).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(seg)
            .orderBy(
                F.col("cnt").desc(), F.col("left").asc(), F.col("right").asc()
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["cnt"])
        merges.append((left, right, cnt))
        seg = seg.select(
            "word", "wf", _merge_fold(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint()
    return merges


def tokenizer_stats(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-SOURCE tokenizer-readiness report for a fixed merge list —
    the table a curator reads before committing a tokenizer to a
    corpus mix: docs, words, chars, subword tokens, chars-per-token
    (the compression a source actually gets), and the CHAR-FALLBACK
    rate — the fraction of emitted subwords that are single characters,
    i.e. text the merge vocabulary failed to cover (BPE's analog of
    OOV; high fallback on a source means the tokenizer was trained on
    different text and that source will pay more tokens per byte).

    Same scale shape as :func:`bpe_segment`: merge folds run over the
    DISTINCT-WORD table only; the raw stream is touched once for the
    (source, word) tf collapse and once for the final join; the report
    is one source-keyed aggregate with map-side partial combine.

    Every source appears exactly once: the report starts from the
    per-source doc-count aggregate and LEFT-joins the token-derived
    metrics, so a source whose documents tokenize to zero words
    (empty/whitespace-only text) still shows up with its ``n_docs``
    and zero counts (the ratio columns are NULL — 0/0 has no honest
    number)."""
    wtf = (
        docs.select(
            F.col(source_col), F.explode(tokens(text_col)).alias("word"),
            F.col(id_col),
        )
        .groupBy(source_col, "word")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct(id_col).alias("df"),
        )
    )
    vocab = wtf.select("word").distinct()
    seg = _initial_seg(vocab.select("word", F.lit(1).alias("wf"))).select(
        "word", "syms"
    )
    for i, m in enumerate(merges):
        seg = seg.select(
            "word", _merge_fold(F.col("syms"), m[0], m[1]).alias("syms")
        )
        if (i + 1) % 8 == 0:  # cut lineage: nested folds blow up codegen
            seg = seg.localCheckpoint()
    # a symbol is a char-fallback iff its visible text (the '</w>'
    # end-of-word marker stripped as a SUFFIX only) is one char
    visible = lambda s: F.regexp_replace(s, r"</w>$", "")
    sized = seg.select(
        "word",
        F.size("syms").alias("n_sub"),
        F.length("word").alias("n_ch"),
        F.size(
            F.filter(F.col("syms"), lambda s: F.length(visible(s)) == 1)
        ).alias("n_single"),
    )
    n_docs = docs.groupBy(source_col).agg(
        F.countDistinct(id_col).alias("n_docs")
    )
    metrics = (
        wtf.join(sized, "word")
        .groupBy(source_col)
        .agg(
            F.sum("tf").cast("long").alias("n_words"),
            F.sum(F.col("tf") * F.col("n_ch")).cast("long").alias("n_chars"),
            F.sum(F.col("tf") * F.col("n_sub")).cast("long").alias(
                "n_subwords"
            ),
            (
                F.round(
                    F.sum(F.col("tf") * F.col("n_ch"))
                    / F.sum(F.col("tf") * F.col("n_sub")),
                    6,
                )
                + F.lit(0.0)
            ).alias("chars_per_token"),
            (
                F.round(
                    F.sum(F.col("tf") * F.col("n_single"))
                    / F.sum(F.col("tf") * F.col("n_sub")),
                    6,
                )
                + F.lit(0.0)
            ).alias("fallback_rate"),
        )
    )
    return n_docs.join(metrics, source_col, "left").select(
        source_col,
        "n_docs",
        F.coalesce("n_words", F.lit(0).cast("long")).alias("n_words"),
        F.coalesce("n_chars", F.lit(0).cast("long")).alias("n_chars"),
        F.coalesce("n_subwords", F.lit(0).cast("long")).alias("n_subwords"),
        "chars_per_token",
        "fallback_rate",
    )


def bpe_token_ids(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    append_eod: bool = True,
) -> tuple[DataFrame, dict[str, int]]:
    """Encode every document to its TOKEN-ID sequence under a fixed
    merge list — the step between a learned tokenizer and the binary
    training shards (:mod:`~hnsw_vector_db_spark.sources.token_shards`).

    Vocabulary: the distinct symbols of the post-merge segmentation,
    numbered 0.. in lexicographic order — a pure function of (corpus,
    merges), so an independent engine re-derives the identical id map
    (the ``token_shards`` driver oracle does, via row_number over the
    distinct-symbol set). The symbol inventory is provably tiny
    (distinct characters + at most ``len(merges)`` merged units), so
    collecting it to build the literal lookup map is the same bounded
    collect class as every centroid/codebook collect.

    Scale shape: merge folds run over the DISTINCT-WORD table only
    (:func:`bpe_segment`'s Zipf collapse); the raw stream is touched
    once for the (doc, pos, word) explode and once for the final join;
    per-doc assembly is one keyed aggregation (array_sort of (pos, ids)
    structs, then flatten — order restored without a window).

    Returns ``(df, vocab)``: df = (id_col, ids array<long>) with the
    reserved end-of-document id ``len(vocab)`` appended when
    ``append_eod`` (the trainer convention — document boundaries must
    survive packing); vocab = symbol -> id."""
    wtf = docs.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "word")
    )
    vocab_words = wtf.select("word").distinct()
    seg = _initial_seg(vocab_words.select("word", F.lit(1).alias("wf"))).select(
        "word", "syms"
    )
    for i, m in enumerate(merges):
        seg = seg.select(
            "word", _merge_fold(F.col("syms"), m[0], m[1]).alias("syms")
        )
        if (i + 1) % 8 == 0:  # cut lineage: nested folds blow up codegen
            seg = seg.localCheckpoint()
    seg = seg.localCheckpoint()  # reused twice below: symbol scan + join
    # bounded collect: |distinct chars| + |merges| symbols
    syms = sorted(
        r["s"] for r in seg.select(F.explode("syms").alias("s")).distinct().collect()
    )
    vocab = {s: i for i, s in enumerate(syms)}
    id_map = F.create_map(
        *[F.lit(x) for kv in vocab.items() for x in (kv[0], kv[1])]
    )
    word_ids = seg.select(
        "word",
        F.transform(F.col("syms"), lambda s: id_map[s].cast("long")).alias(
            "wids"
        ),
    )
    eod = [F.lit(len(vocab)).cast("long")] if append_eod else []
    per_doc = (
        wtf.join(word_ids, "word")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("wids")))
            ).alias("pw")
        )
        .select(
            id_col,
            F.concat(
                F.flatten(F.transform(F.col("pw"), lambda x: x["wids"])),
                F.array(*eod) if eod else F.array().cast("array<long>"),
            ).alias("ids"),
        )
    )
    return per_doc, vocab


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list to a corpus: per document, the subword
    count before/after and the compression ratio. Application chains the
    SAME codegen merge fold once per merge over the distinct-word table,
    then joins token counts back by word — the raw stream is touched
    exactly twice (tf collapse, final join), never per merge.

    Output (id, n_words, n_chars, n_subwords, compression)."""
    wtf = (
        docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    vocab = wtf.select("word").distinct()
    seg = _initial_seg(vocab.select("word", F.lit(1).alias("wf"))).select(
        "word", "syms"
    )
    for i, m in enumerate(merges):
        seg = seg.select("word", _merge_fold(F.col("syms"), m[0], m[1]).alias("syms"))
        if (i + 1) % 8 == 0:  # cut lineage: nested folds blow up codegen
            seg = seg.localCheckpoint()
    sized = seg.select(
        "word", (F.size("syms")).alias("n_sub"), F.length("word").alias("n_ch")
    )
    return (
        wtf.join(sized, "word")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_words"),
            F.sum(F.col("tf") * F.col("n_ch")).cast("long").alias("n_chars"),
            F.sum(F.col("tf") * F.col("n_sub")).cast("long").alias("n_subwords"),
            F.round(
                F.sum(F.col("tf") * F.col("n_ch"))
                / F.sum(F.col("tf") * F.col("n_sub")),
                6,
            ).alias("compression"),
        )
    )
