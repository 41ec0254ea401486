"""Text primitives as Column expressions: tokenization, shingling, and
engine-portable deterministic hashing.

Design constraint: every hash here must be *reproducible in ANSI SQL* so the
DuckDB oracle can verify dedup/fingerprint operators value-for-value. Spark's
builtin murmur3/xxhash64 are not portable, so we use a polynomial rolling
hash over unicode codepoints with all arithmetic kept under 2^62 (DuckDB
BIGINT overflow errors; Spark would wrap silently — staying small keeps both
exact). All builders are pure Column expressions — JVM-side, codegen-able,
no Python in the hot path.

Constants: BASE=131 (classic polyhash base), MOD=2^31-1 (Mersenne prime) so
`a*x + b` with a,b < MOD stays < 2^62 in minhash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BASE = 131
HASH_MOD = (1 << 31) - 1  # 2147483647, Mersenne prime


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def char_codes(s: Column | str) -> Column:
    """Unicode codepoints of a string (Spark ascii() == DuckDB unicode())."""
    return F.transform(F.split(_c(s), ""), lambda ch: F.ascii(ch))


def poly_hash(s: Column | str, base: int = HASH_BASE, mod: int = HASH_MOD) -> Column:
    """Polynomial rolling hash over codepoints: fold acc*base+cp (mod m).

    Empty string hashes to 0. Matches DuckDB's
    ``list_reduce(codes, (a,c) -> (a*base+c) % mod)`` because the first
    fold step from init 0 yields the first codepoint unchanged.
    """
    return F.aggregate(
        char_codes(s),
        F.lit(0).cast("long"),
        lambda acc, cp: (acc * base + cp) % mod,
    )


def tokens(s: Column | str) -> Column:
    """Whitespace tokens, empties dropped (portable: DuckDB
    ``list_filter(string_split_regex(s,'\\s+'), t -> t <> '')``)."""
    return F.filter(F.split(_c(s), r"\s+"), lambda t: t != "")


def bpe_ish_tokens(s: Column | str) -> Column:
    """BPE-ish subword segmentation: runs of letters, runs of digits, or a
    single other non-space char — the classic GPT-2-style pre-tokenizer
    shape, as one portable regex."""
    return F.regexp_extract_all(_c(s), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0))


def word_ngrams(toks: Column, n: int, sep: str = " ") -> Column:
    """Sliding word n-grams joined by ``sep``; empty when len(toks) < n.

    Built as shift-and-zip: zip the token array with its own 1..n-1 shifted
    copies, concatenating as we go, then cut the n-1 partial tail grams.
    The naive form — transform(sequence(...), i -> concat_ws(slice(toks,
    i, n))) — re-evaluates the whole ``toks`` expression tree PER ELEMENT
    (lambda bodies get no common-subexpression elimination), which turned a
    linear scan into ~L re-tokenizations per document. Here ``toks``
    appears a constant ~n+2 times per row.

    DuckDB twin: list_transform(range(1, len-n+2), i ->
    array_to_string(toks[i:i+n-1], sep)) — same gram strings.
    """
    size = F.size(toks)
    grams = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(size - j, F.lit(0)))
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat_ws(sep, a, b))
    return F.when(size < n, F.array().cast("array<string>")).otherwise(
        F.slice(grams, 1, size - F.lit(n) + F.lit(1))
    )


def shingles(s: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column — the unit set for
    Jaccard/MinHash dedup."""
    return F.array_distinct(word_ngrams(tokens(s), n))


def minhash_perm(x: Column, a: int, b: int, mod: int = HASH_MOD) -> Column:
    """One universal-hash permutation h(x) = (a*x + b) mod p. With
    a,b,x < 2^31 the product stays < 2^62 — exact in both engines."""
    return (x * F.lit(a) + F.lit(b)) % F.lit(mod)


def minhash_params(k: int, seed: int = 42, mod: int = HASH_MOD) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficients for k permutations — a seeded LCG,
    not numpy, so the exact ints are trivially re-derivable anywhere."""
    out: list[tuple[int, int]] = []
    state = seed
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = state % (mod - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % mod
        out.append((a, b))
    return out

