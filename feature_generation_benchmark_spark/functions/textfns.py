"""Text-analysis column expressions — language ID, quality scoring, token
counting, fingerprinting (north-star extensions, SURVEY §7.2-M8).

Everything here is a pure Catalyst ``Column`` tree (built-in string/array
higher-order functions) — JVM-side, codegen-friendly, no Python at run
time. Each builder has an ANSI-SQL twin used by the DuckDB oracles; the
canonical tokenization rule is shared by both:
``lowercase → split on [^a-z0-9]+ → drop empties``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

#: "BPE-ish" token pattern: runs of letters, runs of digits, or single
#: punctuation marks — a cheap proxy for subword tokenizer unit counts.
BPE_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

#: Tiny per-language function-word lists for the n-gram/stopword language
#: heuristic (ordered dict: deterministic tie-break = first max in order).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "von", "mit", "ein", "auf", "zu"),
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "on"),
    "es": ("el", "los", "las", "y", "un", "una", "es", "para", "que", "por"),
    "fr": ("le", "les", "et", "une", "est", "pour", "dans", "que", "qui", "au"),
}


def tokens(text: Column | str) -> Column:
    """Canonical tokenization (see module docstring)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda x: x != F.lit(""))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_token_count(text: Column | str) -> Column:
    """Count of BPE-ish units (letters-run | digits-run | punct char)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_TOKEN_RE), F.lit(0)))


def char_class_count(text: Column | str, pattern: str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def stopword_hits(toks: Column, lang: str) -> Column:
    """Number of token INSTANCES that are stopwords of ``lang``."""
    vocab = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(vocab, t)))


def lang_scores(toks: Column) -> dict[str, Column]:
    return {lang: stopword_hits(toks, lang) for lang in LANG_STOPWORDS}


def lang_predict(toks: Column, unknown: str = "und") -> Column:
    """Argmax language by stopword hits; ties resolve to the first language
    in ``LANG_STOPWORDS`` order; all-zero scores → ``unknown``."""
    scores = lang_scores(toks)
    best = F.greatest(*scores.values())
    expr = F.lit(unknown)
    # build backwards so earlier langs win ties
    for lang in reversed(list(scores)):
        expr = F.when(
            (scores[lang] == best) & (best > F.lit(0)), F.lit(lang)
        ).otherwise(expr)
    return expr


def word_ngrams(toks: Column, n: int = 3) -> Column:
    """Word-level n-gram shingles (space-joined), empty array when the
    document has fewer than ``n`` tokens. 0-based Spark array indexing."""
    idx = F.sequence(F.lit(0), F.size(toks) - F.lit(n))
    shingled = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(k + 1)) for k in range(n)]
        ),
    )
    # guard: sequence(0, negative) would produce a DESCENDING sequence
    return F.when(F.size(toks) >= F.lit(n), shingled).otherwise(
        F.array().cast("array<string>")
    )


#: Modulus for the portable rolling fingerprint (fits BIGINT intermediate
#: arithmetic in every engine: h*31 + v < 2^63 for h < 1e9+7).
ROLLING_MOD = 1_000_000_007


def rolling_fingerprint(toks: Column) -> Column:
    """Order-sensitive polynomial rolling hash over the token sequence:
    ``h ← (h·31 + v(tok)) mod 1e9+7`` with ``v = ascii(first char)·1000 +
    length`` — a deliberately engine-portable token value (the SQL twin
    uses ``unicode()``/``len()``), so the oracle can verify the *rolling
    structure* exactly; swap ``v`` for ``xxhash64`` in production for
    collision strength. Left fold via ``aggregate`` — JVM-side, O(tokens).
    Empty docs hash to 0."""
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda h, t: (h * F.lit(31) + (F.ascii(t) * F.lit(1000) + F.length(t)))
        % F.lit(ROLLING_MOD),
    )


def normalize_text(text: Column | str) -> Column:
    """Fingerprint normalization: lowercase, collapse non-alphanumerics to
    single spaces, trim."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), TOKEN_SPLIT_RE, " "))


def fingerprint_md5(text: Column | str) -> Column:
    """Content fingerprint: md5 of normalized text (md5 is available and
    bit-identical in every engine — the portable choice for oracle-checked
    dedup; xxhash64 is the cheaper Spark-internal alternative)."""
    return F.md5(normalize_text(text))


def md5_prefix_long(c: Column) -> Column:
    """First 8 hex chars of md5 as a non-negative long — the engine-wide
    portable hash-to-integer idiom. The DuckDB twin is
    ``CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)``; keep BOTH sides of
    that contract here (8 hex chars, base-16, long) rather than at call
    sites so the prefix width can never drift per-operator."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def token_windows(toks: Column, width: int, step: int) -> Column:
    """Strided token windows as ``array<struct<chunk_idx, window>>`` —
    the shared flatMap core of fixed-window chunking (``doc_chunking``,
    overlapping) and chunk-granularity dedup (``dedup_chunk_exact``,
    non-overlapping): window k starts at ``k*step`` (0-based) and takes up
    to ``width`` tokens, so a trailing short window keeps every token
    covered. A window is emitted only if it ADDS uncovered tokens —
    i.e. window k (k ≥ 1) requires ``(k-1)*step + width < n`` (r6
    session-3 review: with width 64 / step 48 a 100-token doc previously
    emitted a second trailing chunk fully contained in the first — pure
    duplicated training text; full coverage never needs such a window).
    For ``step == width`` the bound reduces to the old ``start ≤ n-1``.
    Callers must ensure ``size(toks) > 0`` (``sequence(0, -1)`` would
    descend)."""
    n = F.size(toks)
    upper = F.greatest(
        F.lit(0), F.least(n - 1, n - F.lit(width - step + 1))
    )
    return F.transform(
        F.sequence(F.lit(0), upper, F.lit(step)),
        lambda s, i: F.struct(
            i.cast("long").alias("chunk_idx"),
            F.slice(toks, s + 1, width).alias("window"),
        ),
    )
