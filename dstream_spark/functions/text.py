"""Text-analysis functions for the training-data pipeline: token
counting, quality scoring, language-ID heuristic, fingerprinting.

All JVM-side built-ins (split/size/transform/md5/…): no Python in the
hot path, whole-stage-codegen friendly, and each has an exact DuckDB
SQL translation used as the oracle. At 100 TB these run as a single
scan + project with column pruning (only ``text`` is read).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic marker vocabularies for the language-vote heuristic.
# The fixture corpus is synthetic (one shared vocabulary), so the
# point is the deterministic scoring machinery, not linguistic truth.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "table", "row"),
    "de": ("data", "batch", "group"),
    "fr": ("query", "line", "part"),
    "es": ("spark", "stream", "window"),
    "zh": ("vector", "hash", "merge"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to")


def tokens(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count (empty string → 1 like SQL split).

    Computed as space-count + 1: split on the single-space regex
    always yields (#spaces + 1) tokens (empty tokens kept), so this
    is exactly size(split(text, ' ')) without allocating the token
    array per row — the same count at a fraction of the cost in the
    streaming transform hot loop (guide §1.2 per-task work)."""
    c = F.col(text_col)
    return (F.length(c) - F.length(F.replace(c, F.lit(" "))) + 1).cast("int")


def char_count(text_col: str = "text") -> Column:
    return F.length(F.col(text_col)).cast("int")


def avg_token_len(text_col: str = "text") -> Column:
    """Mean token length, rounded for cross-engine float stability.

    Closed form: Σ len(token) == length(text) − (n_tokens − 1), since
    every space is a delimiter. The old aggregate(transform(...)) HOF
    fold summed exact integers in doubles (every partial sum an
    integer < 2^53, so the fold was exact), hence this single
    expression is bit-identical — and codegen'd instead of
    interpreted per element."""
    c = F.col(text_col)
    n = token_count(text_col).cast("double")
    total = (F.length(c).cast("double") - (n - 1))
    return F.round(total / n, 6)


def _count_in_set(toks_text_col: str, words: tuple[str, ...]) -> Column:
    """COUNT of tokens ∈ words — regexp form: non-consuming lookaround
    matches on the space-padded text count every space-delimited
    occurrence (including adjacent ones that a replace()-based count
    would miss: in ' the the ' both match because the lookbehind does
    not consume the shared space). Exactly equals
    size(filter(split(text,' '), t -> t IN words)) — each token
    position matches at most one alternative in full — without the
    interpreted higher-order filter per row."""
    padded = F.concat(F.lit(" "), F.col(toks_text_col), F.lit(" "))
    pat = "(?<= )(" + "|".join(words) + ")(?= )"
    return F.regexp_count(padded, F.lit(pat))


def stopword_count(text_col: str = "text") -> Column:
    return _count_in_set(text_col, STOPWORDS).cast("int")


def quality_score(text_col: str = "text") -> Column:
    """Composite quality heuristic ∈ [0,1]: rewards moderate length
    and penalizes stopword-heavy text. Deterministic closed form:
      0.5 * min(n_tokens/100, 1) + 0.5 * (1 - stopword_ratio)
    """
    n = token_count(text_col).cast("double")
    sw = stopword_count(text_col).cast("double")
    return F.round(0.5 * F.least(n / 100.0, F.lit(1.0)) + 0.5 * (1.0 - sw / n), 6)


def lang_scores(text_col: str = "text") -> list[Column]:
    """One marker-hit count per language, aliased lang_<code>."""
    return [
        _count_in_set(text_col, words).cast("int").alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    ]


def predicted_lang(text_col: str = "text") -> Column:
    """Argmax language with deterministic lexicographic tiebreak:
    greatest (score, lang-code) pair wins — same rule in the oracle."""
    pairs = [
        F.struct(
            _count_in_set(text_col, words).cast("int").alias("s"),
            F.lit(lang).alias("l"),
        )
        for lang, words in LANG_MARKERS.items()
    ]
    return F.greatest(*pairs).getField("l")


# BPE-ish pre-tokenizer: letter runs / digit runs / punctuation runs —
# the split a byte-pair tokenizer applies before merges. Portable
# regex subset (identical under Java regex and RE2/DuckDB).
BPE_SPLIT_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"


def bpe_tokens(text_col: str = "text") -> Column:
    """Sub-word pre-tokens as array<string> (group 0 = whole match)."""
    return F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_RE), F.lit(0))


def bpe_token_count(text_col: str = "text") -> Column:
    return F.size(bpe_tokens(text_col)).cast("int")


# Ordered BPE merge table (the fixture's "merges.txt"): rank order is
# the application order, exactly as a trained byte-pair tokenizer
# applies its merges. Chosen for the fixture vocabulary so merges
# actually fire (the/order/stream/filter/...).
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"),
    ("th", "e"),
    ("e", "r"),
    ("i", "n"),
    ("a", "t"),
    ("o", "r"),
    ("s", "t"),
    ("a", "n"),
    ("r", "e"),
    ("o", "w"),
)

# Passes per merge rule. replace() is a single left-to-right
# non-overlapping pass on both engines, which can miss alternating
# occurrences ("x a b a b" → first match consumes the shared
# delimiter); a second pass closes what the first left adjacent.
# The operator's DEFINED semantics are "apply each rule as
# BPE_MERGE_PASSES delimiter-safe replace passes, in rank order" —
# deterministic and bit-identical on Spark and DuckDB by construction
# (both engines' replace() has the same single-pass contract).
BPE_MERGE_PASSES = 2


def merged_symbol_count(token: Column) -> Column:
    """Symbol count of one pre-token after applying BPE_MERGES.

    The token is spelled as space-delimited characters wrapped in
    spaces (" h e l l o "), each merge (a, b) is the plain-substring
    replace " a b " → " ab " (delimiters on both sides, so a merged
    multi-char symbol can never be split by a later rule matching its
    suffix/prefix), and the count is the remaining symbol total. All
    JVM-side string built-ins — no UDF in the hot path."""
    s = F.concat(F.lit(" "), F.regexp_replace(token, "(.)", "$1 "))
    for a, b in BPE_MERGES:
        for _ in range(BPE_MERGE_PASSES):
            s = F.replace(s, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
    return F.size(F.split(F.trim(s), " ")).cast("int")


def merged_symbol_count_sql(var: str) -> str:
    """The DuckDB expression computing merged_symbol_count over lambda
    variable ``var`` — generated from the SAME merge table so the
    oracle can never drift from the operator."""
    s = f"' ' || regexp_replace({var}, '(.)', '\\1 ', 'g')"
    for a, b in BPE_MERGES:
        for _ in range(BPE_MERGE_PASSES):
            s = f"replace({s}, ' {a} {b} ', ' {a}{b} ')"
    return f"len(string_split(trim({s}), ' '))"


def fingerprint(text_col: str = "text", prefix_tokens: int = 8) -> Column:
    """Document fingerprint: md5 over the first-k-token prefix — a
    cheap normalization-collision fingerprint (near-dup blocking key).
    """
    prefix = F.concat_ws(" ", F.slice(tokens(text_col), 1, prefix_tokens))
    return F.md5(prefix)
