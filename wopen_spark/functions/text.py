"""Text-analysis functions for training-data pipelines.

Beyond the reference's surface (which has no text analytics), these are
the operators a 100 TB document pipeline needs: language ID, quality
scoring, token counting, fingerprinting. All pure Column expressions —
they run in whole-stage codegen over the ``documents`` table with zero
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/stopword heuristic.
# Deterministic + SQL-expressible (same counts computable in any engine).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "fr": ["le", "la", "et", "les", "de"],
    "es": ["el", "la", "los", "que", "de"],
    "de": ["der", "die", "und", "das", "ist"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# A BPE-ish word/number/punctuation tokenizer regex: words, numbers,
# or single non-space symbols.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _word_count(col: Column, word: str) -> Column:
    """Occurrences of ``word`` as a whole word."""
    return F.regexp_count(col, F.lit(rf"\b{word}\b"))


def language_id(col: Column) -> Column:
    """Heuristic language ID: the language whose marker stopwords occur
    most often; ties break alphabetically; no markers at all → 'und'.
    """
    scores = [
        (lang, sum_markers)
        for lang, words in sorted(LANG_MARKERS.items())
        for sum_markers in [
            sum([_word_count(col, w) for w in words[1:]], _word_count(col, words[0]))
        ]
    ]
    best_score = None
    best_lang = None
    for lang, score in scores:
        if best_score is None:
            best_score, best_lang = score, F.lit(lang)
        else:
            take = score > best_score
            best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
            best_score = F.when(take, score).otherwise(best_score)
    return F.when(best_score > 0, best_lang).otherwise(F.lit("und"))


def token_count(col: Column) -> Column:
    """Token count under the BPE-ish regex tokenizer."""
    return F.regexp_count(col, F.lit(TOKEN_REGEX))


def whitespace_token_count(col: Column) -> Column:
    """Plain whitespace token count."""
    return F.size(F.split(F.trim(col), r"\s+"))


def quality_score(col: Column) -> Column:
    """Document quality in [0,1]: mix of length band, alpha ratio, and
    stopword ratio — the standard cheap pre-filter for web-scale corpora.

    score = 0.4*length_ok + 0.3*alpha_ratio + 0.3*min(1, stopword_ratio*8)
    """
    n = F.length(col)
    length_ok = F.when((n >= 50) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    # regexp_count, not size(split(...)): split('') yields [''] (count 1)
    # while a match count gives 0 — the latter is engine-portable
    words = F.regexp_count(col, F.lit(r"\S+"))
    stop_hits = sum(
        [_word_count(col, w) for w in STOPWORDS[1:]], _word_count(col, STOPWORDS[0])
    )
    stop_ratio = F.when(words > 0, stop_hits / words).otherwise(F.lit(0.0))
    stop_term = F.least(F.lit(1.0), stop_ratio * 8)
    return F.round(0.4 * length_ok + 0.3 * alpha_ratio + 0.3 * stop_term, 6)


def doc_fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 over the normalized text
    (lowercase, collapsed whitespace). Engine-portable (md5 is identical
    everywhere), used as the exact-dedup key.
    """
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(norm)
