"""fuzzywuzzy-parity string scorers (J8 exact-score path, SURVEY §2.12 #4).

The reference scores every search term against every slug with
``process.extract(term, slugs, limit=1)`` (get_similarity.py:148-152),
whose default scorer is ``WRatio``. Its requirements pin
``fuzzywuzzy==0.18.0`` with NO ``python-Levenshtein``
(requirements.txt:19), so it ran fuzzywuzzy's pure-Python backend:
``difflib.SequenceMatcher.ratio()``. Re-deriving the public WRatio
algorithm on stdlib difflib therefore reproduces the reference's scores
exactly, with zero third-party deps.

Components (all return ints in [0, 100]):

- ``ratio``             — 2·M/T SequenceMatcher similarity;
- ``partial_ratio``     — best window of the longer string vs the shorter;
- ``token_sort_ratio``  — ratio of the space-joined sorted token lists;
- ``token_set_ratio``   — max ratio over intersection/difference strings;
- partial_* variants    — same constructions scored with partial_ratio;
- ``wratio``            — the weighted combination fuzzywuzzy dispatches
  to by default (scales 0.95 / 0.9 / 0.6 chosen by length ratio).

These are driver/worker-side scalar functions; the Spark entry point is
``operators.similarity.fuzzy_top1_join(scorer='wratio')`` which applies
them in an Arrow-batched pandas UDF (never row-at-a-time Python UDFs).
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

_NON_WORD = re.compile(r"\W", re.UNICODE)


def full_process(s: str | None) -> str:
    """fuzzywuzzy's default preprocessor: non-word chars (underscore is a
    word char) to spaces, lowercase, strip."""
    if s is None:
        return ""
    return _NON_WORD.sub(" ", str(s)).lower().strip()


def _intr(x: float) -> int:
    return int(round(x))


def ratio(s1: str, s2: str) -> int:
    if not s1 and not s2:
        return 100
    return _intr(100 * SequenceMatcher(None, s1, s2).ratio())


def partial_ratio(s1: str, s2: str) -> int:
    """Score the shorter string against each same-length window of the
    longer one that a matching block aligns, keep the best."""
    shorter, longer = (s1, s2) if len(s1) <= len(s2) else (s2, s1)
    if not shorter:
        return 100 if not longer else 0
    blocks = SequenceMatcher(None, shorter, longer).get_matching_blocks()
    best = 0.0
    for _short_start, long_start, _size in blocks:
        start = max(long_start - _short_start, 0)
        window = longer[start : start + len(shorter)]
        r = SequenceMatcher(None, shorter, window).ratio()
        if r > 0.995:
            return 100
        best = max(best, r)
    return _intr(100 * best)


def _token_sort_prep(s: str) -> str:
    return " ".join(sorted(s.split())).strip()


def token_sort_ratio(s1: str, s2: str) -> int:
    return ratio(_token_sort_prep(s1), _token_sort_prep(s2))


def partial_token_sort_ratio(s1: str, s2: str) -> int:
    return partial_ratio(_token_sort_prep(s1), _token_sort_prep(s2))


def _token_set_parts(s1: str, s2: str) -> tuple[str, str, str]:
    t1, t2 = set(s1.split()), set(s2.split())
    sect = " ".join(sorted(t1 & t2))
    combined_1 = (sect + " " + " ".join(sorted(t1 - t2))).strip()
    combined_2 = (sect + " " + " ".join(sorted(t2 - t1))).strip()
    return sect.strip(), combined_1, combined_2


def token_set_ratio(s1: str, s2: str) -> int:
    sect, c1, c2 = _token_set_parts(s1, s2)
    return max(ratio(sect, c1), ratio(sect, c2), ratio(c1, c2))


def partial_token_set_ratio(s1: str, s2: str) -> int:
    sect, c1, c2 = _token_set_parts(s1, s2)
    return max(partial_ratio(sect, c1), partial_ratio(sect, c2), partial_ratio(c1, c2))


def wratio(s1: str | None, s2: str | None) -> int:
    """fuzzywuzzy ``WRatio`` on the difflib backend — the reference's
    default scorer in ``process.extract`` (get_similarity.py:148)."""
    p1, p2 = full_process(s1), full_process(s2)
    if not p1 or not p2:
        return 0
    unbase_scale = 0.95
    partial_scale = 0.90
    base = ratio(p1, p2)
    len_ratio = max(len(p1), len(p2)) / min(len(p1), len(p2))
    try_partial = len_ratio >= 1.5
    if len_ratio > 8:
        partial_scale = 0.60
    if try_partial:
        partial = partial_ratio(p1, p2) * partial_scale
        ptsor = partial_token_sort_ratio(p1, p2) * unbase_scale * partial_scale
        ptser = partial_token_set_ratio(p1, p2) * unbase_scale * partial_scale
        return _intr(max(base, partial, ptsor, ptser))
    tsor = token_sort_ratio(p1, p2) * unbase_scale
    tser = token_set_ratio(p1, p2) * unbase_scale
    return _intr(max(base, tsor, tser))
