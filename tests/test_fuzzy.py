"""WRatio parity tests.

The component scores are pinned to PUBLISHED fuzzywuzzy values (README /
test-suite examples), which grounds the re-derived difflib-backend
algorithm (wopen_spark/functions/fuzzy.py) against the library the
reference actually ran (fuzzywuzzy==0.18.0 without python-Levenshtein,
requirements.txt:19 — i.e. the pure-Python SequenceMatcher backend).
The wratio_top1_assoc_slugs oracle then locks full-pipeline scores.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from wopen_spark.functions.fuzzy import (
    full_process,
    partial_ratio,
    ratio,
    token_set_ratio,
    token_sort_ratio,
    wratio,
)


# (s1, s2, expected) — published fuzzywuzzy examples
PUBLISHED_RATIO = [
    ("this is a test", "this is a test!", 97),
    ("New York Mets", "New York Meats", 96),
    ("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear", 91),
]
PUBLISHED_PARTIAL = [
    ("this is a test", "this is a test!", 100),
    ("yankees", "new york yankees", 100),
]
PUBLISHED_TOKEN_SORT = [
    ("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear", 100),
    ("new york mets vs atlanta braves", "atlanta braves vs new york mets", 100),
]
PUBLISHED_TOKEN_SET = [
    ("fuzzy was a bear", "fuzzy fuzzy was a bear", 100),
]
PUBLISHED_WRATIO = [
    ("this is a test", "this is a test!", 100),  # punctuation processed away
    ("new york mets vs atlanta braves", "atlanta braves vs new york mets", 95),
    ("mets", "new york mets", 90),  # substring -> partial * 0.9
]


@pytest.mark.parametrize("s1,s2,expected", PUBLISHED_RATIO)
def test_ratio_published(s1, s2, expected):
    assert ratio(s1, s2) == expected


@pytest.mark.parametrize("s1,s2,expected", PUBLISHED_PARTIAL)
def test_partial_ratio_published(s1, s2, expected):
    assert partial_ratio(s1, s2) == expected


@pytest.mark.parametrize("s1,s2,expected", PUBLISHED_TOKEN_SORT)
def test_token_sort_published(s1, s2, expected):
    assert token_sort_ratio(s1, s2) == expected


@pytest.mark.parametrize("s1,s2,expected", PUBLISHED_TOKEN_SET)
def test_token_set_published(s1, s2, expected):
    assert token_set_ratio(s1, s2) == expected


@pytest.mark.parametrize("s1,s2,expected", PUBLISHED_WRATIO)
def test_wratio_published(s1, s2, expected):
    assert wratio(s1, s2) == expected


def test_full_process_keeps_unicode_word_chars():
    # \W with re.UNICODE: accented letters and underscores are word chars
    assert full_process("Père-Lachaise_75!") == "père lachaise_75"
    assert full_process(None) == ""


def test_wratio_empty_and_none():
    assert wratio("", "x") == 0
    assert wratio(None, "x") == 0
    assert wratio("!!!", "abc") == 0  # processes to empty


@given(st.text(max_size=40), st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_wratio_properties(a, b):
    # NOTE: WRatio is deliberately NOT asserted symmetric — difflib's
    # SequenceMatcher.ratio() is argument-order-sensitive in edge cases
    # ('1010' vs '00:0:0') and fuzzywuzzy inherits that.
    s = wratio(a, b)
    assert 0 <= s <= 100
    if full_process(a) and full_process(a) == full_process(b):
        assert s == 100


def test_fuzzy_top1_join_wratio_scorer(spark):
    from wopen_spark.operators.similarity import fuzzy_top1_join

    left = spark.createDataFrame([("petanque",), ("ASSO ROCK PARIS",)], ["term"])
    right = spark.createDataFrame(
        [("petanqueparis11",), ("assorockparis",), ("collectifdanse",)], ["slug"]
    )
    out = {
        r.term: (r.slug, r.similarity)
        for r in fuzzy_top1_join(left, right, "term", "slug", scorer="wratio").collect()
    }
    assert out["petanque"] == ("petanqueparis11", 90.0)
    assert out["ASSO ROCK PARIS"] == ("assorockparis", 93.0)
    with pytest.raises(ValueError, match="scorer"):
        fuzzy_top1_join(left, right, "term", "slug", scorer="nope")
