"""Property tests (SURVEY §5.4) for the tricky pure functions, each
checked against a direct Python reimplementation of the reference
semantics. One Spark job per hypothesis example would be glacial, so each
example is a LIST of inputs evaluated in a single DataFrame pass."""

from __future__ import annotations

import datetime
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wopen_spark.functions.dates import availability_calendar, consecutive_run
from wopen_spark.functions.strings import clean_image, normalize_slug, title_case

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# path-ish text: letters, digits, and the separators the cleaner reacts to
_pathish = st.text(
    alphabet="abXY01./-,_% éè",
    min_size=0,
    max_size=40,
)


def _ref_clean_image(image: str | None) -> str | None:
    """The reference's clean_image (update_open_data.py:32-47) verbatim
    semantics in plain Python."""
    if not isinstance(image, str):
        return None
    if image.find("storage"):
        image = image.split(",", 1)[0]
        image = os.path.splitext(image)[0]
        image = image.rsplit("/", 1)[-1]
        image = image.split("-", 1)[-1]
    else:
        image = image.split(",", 1)[0]
        image = os.path.splitext(image)[0]
    return image


@SET
@given(st.lists(_pathish | st.just("storage.x/a-b.jpg"), min_size=1, max_size=50))
def test_clean_image_matches_reference(spark, samples):
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = [r.c for r in df.select(clean_image(F.col("s")).alias("c")).collect()]
    want = [_ref_clean_image(s) for s in samples]
    # Spark's split("", ",") yields [""]; expression output for "" is ""
    assert got == want


@SET
@given(
    st.lists(
        st.lists(
            st.dates(datetime.date(2023, 12, 1), datetime.date(2024, 2, 15)),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_consecutive_run_matches_brute(spark, date_lists):
    df = spark.createDataFrame([(ds,) for ds in date_lists], "ds: array<date>")
    got = [r.c for r in df.select(consecutive_run(F.col("ds")).alias("c")).collect()]

    def brute(ds):
        o = sorted({d.toordinal() for d in ds})
        return all(b - a == 1 for a, b in zip(o, o[1:]))

    assert got == [brute(ds) for ds in date_lists]


@SET
@given(
    st.lists(
        st.lists(
            st.dates(datetime.date(2024, 1, 1), datetime.date(2024, 1, 10)),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_availability_is_range_minus_dates(spark, date_lists):
    start, end = "2024-01-01", "2024-01-10"
    df = spark.createDataFrame([(ds,) for ds in date_lists], "ds: array<date>")
    got = [
        r.c
        for r in df.select(
            availability_calendar(F.col("ds"), start, end).alias("c")
        ).collect()
    ]
    full = [datetime.date(2024, 1, 1) + datetime.timedelta(days=i) for i in range(10)]
    for out, ds in zip(got, date_lists):
        want = "|".join(
            f"{d.day}-{d.month:02d}-{d.year}" for d in full if d not in set(ds)
        )
        assert out == want


@SET
@given(st.lists(st.text(alphabet="aB cD-12éÈ%'l", max_size=30), min_size=1, max_size=50))
def test_title_case_matches_python(spark, samples):
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = [r.c for r in df.select(title_case(F.col("s")).alias("c")).collect()]
    assert got == [s.title() for s in samples]


@SET
@given(st.lists(st.text(alphabet="ab C-12éè%c3a9.", max_size=30), min_size=1, max_size=50))
def test_normalize_slug_idempotent(spark, samples):
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    once = df.select(normalize_slug(F.col("s")).alias("c"))
    twice = once.select(normalize_slug(F.col("c")).alias("c"))
    assert [r.c for r in once.collect()] == [r.c for r in twice.collect()]


def test_per_distinct_equals_direct_compute(spark):
    """_per_distinct(d, keys, build) must be row-for-row identical to
    computing the function on every row directly — clone collapse is a
    physical rewrite, never a semantic one. Exercised over a frame with
    heavy duplication, empty strings, and rows whose computed column the
    build side can drop (inner-join semantics)."""
    from pyspark.sql import functions as F

    from wopen_spark.queries.registry import _per_distinct

    rows = [(i, ["alpha", "beta", "", "gamma beta"][i % 4]) for i in range(200)]
    import pandas as pd

    d = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "txt"]))

    def build(keys):
        return keys.select(
            "txt", F.length("txt").alias("n"), F.upper("txt").alias("up")
        )

    collapsed = _per_distinct(d, ["txt"], build).select("id", "n", "up")
    direct = d.select(
        "id", F.length("txt").alias("n"), F.upper("txt").alias("up")
    )
    assert sorted(map(tuple, collapsed.collect())) == sorted(
        map(tuple, direct.collect())
    )


_wordy = st.lists(
    st.sampled_from(["fast", "slow", "big", "data", "key", "row", "the", "a"]),
    min_size=0,
    max_size=12,
).map(" ".join)


def _ref_shingles(text: str, n: int) -> set[str]:
    ws = text.lower().split()
    return {" ".join(ws[i : i + n]) for i in range(max(len(ws) - n + 1, 0))}


@SET
@given(st.lists(st.tuples(_wordy, _wordy), min_size=1, max_size=40))
def test_containment_and_jaccard_match_set_math(spark, pairs):
    """ngram_containment == |A∩B|/|A| and ngram_jaccard == |A∩B|/|A∪B|
    over distinct word-bigram sets, per the plain-Python set algebra;
    both collapse to 0.0 on empty shingle sets."""
    from wopen_spark.operators.dedup import ngram_containment, ngram_jaccard

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], ["i", "a", "b"]
    )
    got = {
        r.i: (r.c, r.j)
        for r in df.select(
            "i",
            ngram_containment(F.col("a"), F.col("b"), n=2).alias("c"),
            ngram_jaccard(F.col("a"), F.col("b"), n=2).alias("j"),
        ).collect()
    }
    for i, (a, b) in enumerate(pairs):
        sa, sb = _ref_shingles(a, 2), _ref_shingles(b, 2)
        want_c = round(len(sa & sb) / len(sa), 6) if sa else 0.0
        want_j = round(len(sa & sb) / len(sa | sb), 6) if (sa or sb) else 0.0
        assert abs(got[i][0] - want_c) < 1e-9, (a, b)
        assert abs(got[i][1] - want_j) < 1e-9, (a, b)


@SET
@given(st.lists(_wordy, min_size=1, max_size=40))
def test_sentiment_bounds_and_reference_math(spark, texts):
    """sentiment_score == (pos-neg)/(pos+neg) over whole-word lexicon
    hits, 0.0 with no hits, always within [-1, 1]."""
    import re

    from wopen_spark.functions.text import (
        SENTIMENT_NEG,
        SENTIMENT_POS,
        sentiment_score,
    )

    df = spark.createDataFrame(list(enumerate(texts)), ["i", "t"])
    got = {
        r.i: r.s
        for r in df.select(
            "i", sentiment_score(F.col("t")).alias("s")
        ).collect()
    }
    for i, t in enumerate(texts):
        pos = sum(len(re.findall(rf"\b{w}\b", t)) for w in SENTIMENT_POS)
        neg = sum(len(re.findall(rf"\b{w}\b", t)) for w in SENTIMENT_NEG)
        want = round((pos - neg) / (pos + neg), 6) if pos + neg else 0.0
        assert abs(got[i] - want) < 1e-9, t
        assert -1.0 <= got[i] <= 1.0


@SET
@given(
    st.lists(
        st.text(alphabet="abc ", min_size=1, max_size=8),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
def test_prefix_flags_match_quadratic_check(spark, texts):
    """prefix_contained_flags agrees with the O(n²) definition: a row is
    flagged iff its text is a strict prefix of ANY other row's text —
    the sorted-successor shortcut must lose nothing."""
    from wopen_spark.operators.dedup import prefix_contained_flags

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        r.doc_id: r.is_prefix
        for r in prefix_contained_flags(df, "text", "doc_id").collect()
    }
    for i, t in enumerate(texts):
        want = any(u != t and u.startswith(t) for u in texts)
        assert got[i] == want, (t, texts)


# corpora from a 4-token alphabet force heavy cross-text k-gram overlap
_tiny_texts = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12)
    .map(" ".join),
    min_size=1,
    max_size=8,
)


@SET
@given(corpora=st.lists(_tiny_texts, min_size=1, max_size=3))
def test_duplicate_spans_match_quadratic_reference(spark, corpora):
    """duplicate_kgram_spans == a direct quadratic Python reference:
    every k-gram occurring in >=2 distinct texts marks its positions;
    dup_tokens = |union of marked [i, i+k) intervals| per text."""
    from wopen_spark.operators.dedup import duplicate_kgram_spans

    k = 3
    for texts in corpora:
        texts = sorted(set(texts))
        df = spark.createDataFrame([(t,) for t in texts], ["text"])
        got = {
            r["text"]: (r["n_tokens"], r["dup_tokens"])
            for r in duplicate_kgram_spans(df, "text", k=k).collect()
        }
        toks = {t: t.split() for t in texts}
        grams: dict[str, set[str]] = {}
        for t, w in toks.items():
            for i in range(len(w) - k + 1):
                grams.setdefault(" ".join(w[i : i + k]), set()).add(t)
        dup = {g for g, owners in grams.items() if len(owners) > 1}
        want = {}
        for t, w in toks.items():
            covered = set()
            for i in range(len(w) - k + 1):
                if " ".join(w[i : i + k]) in dup:
                    covered.update(range(i, i + k))
            want[t] = (len(w), len(covered))
        assert got == want


@SET
@given(
    ints=st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=300),
    probes=st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=50),
    strs=st.lists(st.text(max_size=12), max_size=200),
)
def test_bloom_never_false_negative(ints, probes, strs):
    """Membership is NEVER lost: every inserted value tests positive in
    both the vectorized i64 build and the md5 string build (probe misses
    may false-positive — that's the contract — but not the reverse)."""
    import numpy as np

    from wopen_spark.snapshot_table import (
        _bloom_build_ints,
        _bloom_build_strs,
        _bloom_params,
        _bloom_test,
    )

    m = _bloom_params(max(len(ints), len(strs)))
    if ints:
        blob = _bloom_build_ints(np.array(ints, dtype=np.int64).astype(np.uint64), m)
        assert all(_bloom_test(blob, v, "i64") for v in ints)
        inserted = set(ints)
        fp = sum(_bloom_test(blob, p, "i64") for p in probes if p not in inserted)
        assert fp <= max(2, len(probes) // 2)  # sanity: not saturated
    if strs:
        blob = _bloom_build_strs(strs, m)
        assert all(_bloom_test(blob, v, "md5") for v in strs)


# ---- SQL MERGE parser round-trip: any clause structure rendered to the
# canonical statement text parses back to exactly itself. The generator
# draws conditions/expressions from a pool that includes the hazards the
# hand tests pin one-by-one (embedded commas in function calls, string
# literals containing alias-like prefixes and commas, qualified t./s.
# references) — the property covers their combinations.

_MERGE_CONDS = [
    None,
    "s.op = 'D'",
    "t.val > 10",
    "coalesce(s.x, t.x, 0) < 5",
    "s.tag = 's.not_a_ref, still one literal'",
]
_MERGE_EXPRS = [
    "s.val",
    "t.val + 1",
    "coalesce(s.a, t.b, 0)",
    "concat(s.name, ', ', t.name)",
    "'lit,with,commas'",
]
_COLS = ["val", "name", "x"]

# CASE WHEN .. THEN .. END inside conditions and SET expressions is the
# r8-review hazard: the regex splitter truncated the clause at the
# CASE's WHEN. The scanner parse must treat them as opaque.
_MERGE_CONDS = _MERGE_CONDS + [
    "CASE WHEN s.op = 'U' THEN true ELSE false END",
]
_MERGE_EXPRS = _MERGE_EXPRS + [
    "CASE WHEN s.val > t.val THEN s.val ELSE t.val END",
]
# insert VALUES expressions see s.* only (no target row exists)
_INSERT_EXPRS = [
    "s.val",
    "upper(s.name)",
    "coalesce(s.a, 0)",
    "CASE WHEN s.val > 0 THEN s.val ELSE 0 END",
    "'lit,with,commas'",
]


def _clause(actions):
    return st.builds(
        dict,
        action=st.sampled_from(actions),
        cond=st.sampled_from(_MERGE_CONDS),
        set=st.dictionaries(
            st.sampled_from(_COLS), st.sampled_from(_MERGE_EXPRS),
            min_size=1, max_size=3,
        ),
        values=st.one_of(
            st.none(),
            st.dictionaries(
                st.sampled_from(_COLS), st.sampled_from(_INSERT_EXPRS),
                min_size=1, max_size=3,
            ),
        ),
    )


@given(
    matched=st.lists(_clause(["update", "delete"]), max_size=3),
    not_matched=st.lists(_clause(["insert"]), max_size=2),
    by_source=st.lists(_clause(["update", "delete"]), max_size=2),
    keys=st.lists(st.sampled_from(["id", "k2", "k3"]), min_size=1, max_size=3, unique=True),
)
@settings(max_examples=120, deadline=None)
def test_merge_parser_roundtrip(matched, not_matched, by_source, keys):
    from wopen_spark.sql_dml import parse_merge

    if not (matched or not_matched or by_source):
        return  # statement needs >= 1 clause; parse_merge raises on none

    def norm(cl):
        out = {"action": cl["action"], "cond": cl["cond"]}
        if cl["action"] == "update":
            out["set"] = cl["set"]
        if cl["action"] == "insert" and cl["values"] is not None:
            out["values"] = cl["values"]
        return out

    def render(cl, kind):
        cond = f" AND {cl['cond']}" if cl["cond"] else ""
        if cl["action"] == "update":
            sets = ", ".join(f"{c} = {e}" for c, e in cl["set"].items())
            act = f"UPDATE SET {sets}"
        elif cl["action"] == "delete":
            act = "DELETE"
        elif cl["values"] is not None:
            cols = ", ".join(cl["values"])
            exprs = ", ".join(cl["values"].values())
            act = f"INSERT ({cols}) VALUES ({exprs})"
        else:
            act = "INSERT *"
        return f"WHEN {kind}{cond} THEN {act}"

    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    text = (
        f"MERGE INTO target t USING src_view s ON {on} "
        + " ".join(
            [render(c, "MATCHED") for c in matched]
            + [render(c, "NOT MATCHED") for c in not_matched]
            + [render(c, "NOT MATCHED BY SOURCE") for c in by_source]
        )
    )
    p = parse_merge(text)
    assert p["target"] == "target" and p["keys"] == keys
    assert p["matched"] == [norm(c) for c in matched]
    assert p["not_matched"] == [norm(c) for c in not_matched]
    assert p["not_matched_by_source"] == [norm(c) for c in by_source]
    assert not p["leftover"]


_UPD_EXPRS = [
    "val + 1",
    "upper(name)",
    "coalesce(x, 0)",
    "CASE WHEN val > 0 THEN val ELSE 0 END",
    "'lit,with,commas'",
    "concat(name, ', ', 'suffix')",
]
_UPD_WHERES = [
    None,
    "id % 7 = 3",
    "name = 'a,b'",
    "x IN (1, 2, 3)",
    "CASE WHEN id > 5 THEN true ELSE false END",
]


@given(
    sets=st.dictionaries(
        st.sampled_from(_COLS), st.sampled_from(_UPD_EXPRS),
        min_size=1, max_size=3,
    ),
    where=st.sampled_from(_UPD_WHERES),
    alias=st.sampled_from([None, "g", "tbl"]),
    qualify=st.booleans(),
)
@settings(max_examples=100, deadline=None)
def test_update_delete_parser_roundtrip(sets, where, alias, qualify):
    """UPDATE/DELETE statements rendered from any clause structure parse
    back to exactly themselves — same property the MERGE parser carries,
    covering CASE WHEN in SET/WHERE, literal commas, and alias
    stripping (qualified references come back bare)."""
    from wopen_spark.sql_dml import parse_delete, parse_update

    a = alias or "target"
    pre = f"{a}." if qualify and alias else ""
    set_text = ", ".join(f"{pre}{c} = {e}" for c, e in sets.items())
    where_text = f" WHERE {where}" if where else ""
    alias_text = f" {alias}" if alias else ""

    u = parse_update(f"UPDATE target{alias_text} SET {set_text}{where_text}")
    assert u["target"] == "target"
    assert u["set"] == sets
    assert u["where"] == where

    d = parse_delete(f"DELETE FROM target{alias_text}{where_text}")
    assert d["target"] == "target"
    assert d["where"] == where
