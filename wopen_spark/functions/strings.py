"""String functions (SURVEY §2.10, §2.3 P1).

All pure Column expressions — chains of ``regexp_replace`` / ``substring``
etc. stay in whole-stage codegen and cost nothing extra at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Column-name sanitization map (process_open_data.py:39-43,
# custom_search_extraction.py:102-104, wp_export_data.py:52-65): accented
# chars to ascii, punctuation/space to underscore.
_NAME_ACCENTS = {"é": "e", "è": "e", "ê": "e", "à": "a", "ç": "c", "ô": "o", "î": "i", "û": "u"}
_NAME_PUNCT = [" ", "'", '"', "-", ":", ";", ",", "(", ")", "/", "."]


def sanitize_column_name(name: str) -> str:
    out = name.lower()
    for src, dst in _NAME_ACCENTS.items():
        out = out.replace(src, dst)
    for ch in _NAME_PUNCT:
        out = out.replace(ch, "_")
    while "__" in out:
        out = out.replace("__", "_")
    return out.strip("_")


def sanitize_columns(df: DataFrame) -> DataFrame:
    """P1: rename every column through :func:`sanitize_column_name`."""
    return df.toDF(*[sanitize_column_name(c) for c in df.columns])


def normalize_slug(col: Column) -> Column:
    """URL-slug normalization chain (get_similarity.py:132-138): lower,
    trim, drop URL-encoded accents, drop spaces/digits/dashes — used to
    compare Facebook URL slugs against association names.
    """
    c = F.lower(F.trim(col))
    c = F.regexp_replace(c, "%c3%a9|%c3%a8|%c3%aa", "e")  # é è ê percent-encoded
    c = F.regexp_replace(c, "%c3%a0", "a")
    c = F.regexp_replace(c, "[éèê]", "e")
    c = F.regexp_replace(c, "[àâ]", "a")
    c = F.regexp_replace(c, "[ \\t]", "")
    c = F.regexp_replace(c, "[0-9]", "")
    c = F.regexp_replace(c, "-", "")
    return c


def clean_image(col: Column) -> Column:
    """Image-path cleaner (update_open_data.py:32-47), exact semantics:
    first of a comma-separated list, extension dropped (splitext: last dot
    of the final path component, leading-dot names keep their dot), then —
    only when the string does NOT start with ``storage`` (the reference
    tests ``image.find("storage")``, falsy solely at index 0) — basename
    and everything up to the first ``-`` removed.

    The reference does this row-by-row in Python; here it is one
    expression chain (E4 in SURVEY §2.11 — "pure Column expr, no UDF").
    """
    first = F.split(col, ",").getItem(0)
    # splitext parity: strip the last dot-suffix of the final path
    # component unless that component is all dots before it (".bashrc",
    # "..") — the bounded lookbehind requires a non-dot char anywhere
    # earlier in the component ("a..b" -> "a.", like os.path.splitext)
    noext = F.regexp_replace(first, r"(?<=[^/.][^/]{0,512})\.[^./]*$|(?<=[^/.])\.[^./]*$", "")
    base = F.element_at(F.split(noext, "/"), -1)
    dashless = F.element_at(F.split(base, "-", 2), -1)
    return F.when(col.startswith("storage"), noext).otherwise(dashless)


def title_case(col: Column) -> Column:
    """Python ``str.title()`` parity (assos_with_similarity...py:78,
    assos_validation_retreatment.py:77): uppercase every letter that
    follows a non-letter — unlike ``initcap``, which only capitalizes
    after whitespace (``l'eglise`` -> ``L'Eglise`` under title()).

    Split at every letter/non-letter boundary, capitalize each token's
    first char, lower the rest, re-join. Pure expression, codegen-friendly.
    """
    boundary = (
        r"(?<=[^A-Za-zÀ-ÖØ-öø-ÿ])(?=[A-Za-zÀ-ÖØ-öø-ÿ])"
        r"|(?<=[A-Za-zÀ-ÖØ-öø-ÿ])(?=[^A-Za-zÀ-ÖØ-öø-ÿ])"
    )
    toks = F.split(col, boundary)
    return F.array_join(
        F.transform(
            toks,
            lambda t: F.concat(
                F.upper(F.substring(t, 1, 1)), F.lower(t.substr(F.lit(2), F.length(t)))
            ),
        ),
        "",
    )


def capitalize_first(col: Column) -> Column:
    """Python ``str.capitalize()`` parity (assos_validation_retreatment.py:77):
    first char upper, rest lower — unlike ``initcap`` which title-cases
    every word.
    """
    return F.concat(F.upper(F.substring(col, 1, 1)), F.lower(col.substr(F.lit(2), F.length(col))))
