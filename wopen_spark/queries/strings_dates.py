"""String / date scalar-function queries (SURVEY §2.10, §4.3).

Exercises the engine's pure-Column function library against DuckDB
equivalents: slug normalization, capitalize, regex extract, image-path
cleaning, French date formatting, availability calendars, JSON extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wopen_spark.functions.dates import (
    _FR_DAYS,
    _FR_MONTHS,
    availability_calendar,
    consecutive_run,
    duration_label,
    french_date_str,
)
from wopen_spark.functions.strings import capitalize_first, clean_image, normalize_slug
from wopen_spark.queries.registry import _per_distinct, _t, query


# P1/§2.10 slug normalization (get_similarity.py:132-138) applied to part
# names; DuckDB needs the 'g' flag to match Spark's replace-all.
@query(
    "slug_normalize_parts",
    oracle="""
    SELECT p_partkey,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(lower(trim(p_name)), '%c3%a9|%c3%a8|%c3%aa', 'e', 'g'),
                   '%c3%a0', 'a', 'g'),
                 '[éèê]', 'e', 'g'),
               '[àâ]', 'a', 'g'),
             '[ \t]|[0-9]|-', '', 'g') AS slug
    FROM part ORDER BY p_partkey
    """,
)
def slug_normalize_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The slug is a function of p_name alone; the regex chain runs once
    per DISTINCT name and rows inherit via broadcast join (_per_distinct
    — the replicated large-SF part table has ~64 distinct names)."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        _per_distinct(
            p, ["p_name"],
            lambda t: t.select("p_name", normalize_slug(F.col("p_name")).alias("slug")),
        )
        .select("p_partkey", "slug")
        .orderBy("p_partkey")
    )


# str.capitalize() parity (assos_validation_retreatment.py:77) + initcap
# (.title()); DuckDB lacks initcap -> word-wise expression.
@query(
    "capitalize_part_names",
    oracle="""
    SELECT p_partkey,
           upper(p_name[1]) || lower(p_name[2:]) AS cap_first,
           array_to_string(
             list_transform(string_split(p_name, ' '),
                            w -> upper(w[1]) || lower(w[2:])), ' ') AS title_case
    FROM part ORDER BY p_partkey
    """,
)
def capitalize_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        _per_distinct(
            p, ["p_name"],
            lambda t: t.select(
                "p_name",
                capitalize_first(F.col("p_name")).alias("cap_first"),
                F.initcap(F.col("p_name")).alias("title_case"),
            ),
        )
        .select("p_partkey", "cap_first", "title_case")
        .orderBy("p_partkey")
    )


# regexp_extract (get_similarity.py:131, update_assos...py:99-103): pull the
# numeric id out of c_name ('Customer#000000042' shape).
@query(
    "extract_customer_number",
    oracle="""
    SELECT c_custkey,
           TRY_CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS name_num,
           split_part(c_name, '#', 1) AS name_prefix
    FROM customer ORDER BY c_custkey
    """,
)
def extract_customer_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract(F.col("c_name"), "([0-9]+)$", 1).cast("long").alias("name_num"),
        F.split(F.col("c_name"), "#").getItem(0).alias("name_prefix"),
    ).orderBy("c_custkey")


# E4 clean_image (update_open_data.py:32-47), full reference semantics:
# first of comma list -> drop extension -> (unless the string starts with
# 'storage') basename + strip through the first dash. Paths synthesized
# from part columns so both engines see identical input; every third row
# takes the storage-prefix branch.
@query(
    "clean_image_paths",
    oracle="""
    WITH paths AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 3 = 0
                  THEN 'storage.example.com/bkt/' || p_brand || '-' || replace(p_name, ' ', '-') || '.jpg'
                  ELSE 'https://cdn.example.com/' || p_brand || '/' || replace(p_name, ' ', '-')
                       || '.jpg,' || p_brand || '-alt.png' END AS image
      FROM part
    ),
    noextd AS (
      SELECT p_partkey, image,
             regexp_replace(split_part(image, ',', 1), '\\.[^./]*$', '') AS noext
      FROM paths
    )
    SELECT p_partkey,
           CASE WHEN starts_with(image, 'storage') THEN noext
                ELSE regexp_replace(
                       list_extract(string_split(noext, '/'), len(string_split(noext, '/'))),
                       '^[^-]*-', '') END AS cleaned
    FROM noextd
    ORDER BY p_partkey
    """,
)
def clean_image_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    image = F.when(
        F.col("p_partkey") % 3 == 0,
        F.concat(
            F.lit("storage.example.com/bkt/"),
            F.col("p_brand"),
            F.lit("-"),
            F.regexp_replace(F.col("p_name"), " ", "-"),
            F.lit(".jpg"),
        ),
    ).otherwise(
        F.concat(
            F.lit("https://cdn.example.com/"),
            F.col("p_brand"),
            F.lit("/"),
            F.regexp_replace(F.col("p_name"), " ", "-"),
            F.lit(".jpg,"),
            F.col("p_brand"),
            F.lit("-alt.png"),
        )
    )
    return (
        _per_distinct(
            p.withColumn("image", image).select("p_partkey", "image"),
            ["image"],
            lambda t: t.select("image", clean_image(F.col("image")).alias("cleaned")),
        )
        .select("p_partkey", "cleaned")
        .orderBy("p_partkey")
    )


# §4.3 hard spot #1: deterministic French '%A %d %B %Y' (process_open_data
# .py:95) — lookup arrays on both sides, no locale dependence anywhere.
_FR_DAYS_SQL = "[" + ", ".join(f"'{d}'" for d in _FR_DAYS) + "]"
_FR_MONTHS_SQL = "[" + ", ".join(f"'{m}'" for m in _FR_MONTHS) + "]"


@query(
    "french_order_dates",
    oracle=f"""
    SELECT o_orderkey,
           {_FR_DAYS_SQL}[isodow(o_orderdate)] || ' ' || strftime(o_orderdate, '%d') || ' ' ||
           {_FR_MONTHS_SQL}[month(o_orderdate)] || ' ' || strftime(o_orderdate, '%Y') AS date_fr
    FROM orders ORDER BY o_orderkey
    """,
)
def french_order_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~2.4k distinct order dates in 15M rows at sf10: the format chain
    runs per DISTINCT date, rows inherit via broadcast join."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        _per_distinct(
            o, ["o_orderdate"],
            lambda t: t.select(
                "o_orderdate", french_date_str(F.col("o_orderdate")).alias("date_fr")
            ),
        )
        .select("o_orderkey", "date_fr")
        .orderBy("o_orderkey")
    )


# Date parse/format round trip (process_open_data.py:59,86-87 formats).
@query(
    "date_roundtrip",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%d/%m/%Y') AS d_str,
           strftime(strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y'), '%Y-%m-%d') AS d_parsed,
           datediff('day', DATE '1995-01-01', o_orderdate::DATE) AS days_since_95
    FROM orders ORDER BY o_orderkey
    """,
)
def date_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    d_str = F.date_format(F.col("o_orderdate"), "dd/MM/yyyy")
    return (
        _per_distinct(
            o, ["o_orderdate"],
            lambda t: t.select(
                "o_orderdate",
                d_str.alias("d_str"),
                # string, not DATE: date-typed outputs stringify differently
                # across engines' pandas conversion (datetime64 vs date)
                F.date_format(F.to_date(d_str, "dd/MM/yyyy"), "yyyy-MM-dd").alias(
                    "d_parsed"
                ),
                F.datediff(
                    F.col("o_orderdate").cast("date"),
                    F.lit("1995-01-01").cast("date"),
                ).alias("days_since_95"),
            ),
        )
        .select("o_orderkey", "d_str", "d_parsed", "days_since_95")
        .orderBy("o_orderkey")
    )


# Availability calendar (process_open_data.py:50-70): fixed range minus each
# user's active dates, pipe-joined — sequence/array_except/array_join, all
# per-row array ops, no extra shuffle beyond the groupBy.
@query(
    "user_availability_jan2024",
    oracle="""
    WITH user_dates AS (
      SELECT user_id, list_sort(list(DISTINCT ts::DATE)) AS dates
      FROM events WHERE ts < TIMESTAMP '2024-02-01' GROUP BY user_id
    )
    SELECT user_id,
           array_to_string(
             list_transform(
               list_filter(
                 list_transform(range(TIMESTAMP '2024-01-01', TIMESTAMP '2024-02-01', INTERVAL 1 DAY),
                                x -> x::DATE),
                 d -> NOT list_contains(dates, d)),
               d -> strftime(d, '%d-%m-%Y')), '|') AS availability,
           len(dates) AS n_active_days,
           datediff('day', list_min(dates), list_max(dates)) = len(dates) - 1 AS is_consecutive,
           len(dates)::VARCHAR || CASE WHEN len(dates) = 1 THEN ' jour' ELSE ' jours' END AS duration
    FROM user_dates ORDER BY user_id
    """,
)
def user_availability_jan2024(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("ts") < F.lit("2024-02-01").cast("timestamp"))
    dates = F.array_sort(F.collect_set(F.to_date("ts")))
    agg = ev.groupBy("user_id").agg(dates.alias("dates"))
    n_days = F.size("dates")
    return agg.select(
        "user_id",
        availability_calendar(
            F.col("dates"), start="2024-01-01", end="2024-01-31", out_format="dd-MM-yyyy"
        ).alias("availability"),
        n_days.alias("n_active_days"),
        consecutive_run(F.col("dates")).alias("is_consecutive"),
        duration_label(n_days).alias("duration"),
    ).orderBy("user_id")


# JSON extraction from the events props column (engine completeness; the
# reference pre-flattens JSON via advertools, SURVEY §2.10 "JSON: none").
@query(
    "json_props_stats",
    oracle="""
    SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY k_mod ORDER BY k_mod
    """,
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level aggregate: reduce on the raw props string FIRST (one
    map-side-combined shuffle, exact decimal partial sums), then parse
    JSON once per DISTINCT props (~100 at sf10, not 10M) and re-combine.
    Decimal sums re-associate exactly, so the oracle hash is unchanged."""
    ev = _t(spark, sf_dir, "events")
    per_props = ev.groupBy("props").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("val"),
    )
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        per_props.withColumn("k_mod", k % 10)
        .groupBy("k_mod")
        .agg(
            F.sum("n").alias("n"),
            F.sum("val").cast("double").alias("total_value"),
        )
        .orderBy("k_mod")
    )
