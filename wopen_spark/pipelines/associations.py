"""Associations acquisition chain (SURVEY §3.1) rebuilt Spark-first.

``custom_search_stage`` = custom_search_extraction.py: idempotence gate on
the date partition, RNA zip scan, broadcast nomenclature join, Paris
filter, keyword diff against already-searched terms, seeded shuffle +
quota, search-API fan-out, partitioned idempotent write.

``similarity_stage`` = get_similarity.py: per-date incremental loop over
unprocessed partitions, rank==1 filter, two per-row HTTP enrichments
(findmyfbid POST + facebook redirect), the reference's exact slug
normalization chain, fuzzy top-1 similarity against the day's slugs, a
partition write per date, then the full-table join + banding into
``associations_raw``.

Scale shape: the nomenclature join broadcasts (tiny dim); the Paris
filter and column pruning push into the scan; the per-date loop prunes on
the partition column; the fuzzy scoring is a broadcast cross join +
window (a day's batch is <=quota rows — the big-x-big path is
MinHash-LSH, operators.dedup). HTTP fan-outs are Arrow-batched
mapInPandas with bounded thread pools (operators.http_enrich).

Similarity score (SURVEY §2.12 #4): the reference's column is named
levenshtein_similarity but computed with fuzzywuzzy WRatio. Default is
normalized Levenshtein (pure Column, stays in codegen); set
``AssociationsConfig.similarity_scorer='wratio'`` for byte-parity with
the reference's scores (functions/fuzzy.py, difflib backend).
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wopen_spark.operators.http_enrich import EnrichConfig, Transport, http_enrich
from wopen_spark.operators.similarity import fuzzy_top1_join
from wopen_spark.sources.http import Opener, _default_opener, http_zip_csv_source
from wopen_spark.tables import Table

_SCHEMA_DIR = os.path.join(os.path.dirname(__file__), "schemas")

# custom_search_extraction.py:73-85 — the 38 selected RNA columns.
RNA_COLUMNS = [
    "id", "id_ex", "siret", "rup_mi", "gestion", "date_creat", "date_decla",
    "date_publi", "date_disso", "nature", "groupement", "titre",
    "titre_court", "objet", "objet_social1", "objet_social2",
    "adrs_complement", "adrs_numvoie", "adrs_repetition", "adrs_typevoie",
    "adrs_libvoie", "adrs_distrib", "adrs_codeinsee", "adrs_codepostal",
    "adrs_libcommune", "adrg_declarant", "adrg_complemid",
    "adrg_complemgeo", "adrg_libvoie", "adrg_distrib", "adrg_codepostal",
    "adrg_achemine", "adrg_pays", "dir_civilite", "siteweb", "publiweb",
    "observation", "position", "maj_time",
]

# custom_search_extraction.py:107-140 — byte-for-byte, including the
# literal backslash entry (quirk §2.12 #5: '\\’' can never match clean
# data) and the significant trailing spaces.
SOCIAL_CATEGORIES = [
    "culture, pratiques d\\’activités artistiques, culturelles ",
    "théâtre, marionnettes, cirque, spectacles de variété ",
    "chant choral, musique ",
    "Sports, activités de plein air ",
    "photographie, cinéma (dont ciné-clubs) ",
    "relaxation, sophrologie",
    "arts graphiques, bande dessinée, peinture, sculpture, architecture ",
    "danse ",
]

# Column order of the custom_search table (custom_search_extraction.py:201-202).
SEARCH_COLUMNS = [
    "searchTerms", "rank", "title", "snippet", "displayLink", "link",
    "queryTime", "totalResults", "cacheId", "count", "date_extract",
]

# One search hit: the callable returns a list of these dicts per term.
SearchFanout = Callable[[str], list[dict]]


@dataclass
class AssociationsConfig:
    keywords_nb: int = 100  # custom_search_extraction.py:32 daily quota
    shuffle_seed: int = 42  # O3 random.sample made reproducible
    today: str = ""  # 'YYYY-MM-DD'; required (tests pin it)
    # 'levenshtein' (engine default, pure Column) or 'wratio' (byte-parity
    # with the reference's fuzzywuzzy process.extract default — SURVEY
    # §2.12 #4, operators.similarity.wratio_column)
    similarity_scorer: str = "levenshtein"
    notifications: list[str] = field(default_factory=list)


def _sanitize(df: DataFrame) -> DataFrame:
    """space/colon/dash -> underscore, case preserved
    (custom_search_extraction.py:102-104)."""
    return df.toDF(
        *[c.replace(" ", "_").replace(":", "_").replace("-", "_") for c in df.columns]
    )


def custom_search_stage(
    spark: SparkSession,
    rna_zip_url: str,
    nomenclature: DataFrame,
    warehouse: str,
    search: SearchFanout,
    config: AssociationsConfig,
    opener: Opener = _default_opener,
) -> bool:
    """Run one daily acquisition; returns False when skipped (idempotent).

    ``nomenclature`` is the social-object lookup (the reference's remote
    xlsx, S3) already loaded as a DataFrame with a ``Code Objet Social``
    column — it broadcasts into join J1.
    """
    cs_table = Table(spark, "crm", "custom_search", warehouse)
    cs_table.create_partitioned(
        os.path.join(_SCHEMA_DIR, "custom_search.json"), "date_extract"
    )

    # idempotence gate (S5 + :59-66): one partition per calendar day
    if config.today in cs_table.partitions("date_extract"):
        config.notifications.append("Custom search File already processed today")
        return False

    rna = http_zip_csv_source(
        spark, rna_zip_url, columns=RNA_COLUMNS, opener=opener
    )
    code = nomenclature.withColumn("objet_social1", F.col("Code Objet Social"))
    joined = rna.join(F.broadcast(code), "objet_social1", "left")
    paris = joined.filter(
        F.coalesce(F.col("adrg_codepostal").rlike("^75"), F.lit(False))
    )
    paris = _sanitize(paris).withColumn(
        "filtered_cat",
        F.when(F.col("Objet_Social").isin(SOCIAL_CATEGORIES), "yes").otherwise("no"),
    )

    rna_table = Table(spark, "crm", "rna_waldec_filtered", warehouse)
    if not rna_table.exists():  # K3 conditional create (:151-155)
        rna_table.write(paris)

    wanted = paris.filter(F.col("Objet_Social").isin(SOCIAL_CATEGORIES))

    # A5: symmetric difference of to-search vs already-searched terms —
    # the reference's diff() is (union - intersection), NOT a plain
    # except: terms searched but no longer in the RNA extract come back.
    to_search = wanted.select(F.lower(F.col("titre")).alias("term")).distinct()
    searched = (
        cs_table.read().select(F.lower(F.col("searchTerms")).alias("term")).distinct()
    )
    remaining = to_search.join(searched, "term", "left_anti").unionByName(
        searched.join(to_search, "term", "left_anti")
    )

    batch = (
        remaining.orderBy(F.rand(config.shuffle_seed))  # O3, seeded
        .limit(config.keywords_nb)  # O2 quota
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for term in pdf["term"]:
                for hit in search(term):
                    rows.append({"searchTerms": term, **hit})
            yield pd.DataFrame(
                rows,
                columns=[
                    "searchTerms", "rank", "title", "snippet", "displayLink",
                    "link", "queryTime", "totalResults", "cacheId", "count",
                ],
            )

    hits_schema = (
        "searchTerms string, rank double, title string, snippet string, "
        "displayLink string, link string, queryTime string, "
        "totalResults long, cacheId string, count long"
    )
    results = batch.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        run, schema=hits_schema
    )
    results = results.withColumn("date_extract", F.to_date(F.lit(config.today)))
    results = results.select(*SEARCH_COLUMNS)

    cs_table.write_partition(
        config.today,
        "date_extract",
        results,
        os.path.join(_SCHEMA_DIR, "custom_search.json"),
    )
    config.notifications.append("Custom search API script has run")
    return True


def _reference_slug(col: F.Column) -> F.Column:
    """The reference's exact link_new normalization chain
    (get_similarity.py:131-141), including the typo'd '%c%a' pattern:
    last URL path segment, lowered, stripped, de-spaced, percent-encoded
    é fixed, digits and dashes removed."""
    c = F.regexp_extract(col, r"([^/.*/]+)/?$", 1)
    c = F.trim(F.lower(c))
    c = F.regexp_replace(c, " ", "")
    c = F.regexp_replace(c, "%c3%a9", "e")  # lowercased by the line above
    c = F.regexp_replace(c, "%c%a", "e")
    c = F.regexp_replace(c, r"\d+", "")
    return F.regexp_replace(c, "-", "")


def similarity_stage(
    spark: SparkSession,
    warehouse: str,
    fbid_transport: Callable[[], Transport],
    redirect_transport: Callable[[], Transport],
    config: AssociationsConfig,
) -> DataFrame:
    """Incremental similarity scoring + final associations_raw build."""
    sim_table = Table(spark, "crm", "similarity", warehouse)
    sim_table.create_partitioned(
        os.path.join(_SCHEMA_DIR, "similarity.json"), "date_extract"
    )
    cs_table = Table(spark, "crm", "custom_search", warehouse)

    done = set(sim_table.partitions("date_extract"))
    for date_string in cs_table.partitions("date_extract"):
        if date_string in done:
            continue  # idempotent per-date loop (get_similarity.py:89-103)
        day = cs_table.read().filter(
            F.col("date_extract") == F.to_date(F.lit(date_string))
        )
        day = day.filter(F.col("rank") == 1).withColumn(
            "titre", F.upper(F.col("searchTerms"))
        )
        # E1/E2 enrichment; sentinel '0' on failure, matching the reference
        day = http_enrich(
            day, "link", fbid_transport, out_col="Facebook_ID",
            config=EnrichConfig(sentinel="0"),
        )
        day = http_enrich(
            day, "Facebook_ID", redirect_transport, out_col="Facebook_URL",
            config=EnrichConfig(sentinel="0"),
        )
        # §2.12 #10: the sentinel compare happens on the string '0'
        day = day.withColumn(
            "link_new",
            F.when(F.col("Facebook_ID") == "0", F.col("link")).otherwise(
                F.col("Facebook_URL")
            ),
        ).withColumn("Facebook_new_URL", F.col("link_new"))
        day = (
            day.select(
                "titre", "searchTerms", "link", "link_new", "Facebook_ID",
                "Facebook_URL", "Facebook_new_URL", "date_extract",
            )
            .withColumn("link_new", _reference_slug(F.col("link_new")))
            .withColumn(
                "searchTerms",
                F.regexp_replace(F.trim(F.lower(F.col("searchTerms"))), " ", ""),
            )
        )
        # J8: each term scored against every slug of the day, keep best
        slugs = day.select(F.col("link_new").alias("slug")).distinct()
        best = fuzzy_top1_join(
            day.select("searchTerms").distinct(), slugs, "searchTerms", "slug",
            score_col="levenshtein_similarity", scorer=config.similarity_scorer,
        ).select("searchTerms", "levenshtein_similarity")
        day = day.join(F.broadcast(best), "searchTerms", "left")
        sim_table.write_partition(
            date_string, "date_extract", day,
            os.path.join(_SCHEMA_DIR, "similarity.json"),
        )

    # full-table join J2 + banding (get_similarity.py:163-204)
    rna = (
        Table(spark, "crm", "rna_waldec_filtered", warehouse)
        .read()
        .filter(F.col("filtered_cat") == "yes")  # sql/get_rna_waldec_filtered_data.sql:3
    )
    sim = sim_table.read()
    final = rna.join(sim, "titre", "left")
    final = final.withColumn(
        "check_levenshtein_similarity_facebook",
        # StringType from the start (the reference mixes float and string
        # in one pandas column — SURVEY §2.10)
        F.when(F.col("levenshtein_similarity") == 100, "fb_account")
        .when(
            (F.col("levenshtein_similarity") >= 70)
            & (F.col("levenshtein_similarity") < 100),
            "potential_fb_account",
        )
        .otherwise("no_fb_account"),
    ).withColumn("adrs_codepostal", F.col("adrs_codepostal").cast("string"))
    Table(spark, "crm", "associations_raw", warehouse).write(final)
    config.notifications.append("FB urls file updated to Cloud Storage & BigQuery")
    return final
