"""Human-validation loop (SURVEY §3.1 tail): the two Sheets scripts plus
the associations update script, with Google Sheets modelled as a pluggable
snapshot store (S6/K5 — an external system, not engine core).

``assos_to_sheet`` = assos_with_similarity_not_validated_yet_to_spreadsheets.py
``validation_retreatment`` = assos_validation_retreatment.py
``update_assos`` = update_assos_validation_retreatment.py

Order-dependent reference semantics (SURVEY §2.12 #8, §4.3 #3) are made
explicit: the sheet hand-off index is synthesized as a row_number over the
output sort key, and dedup-keep-last rides an explicit source-order column
(past snapshot = 0, fresh rows = 1).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wopen_spark.functions.strings import capitalize_first, clean_image, title_case
from wopen_spark.operators.http_enrich import EnrichConfig, Transport, http_enrich
from wopen_spark.sources.files import csv_sink, csv_source
from wopen_spark.tables import Table

_SCHEMA_DIR = os.path.join(os.path.dirname(__file__), "schemas")


class CsvSheetStore:
    """File-backed stand-in for the Google Sheets worksheets: one CSV per
    worksheet name. ``upload(clean=True)`` semantics = full overwrite."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _path(self, wks: str) -> str:
        return os.path.join(self.root, f"{wks}.csv")

    def exists(self, wks: str) -> bool:
        return os.path.exists(self._path(wks))

    def download(self, wks: str) -> DataFrame:
        return csv_source(self.spark, self._path(wks), sep=";")

    def upload(self, df: DataFrame, wks: str) -> None:
        csv_sink(df, self._path(wks), sep=";")


@dataclass
class ValidationConfig:
    today: str = ""  # 'YYYY-MM-DD', pinned by tests
    notifications: list[str] = field(default_factory=list)


def assos_to_sheet(
    spark: SparkSession, warehouse: str, sheets: CsvSheetStore, config: ValidationConfig
) -> DataFrame:
    """Push not-yet-validated candidate associations to the check sheet."""
    raw = Table(spark, "crm", "associations_raw", warehouse).read()

    # J7 semi join: manual additions listed in the sheet
    to_add_titles = sheets.download("assos_to_add").select("titre")
    assos_to_add = raw.join(to_add_titles, "titre", "left_semi")

    # J6 anti join: drop anything already validated (titles upper-cased)
    validated = (
        Table(spark, "crm", "associations_validation", warehouse)
        .read()
        .select(F.upper(F.col("titre")).alias("titre"))
    )
    raw = raw.join(validated, "titre", "left_anti")
    assos_to_add = assos_to_add.join(validated, "titre", "left_anti")

    # candidates: searched AND banded as (potential) accounts; manual
    # additions appended regardless (reference append, duplicates allowed)
    cands = raw.filter(
        F.col("Facebook_ID").isNotNull()
        & (F.col("check_levenshtein_similarity_facebook") != "no_fb_account")
    ).unionByName(assos_to_add, allowMissingColumns=True)

    cands = cands.withColumn(
        "adrg_achemine",
        F.when(
            F.coalesce(F.col("adrg_codepostal").rlike("^75|PARIS"), F.lit(False)),
            F.lit("Paris"),
        ).otherwise(F.col("adrg_achemine")),
    ).withColumn(
        "combined_address",
        title_case(
            F.concat_ws(
                ", ",
                F.col("adrg_libvoie").cast("string"),
                F.col("adrg_codepostal").cast("string"),
                F.col("adrg_achemine").cast("string"),
            )
        ),
    )

    out = (
        cands.withColumn(
            "fb_validation",
            F.when(
                F.col("check_levenshtein_similarity_facebook") == "fb_account", "yes"
            ).otherwise(""),
        )
        .withColumn("main_category", F.lit(""))
        .withColumn("main_type", F.lit(""))
        .select(
            "titre", "Facebook_new_URL", "fb_validation", "combined_address",
            "main_category", "main_type", "Objet_Social", "objet", "date_extract",
            "adrs_codepostal", "Facebook_ID",
        )
        .filter(
            ~F.coalesce(
                F.col("titre").rlike("LYCEE|FESTIVAL|COLLEGE|PRODUCTION"), F.lit(False)
            )
        )
        .orderBy("date_extract", "titre")
        # P8 row index: the reference's reset_index() position is pandas
        # row order; distributed rows have none, so the index is pinned to
        # the output sort key (deterministic, SURVEY §4.3 #3)
        .withColumn(
            "index",
            F.row_number().over(Window.orderBy("date_extract", "titre")) - 1,
        )
    )
    sheets.upload(out, "fb_check_upload")
    config.notifications.append("Similarity data updated to Spreadsheet")
    return out


def validation_retreatment(
    spark: SparkSession,
    warehouse: str,
    sheets: CsvSheetStore,
    geocode_transport: Callable[[], Transport],
    out_csv: str,
    config: ValidationConfig,
) -> DataFrame:
    """Pull human-checked rows back, persist the validation partition,
    geocode, merge with past validations (dedup keep-last), export."""
    fb_check = sheets.download("fb_check_upload").drop("index")
    fb_check = (
        fb_check.withColumn("date_upload", F.to_date(F.lit(config.today)))
        .withColumn("date_extract", F.to_date(F.substring(F.col("date_extract"), 1, 10)))
        .withColumn("adrs_codepostal", F.substring(F.col("adrs_codepostal"), 1, 5))
        .filter(
            (F.coalesce(F.col("main_category"), F.lit("")) != "")
            | (F.col("fb_validation") == "no")
        )
        .withColumn("titre", title_case(F.col("titre")))
        .withColumn("objet", capitalize_first(F.col("objet")))
    )

    av_schema = os.path.join(_SCHEMA_DIR, "associations_validation.json")
    av = Table(spark, "crm", "associations_validation", warehouse)
    av.create_partitioned(av_schema, "date_upload")
    to_save = fb_check.select(
        "titre", "fb_validation", "main_category", "main_type", "Facebook_new_URL",
        "Objet_Social", "combined_address", "date_upload", "date_extract", "objet",
        "adrs_codepostal",
    )
    av.write_partition(config.today, "date_upload", to_save, av_schema)

    validated = fb_check.filter(F.coalesce(F.col("main_category"), F.lit("")) != "")
    # E3 geocode enrichment: '' sentinel on failure (3s timeout upstream)
    validated = http_enrich(
        validated, "combined_address", geocode_transport,
        out_col="coordinates", config=EnrichConfig(sentinel=""),
    )
    coords = F.split(F.col("coordinates"), ",")
    validated = validated.withColumn("Lattitude", coords.getItem(0)).withColumn(
        "Longitude", coords.getItem(1)
    )

    # A3 dedup keep-last over (past snapshot ++ fresh rows): pandas
    # keep='last' prefers later positions, i.e. fresh rows — synthesized
    # here with an explicit source-order column (SURVEY §2.12 #8)
    if sheets.exists("association_validated"):
        past = sheets.download("association_validated").withColumn(
            "__src", F.lit(0)
        )
        merged = past.unionByName(
            validated.withColumn("__src", F.lit(1)), allowMissingColumns=True
        )
    else:
        merged = validated.withColumn("__src", F.lit(1))
    w = Window.partitionBy("titre").orderBy(F.desc("__src"))
    merged = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )

    arrondissements = {75000 + i: f"Paris {i:02d}" for i in range(1, 21)}
    amap = F.create_map(
        *[F.lit(x) for kv in arrondissements.items() for x in kv]
    )
    merged = merged.withColumn(
        "arrondissement", amap[F.col("adrs_codepostal").cast("long")]
    ).filter(F.coalesce(F.col("arrondissement").rlike("^Paris"), F.lit(False)))

    merged = merged.select(
        "titre", "main_category", "main_type", "Facebook_new_URL", "Objet_Social",
        "combined_address", "date_upload", "date_extract", "objet", "coordinates",
        "Lattitude", "Longitude", "adrs_codepostal", "arrondissement", "Facebook_ID",
    )

    # manual removals, titles title-cased before the anti join
    to_remove = sheets.download("assos_to_remove").select(
        title_case(F.col("titre")).alias("titre")
    )
    merged = merged.join(to_remove, "titre", "left_anti")

    sheets.upload(merged, "association_validated")
    csv_sink(merged, out_csv)
    config.notifications.append("Validated assos file ready for WP import")
    return merged


def update_assos(
    spark: SparkSession,
    warehouse: str,
    create_csv: str,
    update_csv: str,
    users_update_csv: str,
    config: ValidationConfig,
) -> DataFrame:
    """update_assos_validation_retreatment.py: flag known associations and
    build the user-association SEO update feed."""
    products = (
        Table(spark, "crm", "wp_export_associations", warehouse)
        .read()
        .filter(F.col("_listing_type") == "service")  # get_products_id.sql param
        .select(
            F.col("Title").alias("Titre"),
            F.col("product_id").cast("string"),
            "_dates_event_user",
            F.col("Content").alias("content"),
            "_wp_import",
            "_address",
            "_friendly_address",
            F.col("Image_Featured").alias("image_featured"),
            F.col("Image_URL").alias("image_url"),
            "_gallery_unserialized",
            F.col("Categories").alias("categories"),
            F.col("Features").alias("features"),
            F.col("Author_ID").alias("author_id"),
        )
    )

    data = csv_source(spark, create_csv).withColumnRenamed("titre", "Titre")
    flag = (
        F.when(F.coalesce(F.col("_wp_import").rlike("no"), F.lit(False)), "yes")
        .when(F.coalesce(F.col("_wp_import").rlike("yes"), F.lit(False)), "no")
    )
    joined = data.join(products, "Titre", "left").withColumn("flag_already_exist", flag)
    csv_sink(joined.filter(F.col("flag_already_exist") == "no"), update_csv)

    users = products.withColumn("flag_already_exist", flag).filter(
        F.col("flag_already_exist") == "yes"
    )
    # pandas str.extract yields NaN on no match (update_assos_validation_
    # retreatment.py:99,103) where regexp_extract yields '' — nullif keeps
    # the concat null so unparseable addresses don't fabricate ', , Paris'
    street = F.nullif(F.regexp_extract(F.col("_address"), r"^(.+?,.+?),", 1), F.lit(""))
    new_address = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("_address"), " Île-de-France, France métropolitaine,", ""),
            ", France",
            "",
        ),
        ", Paris",
        "",
    )
    users = (
        users.withColumn(
            # reference: isin([0]) == False is True for null author_id
            # (update_assos_validation_retreatment.py:96) — coalesce the
            # null-valued isin to False so missing authors also get 'on'
            "_verified",
            F.when(~F.coalesce(F.col("author_id").isin(0), F.lit(False)), "on"),
        )
        .withColumn("seo_metadescription", F.col("content"))
        .withColumn("street", street)
        .withColumn(
            "postcode", F.nullif(F.regexp_extract(new_address, r".*,(.*)$", 1), F.lit(""))
        )
        .withColumn(
            "new_address",
            F.concat(F.col("street"), F.lit(", "), F.col("postcode"), F.lit(", Paris")),
        )
        .withColumn(
            "_friendly_address",
            F.coalesce(F.col("_friendly_address"), F.col("new_address")),
        )
        .withColumn("_gallery_unserialized", clean_image(F.col("_gallery_unserialized")))
        .select(
            "Titre", "seo_metadescription", "_friendly_address", "image_featured",
            "image_url", "_verified", "_gallery_unserialized", "categories", "features",
        )
    )
    csv_sink(users, users_update_csv)
    config.notifications.append("Update assos OK")
    return users
