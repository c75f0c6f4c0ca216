"""Events chain (SURVEY §3.2): the reference's two events scripts as one
declarative Spark pipeline each.

``process_events`` rebuilds process_open_data.py: HTTP CSV scan ->
sanitize -> availability/derived columns -> events table -> filtered
to-create CSV (kill-switched, §2.12 #1).

``update_events`` rebuilds update_open_data.py: products table x to-create
CSV join -> inverted flags (§2.12 #3) -> to-update CSV; plus the
user-events branch with per-row date arrays, French date strings, and SEO
fields.

Scale shape: every step is a Column expression over one scan; the only
shuffle in either pipeline is the broadcast-able join on Titre. The
reference's row-by-row Python loops (availability,
process_open_data.py:53-67; user dates, update_open_data.py:104-141)
become per-row array expressions — no Python in the row path at all.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from itertools import chain

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wopen_spark.functions.dates import (
    availability_calendar,
    consecutive_run,
    duration_label,
    french_date_str,
)
from wopen_spark.functions.strings import clean_image
from wopen_spark.pipelines.refdata import (
    ARRONDISSEMENTS,
    EVENT_CATEGORIES,
    MAIN_CATEGORY,
    PRICE_TYPE,
    reference_sanitize,
)
from wopen_spark.sources.files import csv_sink, csv_source
from wopen_spark.sources.http import Opener, _default_opener, http_csv_source
from wopen_spark.tables import Table


@dataclass
class EventsConfig:
    """Pinned reference behavior (SURVEY §2.12 #7: fixed availability
    window; #1: the to-create CSV kill switch, on by default)."""

    availability_start: str = "2019-01-01"
    availability_end: str = "2022-01-01"
    emit_create_rows: bool = False  # reference truncates with data_clean[:0]
    today: str | None = None  # None -> current_date(); pin for tests
    notifications: list[str] = field(default_factory=list)


def _dict_map(mapping: dict) -> F.Column:
    """pandas ``.map(dict)`` semantics: literal map lookup, unmatched -> null."""
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])


def process_events(
    spark: SparkSession,
    source_url: str,
    warehouse: str,
    out_csv: str,
    config: EventsConfig | None = None,
    opener: Opener = _default_opener,
) -> DataFrame:
    """process_open_data.py as one lazy plan; returns the enriched events
    DataFrame (already persisted to the warehouse + hand-off CSV)."""
    cfg = config or EventsConfig()
    today = F.to_date(F.lit(cfg.today)) if cfg.today else F.current_date()

    raw = http_csv_source(spark, source_url, opener=opener)
    df = raw.toDF(*[reference_sanitize(c) for c in raw.columns])

    # availability: occurrence timestamps -> dates -> range-minus-dates
    # (the reference's O(rows x 1097) Python loop, :50-70, as array exprs;
    # order is the deterministic range order, not pandas set order)
    df = df.filter(F.col("Occurrences").isNotNull())
    occ = F.split(F.regexp_replace(F.col("Occurrences"), ";", "_"), "_")
    event_dates = F.array_distinct(
        F.transform(occ, lambda s: F.to_date(F.substring(s, 1, 10)))
    )
    df = df.withColumn(
        "calendar_availability",
        availability_calendar(event_dates, cfg.availability_start, cfg.availability_end),
    )

    coords = F.split(F.col("Coordonnees_geographiques"), ",")
    df = (
        df.withColumn("Lattitude", coords.getItem(0))  # reference spelling
        .withColumn("Longitude", coords.getItem(1))
        .withColumn(
            "video_link",
            F.regexp_replace(
                F.regexp_extract(
                    F.col("Description"), r"(https://www.youtube.com.*)\?feature=oembed", 1
                ),
                r"embed/",
                "watch?v=",
            ),
        )
        .withColumn(
            "Description",
            F.regexp_replace(
                F.col("Description"), r".div.class=.component.*</iframe></div></div>", ""
            ),
        )
        .withColumn("Date_de_debut", F.substring(F.col("Date_de_debut"), 1, 10))
        .withColumn("Date_de_fin", F.substring(F.col("Date_de_fin"), 1, 10))
        .withColumn("Date_de_debut_clean", F.to_date(F.col("Date_de_debut")))
        .withColumn("Date_de_fin_clean", F.to_date(F.col("Date_de_fin")))
        .filter(F.col("Date_de_debut_clean") >= today)
        .withColumn(
            "Duree_evenement",
            F.datediff(F.col("Date_de_fin_clean"), F.col("Date_de_debut_clean")),
        )
        .withColumn("Date_de_debut_clean", french_date_str(F.col("Date_de_debut_clean")))
        .withColumn("Date_de_fin_clean", F.col("Date_de_fin_clean").cast("string"))
        .withColumn(
            "arrondissement",
            F.when(
                F.col("Ville") == "Paris",
                _dict_map(ARRONDISSEMENTS)[F.col("Code_postal").cast("long")],
            ),
        )
        .withColumn(
            "combined_address",
            F.concat_ws(
                ", ",
                F.col("Adresse_du_lieu").cast("string"),
                F.col("Code_postal").cast("string"),
                F.col("Ville").cast("string"),
            ),
        )
        .withColumn(
            "flag_categories_to_import",
            F.when(F.col("Categorie").isin(EVENT_CATEGORIES), "yes").otherwise("no"),
        )
        .withColumn("main_category", _dict_map(MAIN_CATEGORY)[F.col("Categorie")])
        .withColumn("Type_de_prix", _dict_map(PRICE_TYPE)[F.col("Type_de_prix")])
    )

    Table(spark, "crm", "events", warehouse).write(df)
    cfg.notifications.append("Open data Paris Event updated in BigQuery & for WP Import")

    to_create = (
        df.filter(F.col("Categorie").isin(EVENT_CATEGORIES))
        .withColumn("Code_postal", F.col("Code_postal").cast("string"))
        .filter(F.coalesce(F.col("arrondissement").rlike("^Paris"), F.lit(False)))
        .filter(F.coalesce(F.col("Type_de_prix").rlike("^Libre$|^Payant$"), F.lit(False)))
    )
    if not cfg.emit_create_rows:
        # §2.12 #1: the reference deliberately empties the to-create file
        # (data_clean[:0]) — header-only CSV, creation path disabled
        to_create = to_create.limit(0)
    csv_sink(to_create, out_csv)
    return df


def update_events(
    spark: SparkSession,
    warehouse: str,
    create_csv: str,
    update_csv: str,
    users_update_csv: str,
    config: EventsConfig | None = None,
) -> DataFrame:
    """update_open_data.py: flag known events for update and build the
    user-events feed (availability, French date strings, SEO fields)."""
    cfg = config or EventsConfig()

    products = (
        Table(spark, "crm", "wp_export_associations", warehouse)
        .read()
        .filter(F.col("_listing_type") == "event")  # sql/get_products_id.sql:3
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

    data = csv_source(spark, create_csv)
    # §2.12 #3: substring containment, not equality, and the 'no' rule is
    # applied second so free text matching both resolves to 'yes'
    flag = (
        F.when(F.coalesce(F.col("_wp_import").rlike("no"), F.lit(False)), "yes")
        .when(F.coalesce(F.col("_wp_import").rlike("yes"), F.lit(False)), "no")
    )
    joined = data.join(products, "Titre", "left").withColumn("flag_already_exist", flag)
    csv_sink(joined.filter(F.col("flag_already_exist") == "no"), update_csv)

    # user-events branch: rows whose products flag resolves to 'yes'
    users = products.withColumn("flag_already_exist", flag).filter(
        F.col("flag_already_exist") == "yes"
    )
    darr = F.transform(
        F.split(F.regexp_replace(F.trim(F.col("_dates_event_user")), " ", ""), ","),
        lambda s: F.to_date(F.substring(s, 1, 10), "dd/MM/yyyy"),
    )
    users = users.withColumn("__dates", darr)
    distinct = F.array_distinct(F.col("__dates"))
    n_days = F.size(distinct)
    dmin, dmax = F.array_min(F.col("__dates")), F.array_max(F.col("__dates"))
    dates_string = (
        F.when(n_days == 1, french_date_str(dmin))
        .when(
            consecutive_run(F.col("__dates")),
            F.concat(
                F.lit("Du "), french_date_str(dmin), F.lit(" au "), french_date_str(dmax)
            ),
        )
        .otherwise(
            F.array_join(F.transform(F.col("__dates"), french_date_str), ", ")
        )
    )
    users = (
        users.withColumn(
            "calendar_availability",
            availability_calendar(distinct, cfg.availability_start, cfg.availability_end),
        )
        .withColumn("dates_string", dates_string)
        .withColumn("first_date", dmin)
        .withColumn("_verified", F.lit("on"))
        .withColumn("seo_metadescription", F.col("content"))
        .withColumn(
            "_friendly_address",
            # three sequential replaces, as in the reference (:157-160) —
            # an alternation could re-match across deletion seams
            F.concat(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(
                            F.col("_address"), " Île-de-France, France métropolitaine,", ""
                        ),
                        ", France",
                        "",
                    ),
                    ", Paris",
                    "",
                ),
                F.lit(", Paris"),
            ),
        )
        .withColumn("_gallery_unserialized", clean_image(F.col("_gallery_unserialized")))
        .withColumn("_event_duration", duration_label(n_days))
        .select(
            "Titre",
            "calendar_availability",
            "dates_string",
            "first_date",
            "_dates_event_user",
            "seo_metadescription",
            "_friendly_address",
            "image_featured",
            "image_url",
            "_verified",
            "_gallery_unserialized",
            "categories",
            "features",
            "_event_duration",
        )
    )
    csv_sink(users, users_update_csv)
    cfg.notifications.append("Update open data OK")
    return users
