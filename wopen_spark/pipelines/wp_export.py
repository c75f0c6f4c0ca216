"""WordPress sync-back chain (SURVEY §3.3): wp_export_data.py rebuilt.

Two WP All Export HTTP CSV feeds -> listing counts per author -> left
join -> ownership banding -> two warehouse tables. Closes the loop: the
engine's CSV hand-off goes into WordPress, WordPress exports come back in.

Scale shape: one groupBy shuffle on Author ID (map-side partial count)
and one join; the users side is typically small enough to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wopen_spark.pipelines.refdata import reference_sanitize
from wopen_spark.sources.http import Opener, _default_opener, http_csv_source
from wopen_spark.tables import Table


def wp_export(
    spark: SparkSession,
    users_url: str,
    listings_url: str,
    warehouse: str,
    opener: Opener = _default_opener,
    notifications: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (users_with_counts, sanitized_listings), both persisted."""
    users = http_csv_source(spark, users_url, opener=opener).withColumnRenamed(
        "id", "Author_ID"
    )
    listings = http_csv_source(spark, listings_url, opener=opener).withColumn(
        "Categories", F.coalesce(F.col("Categories"), F.lit("No category specifed"))
    )

    # wp_export_data.py:37-41 — NOTE the reference builds a
    # _listing_type=='service' filtered copy and then groups the UNFILTERED
    # frame (quirk §2.12 #2): counts include every listing type. Kept.
    grouped = (
        listings.groupBy(F.col("Author ID").alias("Author_ID"))
        .agg(F.count(F.col("Title")).alias("nb_listing_owned"))
    )

    data = (
        users.join(grouped, "Author_ID", "left")
        .withColumn("nb_listing_owned", F.coalesce(F.col("nb_listing_owned"), F.lit(0)))
        .withColumn(
            "listing_owned",
            F.when(F.col("nb_listing_owned") > 0, "owned_listing").otherwise(
                "no_owned_listing"
            ),
        )
    )
    data = data.toDF(*[reference_sanitize(c, dashes=True) for c in data.columns])
    listings = listings.toDF(
        *[reference_sanitize(c, dashes=True) for c in listings.columns]
    )

    Table(spark, "crm", "wp_export_users", warehouse).write(data)
    Table(spark, "crm", "wp_export_associations", warehouse).write(listings)
    if notifications is not None:
        notifications.append("Users and Associations export tables updated in BigQuery")
    return data, listings
