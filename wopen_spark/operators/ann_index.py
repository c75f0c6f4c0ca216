"""Persistent IVF-PQ vector index stored as SnapshotTables.

An ANN index at 100 TB is BUILT ONCE and searched many times — the
training pass (coarse k-means + PQ codebooks) and the corpus encode are
the expensive jobs, so their outputs must round-trip through storage,
not live in a session. This module persists the three index artifacts as
ordinary SnapshotTables under one root:

- ``centroids``  (centroid_id, cvec)            — the coarse quantizer
- ``codebooks``  (subspace, code, centroid)     — the PQ codebooks
- ``codes``      (vec_id, centroid_id, codes)   — PQ codes of each
  vector's RESIDUAL, clustered by ``centroid_id`` so the per-list file
  layout matches the probe pattern: a search reads only the files whose
  centroid_id range intersects its probed lists (footer-stats pruning
  via ``SnapshotTable.read_where``), never the whole index.

Because the artifacts are SnapshotTables, the index inherits the table
format's whole contract for free: atomic publish, time travel (search
yesterday's index), schema history, vacuum, and incremental maintenance
(append-encode new vectors; the change feed drives exactly-once
downstream refresh).

Parquet stores doubles as IEEE bits, so a search through the persisted
index is bit-identical to a search over the in-session artifacts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wopen_spark.operators.similarity import ivf_assign, pq_adc_scores, pq_codes
from wopen_spark.snapshot_table import SnapshotTable

_RESIDUAL = F.zip_with("v", "cvec", lambda a, b: a - b)


class IvfPqIndex:
    """Handle on a persisted IVF-PQ index rooted at ``root``."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.centroids = SnapshotTable(spark, f"{root}/centroids")
        self.codebooks = SnapshotTable(spark, f"{root}/codebooks")
        self.codes = SnapshotTable(spark, f"{root}/codes")

    # ------------------------------------------------------------ build
    @classmethod
    def build(
        cls,
        spark: SparkSession,
        root: str,
        vectors: DataFrame,
        centroids: DataFrame,
        codebooks: list[list[list[float]]],
    ) -> "IvfPqIndex":
        """Persist the index: ``vectors`` (vec_id, v: array<double>),
        ``centroids`` (centroid_id, cvec: array<double>) — trained
        upstream (kmeans_train / pq_train_codebooks or fixed seeds) —
        and the PQ ``codebooks`` (m x k x sub floats). The corpus encode
        is one map-side pass: coarse-assign against broadcast centroids,
        PQ-encode the residual; the codes table is written clustered by
        ``centroid_id`` so probe-time file pruning works."""
        idx = cls(spark, root)
        idx.centroids.create(centroids.coalesce(1))
        cb_rows = [
            (j, c, list(book[c]))
            for j, book in enumerate(codebooks)
            for c in range(len(book))
        ]
        idx.codebooks.create(
            spark.createDataFrame(
                cb_rows, "subspace int, code int, centroid array<double>"
            ).coalesce(1)
        )
        cents_as_vecs = centroids.select(
            F.col("centroid_id").alias("vec_id"), F.col("cvec").alias("v")
        )
        coded = (
            ivf_assign(vectors, cents_as_vecs, vec_col="v", id_col="vec_id",
                       metric="l2")
            .join(F.broadcast(centroids), "centroid_id")
            .select(
                "vec_id",
                "centroid_id",
                pq_codes(_RESIDUAL, codebooks).alias("codes"),
            )
        )
        idx.codes.create(coded, cluster_by=["centroid_id"])
        return idx

    def incremental_encode(self, new_vectors: DataFrame) -> int:
        """Index maintenance without a rebuild: coarse-assign and
        PQ-encode ONLY the new vectors against the PERSISTED quantizers
        and append their codes — O(new rows), the shape that keeps a
        1B-vector index fresh under continuous ingest. The quantizers are
        frozen (the FAISS contract: retrain is a deliberate, separate
        event); time travel on the codes table still searches any older
        index state."""
        cents = self.centroids.read().select("centroid_id", "cvec")
        books = self.load_codebooks()
        cents_as_vecs = cents.select(
            F.col("centroid_id").alias("vec_id"), F.col("cvec").alias("v")
        )
        coded = (
            ivf_assign(new_vectors, cents_as_vecs, vec_col="v",
                       id_col="vec_id", metric="l2")
            .join(F.broadcast(cents), "centroid_id")
            .select(
                "vec_id",
                "centroid_id",
                pq_codes(_RESIDUAL, books).alias("codes"),
            )
        )
        return self.codes.append(coded)

    # ----------------------------------------------------------- search
    def load_codebooks(self) -> list[list[list[float]]]:
        """Collect the (tiny, m*k-row) codebook table back into the
        nested-list form the PQ column expressions embed as literals."""
        rows = self.codebooks.read().collect()
        m = 1 + max(r["subspace"] for r in rows)
        books: list[dict[int, list[float]]] = [{} for _ in range(m)]
        for r in rows:
            books[r["subspace"]][r["code"]] = list(r["centroid"])
        return [[d[c] for c in sorted(d)] for d in books]

    def search(
        self,
        queries: DataFrame,
        nprobe: int = 4,
        topk: int = 10,
        version: int | None = None,
    ) -> tuple[DataFrame, dict]:
        """Residual-ADC top-k over the persisted index: queries
        (query_id, v) coarse-assign to their ``nprobe`` nearest lists
        against the PERSISTED centroids, and only code files whose
        ``centroid_id`` stats intersect the probed set are opened
        (returned report says how many were skipped). ``version`` time-
        travels the codes table — search the index as of an old build."""
        cents = self.centroids.read().select("centroid_id", "cvec")
        books = self.load_codebooks()
        cents_as_vecs = cents.select(
            F.col("centroid_id").alias("vec_id"), F.col("cvec").alias("v")
        )
        probes = (
            ivf_assign(queries, cents_as_vecs, vec_col="v", id_col="vec_id",
                       n_assign=nprobe, metric="l2")
            .join(F.broadcast(cents), "centroid_id")
            .select("query_id", "centroid_id", _RESIDUAL.alias("qres"))
        )
        # the probe set is (queries x nprobe) tiny — collect it ONCE to
        # drive file pruning on the codes table AND to rebuild the
        # broadcast probe frame (doubles round-trip py4j exactly), so the
        # centroid-assignment subtree runs a single time
        probe_rows = probes.collect()
        if not probe_rows:  # no queries -> empty top-k, nothing scanned
            empty = self.spark.createDataFrame(
                [], "query_id long, vec_id long, adc double, rank int"
            )
            return empty, {
                "files_total": len(self.codes._state(version)["files"]),
                "files_read": 0,
                "files_skipped_by_stats": 0,
                "files_skipped_by_bloom": 0,
            }
        probed_ids = sorted({r["centroid_id"] for r in probe_rows})
        probe_df = self.spark.createDataFrame(probe_rows, probes.schema)
        coded, report = self.codes.read_where(
            {"centroid_id": (probed_ids[0], probed_ids[-1])},
            version=version,
        )
        coded = coded.filter(F.col("centroid_id").isin(probed_ids))
        scored = coded.join(F.broadcast(probe_df), "centroid_id").select(
            "query_id",
            "vec_id",
            F.round(
                pq_adc_scores(F.col("codes"), F.col("qres"), books), 6
            ).alias("adc"),
        )
        w = Window.partitionBy("query_id").orderBy("adc", "vec_id")
        out = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= topk)
            .orderBy("query_id", "rank")
        )
        return out, report
