"""Persistent IVF-PQ and SQ8 vector indexes stored as SnapshotTables.

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

from wopen_spark.localframe import local_df
from wopen_spark.operators.similarity import ivf_assign, pq_adc_scores, pq_codes
from wopen_spark.snapshot_table import SnapshotTable

_RESIDUAL = F.zip_with("v", "cvec", lambda a, b: a - b)


def _spread_scan(df: DataFrame, n_files: int) -> DataFrame:
    """Ensure a (pruned) codes scan has >= core-count partitions before
    the per-row ADC/reconstruct scoring pass — a small index lands in
    one or two parquet files, which would serialize the scoring onto as
    many cores as files. Gated on the DRIVER-SIDE file count (already in
    the snapshot state — no `.rdd` partition probe, which would execute
    a DV'd read early), so at real scale, where the pruned scan spans >=
    core-count files, this is a no-op."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if n_files < target:
        return df.repartition(target)
    return df


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
            local_df(
                spark, cb_rows, "subspace int, code int, centroid array<double>"
            )
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
            empty = local_df(
                self.spark, [], "query_id long, vec_id long, adc double, rank int"
            )
            return empty, {
                "files_total": len(self.codes._state(version)["files"]),
                "files_read": 0,
                "files_skipped_by_stats": 0,
                "files_skipped_by_bloom": 0,
            }
        probed_ids = sorted({r["centroid_id"] for r in probe_rows})
        probe_df = local_df(self.spark, probe_rows, probes.schema)
        coded, report = self.codes.read_where(
            {"centroid_id": (probed_ids[0], probed_ids[-1])},
            version=version,
        )
        coded = _spread_scan(
            coded.filter(F.col("centroid_id").isin(probed_ids)),
            report["files_read"],
        )
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


def _sq8_l2s(a, b):
    """Squared-L2 as an EXACT scaled long (per-dim term rounded at 1e-9,
    summed as longs) — order-independent, so the ranking is bit-equal
    across engines and partitionings (the house sum_scaled trick)."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: F.round((x - y) * (x - y) * 1e9).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )


class Sq8Index:
    """Persisted scalar-quantized (SQ8, FAISS SQfp8-style) index: the 4x
    memory-cut rung as a stored, time-travelable artifact. Two tables
    under ``root``:

    - ``stats`` — ONE row (vmins, vmaxs: array<double>), the trained
      per-dimension quantizer;
    - ``codes`` — (vec_id, codes: array<int> in [0, 255]), clustered by
      ``vec_id`` so a point fetch (serve a stored vector back, re-encode
      checks) opens only the files whose id range matches — the same
      footer-stats pruning the IVF-PQ index gets per list.

    SQ8 is a FLAT index: search reconstructs and scores every code (that
    full scan IS the design — the win is 4x less data read, not fewer
    rows), so pruning here serves the point-read path, while
    :class:`IvfPqIndex` covers the probed-list shape. Encode and search
    are map-side passes against the broadcast one-row stats frame; the
    quantizer is frozen after build (``incremental_encode`` appends new
    codes against it — retrain is a deliberate rebuild, the FAISS
    contract). Time travel on ``codes`` searches any older index state.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.stats = SnapshotTable(spark, f"{root}/stats")
        self.codes = SnapshotTable(spark, f"{root}/codes")

    # ------------------------------------------------------------ encode
    @staticmethod
    def _encode_expr(vec):
        """codes[i] = round((v[i] - vmin[i]) / scale[i]), clamped to
        [0, 255] (FAISS SQ clamps out-of-range values to the trained
        range — incremental_encode of a vector outside the frozen
        per-dim (vmin, vmax) must still honor the uint8 contract);
        constant dims (vmax == vmin) encode 0 and reconstruct vmin
        exactly."""
        def elem(x, i):
            vmin = F.element_at("vmins", i + 1)
            vmax = F.element_at("vmaxs", i + 1)
            scale = (vmax - vmin) / 255
            code = F.round((x.cast("double") - vmin) / scale).cast("int")
            return F.when(vmax == vmin, F.lit(0)).otherwise(
                F.greatest(F.lit(0), F.least(F.lit(255), code))
            )

        return F.transform(vec, elem)

    @staticmethod
    def _recon_expr(codes):
        def elem(c, i):
            vmin = F.element_at("vmins", i + 1)
            vmax = F.element_at("vmaxs", i + 1)
            scale = (vmax - vmin) / 255
            return F.when(vmax == vmin, vmin).otherwise(
                vmin + c.cast("double") * scale
            )

        return F.transform(codes, elem)

    def _with_stats(self, df: DataFrame, version: int | None = None) -> DataFrame:
        return df.crossJoin(F.broadcast(self.stats.read(version=version)))

    # ------------------------------------------------------------- build
    @classmethod
    def build(
        cls,
        spark: SparkSession,
        root: str,
        vectors: DataFrame,
        vec_col: str = "v",
        id_col: str = "vec_id",
        n_files: int = 8,
    ) -> "Sq8Index":
        """Train per-dim (min, max) over the corpus — one partial-agg
        pass over posexploded dims — and persist stats + codes. The
        codes land across ``n_files`` id-clustered files so point reads
        have something to skip."""
        idx = cls(spark, root)
        flat = vectors.select(
            F.posexplode(vec_col).alias("dim", "vf")
        )
        stats = (
            flat.groupBy("dim")
            .agg(
                F.min(F.col("vf").cast("double")).alias("vmin"),
                F.max(F.col("vf").cast("double")).alias("vmax"),
            )
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "vmin", "vmax"))
                ).alias("st")
            )
            .select(
                F.transform("st", lambda s: s.vmin).alias("vmins"),
                F.transform("st", lambda s: s.vmax).alias("vmaxs"),
            )
        )
        idx.stats.create(stats.coalesce(1))
        coded = idx._with_stats(
            vectors.repartition(n_files, F.col(id_col))
        ).select(
            F.col(id_col).alias("vec_id"),
            cls._encode_expr(F.col(vec_col)).alias("codes"),
        )
        idx.codes.create(coded, cluster_by=["vec_id"])
        return idx

    def incremental_encode(self, new_vectors: DataFrame,
                           vec_col: str = "v", id_col: str = "vec_id") -> int:
        """Append codes for new vectors against the FROZEN quantizer —
        O(new rows) maintenance, same contract as IvfPqIndex."""
        coded = self._with_stats(new_vectors).select(
            F.col(id_col).alias("vec_id"),
            self._encode_expr(F.col(vec_col)).alias("codes"),
        )
        return self.codes.append(coded)

    # ------------------------------------------------------------- serve
    def fetch_codes(self, vec_ids: list, version: int | None = None):
        """Point read: codes for specific ids, files pruned by the
        id-cluster footer stats (returned report says how many were
        skipped)."""
        df, report = self.codes.read_where(
            {"vec_id": (min(vec_ids), max(vec_ids))}, version=version
        )
        return df.filter(F.col("vec_id").isin(list(vec_ids))), report

    def search(
        self,
        queries: DataFrame,
        topk: int = 10,
        version: int | None = None,
    ) -> DataFrame:
        """Exact top-k of each query (query_id, v) against the
        reconstructed corpus as of ``version``: one map-side
        reconstruct+score pass (broadcast stats row + broadcast query
        frame), top-k via TakeOrderedAndProject per query — never a
        global sort, no shuffle touching the corpus."""
        scored = (
            self._with_stats(
                _spread_scan(
                    self.codes.read(version=version),
                    len(self.codes._state(version)["files"]),
                )
            )
            .join(
                F.broadcast(
                    queries.select(
                        "query_id",
                        F.transform(
                            "v", lambda x: x.cast("double")
                        ).alias("qv"),
                    )
                )
            )
            .select(
                "query_id",
                "vec_id",
                _sq8_l2s(self._recon_expr(F.col("codes")), F.col("qv")).alias(
                    "d_s"
                ),
            )
        )
        w = Window.partitionBy("query_id").orderBy("d_s", "vec_id")
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= topk)
            .select(
                "query_id",
                "vec_id",
                (F.col("d_s").cast("double") / 1e9).alias("adc"),
                "rank",
            )
            .orderBy("query_id", "rank")
        )
