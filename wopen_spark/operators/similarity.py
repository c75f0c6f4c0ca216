"""Similarity operators: fuzzy string top-1 join and ANN vector search.

Fuzzy join is the reference's signature operator (J8,
get_similarity.py:148-152: every search term scored against every slug,
keep the best). The exact path is cross join + levenshtein + window top-1
— correct at any scale where one side is small (the reference's case:
~100 rows/day). The scalable path for big×big is MinHash-LSH candidate
generation (operators.dedup) followed by exact re-ranking of candidates.

Vector search: brute-force cosine top-k is the exact baseline (one pass,
map-side score + global top-k — no shuffle of the corpus); the scale path
buckets vectors by an LSH/IVF key so each query probes a few buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def levenshtein_similarity(a: Column, b: Column) -> Column:
    """Normalized edit similarity in [0,100], fuzzywuzzy-style scale
    (SURVEY §2.12 #4: the reference's 'levenshtein_similarity' column;
    we pin the definition to true Levenshtein over the longer length)."""
    dist = F.levenshtein(a, b)
    longer = F.greatest(F.length(a), F.length(b))
    return F.round(
        F.when(longer > 0, (1 - dist.cast("double") / longer.cast("double")) * 100).otherwise(
            F.lit(100.0)
        ),
        4,
    )


def wratio_column(a: Column, b: Column) -> Column:
    """fuzzywuzzy-WRatio score of two string columns as an Arrow-batched
    pandas UDF (functions/fuzzy.py re-derives the public algorithm on the
    stdlib difflib backend the reference actually ran — byte-parity with
    get_similarity.py:148-152, requirements.txt:19). A Python kernel is
    unavoidable here: WRatio's windowed SequenceMatcher alignment has no
    Column-expression equivalent; Arrow batching keeps it off the
    row-at-a-time path."""
    import pandas as pd
    from pyspark.sql.types import IntegerType

    def _kernel(s1, s2):
        # self-contained import: cloudpickle ships the module path, workers
        # re-import (wopen_spark is on PYTHONPATH via spark.submit.pyFiles
        # or the driver's sys.path in local mode)
        from wopen_spark.functions.fuzzy import wratio

        return pd.Series([wratio(a_, b_) for a_, b_ in zip(s1, s2)], dtype="int32")

    # real (non-string) annotations: `from __future__ import annotations`
    # would stringify inline hints, which pandas_udf rejects
    _kernel.__annotations__ = {"s1": pd.Series, "s2": pd.Series, "return": pd.Series}
    return F.pandas_udf(_kernel, IntegerType())(a, b)


def fuzzy_top1_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    score_col: str = "similarity",
    scorer: str = "levenshtein",
) -> DataFrame:
    """For each left row, the single best-scoring right row (J8 semantics).

    Exact strategy: broadcast the smaller right side, score every pair,
    keep rank 1 per left key with deterministic tie-break on the right
    value. Right side must be broadcast-able (dedup it first); for big
    right sides, pre-filter candidates with MinHash-LSH then reuse this.

    ``scorer``: ``'levenshtein'`` (default — pure Column expression, whole
    pair space stays in codegen) or ``'wratio'`` (fuzzywuzzy parity with
    the reference's process.extract default, pandas-UDF kernel).
    """
    if scorer == "levenshtein":
        score = levenshtein_similarity(F.col(left_col), F.col(right_col))
    elif scorer == "wratio":
        score = wratio_column(F.col(left_col), F.col(right_col)).cast("double")
    else:
        raise ValueError(f"unknown scorer {scorer!r}; use 'levenshtein' or 'wratio'")
    scored = left.crossJoin(F.broadcast(right)).withColumn(score_col, score)
    w = Window.partitionBy(left_col).orderBy(F.desc(score_col), F.asc(right_col))
    return scored.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def _dot(a: Column, b: Column) -> Column:
    """Sequential-order double dot product (deterministic across engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns, computed in double."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def vec_norm(v: Column) -> Column:
    """L2 norm, precomputed once per vector so pairwise scoring needs ONE
    dot product per pair instead of three — at 1B×k candidate pairs the
    norms are a per-row map, the pair stage is the hot loop."""
    return F.sqrt(_dot(v, v))


def cosine_from_norms(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine given precomputed norms; bit-identical to
    ``cosine_similarity`` (same dot and same multiply order)."""
    return _dot(a, b) / (norm_a * norm_b)


def l2sq_cols(a: Column, b: Column) -> Column:
    """Exact squared L2 between two array<double> columns — sequential
    left-to-right fold (F.aggregate), the same order DuckDB's list_sum
    walks a list, so the doubles match bit-for-bit across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    corpus: DataFrame,
    query: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    score_col: str = "cosine",
) -> DataFrame:
    """Brute-force cosine top-k of each query vector against the corpus.

    The corpus is scanned once with a map-side score (no corpus shuffle);
    the window top-k shuffles only (n_queries × corpus_partitions × k)
    rows after partial sort. Scores are rounded to 6 decimals so ranking
    is reproducible across engines; ties break on corpus id.
    """
    q = query.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        vec_norm(F.col(vec_col)).alias("__qnorm"),
    )
    scored = (
        corpus.withColumn("__cnorm", vec_norm(F.col(vec_col)))
        .crossJoin(F.broadcast(q))
        .select(
            "query_id",
            F.col(id_col),
            F.round(
                cosine_from_norms(
                    F.col(vec_col), F.col("__qvec"), F.col("__cnorm"), F.col("__qnorm")
                ),
                6,
            ).alias(score_col),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(score_col), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .withColumnRenamed("__rn", "rank")
    )


def hyperplane_signs(n_planes: int, dim: int, seed: str = "hp") -> list[list[float]]:
    """Deterministic ±1 random-hyperplane matrix derived from md5 — the
    same literals can be embedded in any engine's SQL, so LSH bucketing is
    engine-portable without a shared RNG."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{seed}{p}_{j}".encode()).hexdigest()[0], 16) % 2 == 0 else -1.0
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """SimHash-for-vectors: bit p of the bucket key is sign(v · r_p).
    Cosine-similar vectors agree on most signs and land in the same
    bucket; the near-dup join then keys on the bucket (one uniform
    shuffle) instead of the O(n²) pair space."""
    bits = [
        F.when(
            _dot(vec, F.array(*[F.lit(x) for x in plane])) > 0, F.lit(1 << p)
        ).otherwise(F.lit(0))
        for p, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id_col: str = "centroid_id",
    n_assign: int = 1,
    metric: str = "cosine",
    group_col: str | None = None,
) -> DataFrame:
    """Assign each vector to its ``n_assign`` nearest centroids,
    entirely map-side: ZERO shuffle of the corpus.

    The centroid set (always small, ~sqrt(corpus)) is collapsed to a
    one-row array and broadcast; per corpus row the scores are computed
    with ``transform`` and ranked with an ``array_sort`` comparator
    inside codegen. Earlier revisions ranked with a ``row_number`` window
    partitioned on the vector id — correct, but that shuffles the ENTIRE
    corpus once per call (and once per k-means iteration), which is the
    dominant cost at 1B vectors. The comparator reproduces the window's
    exact order — score rounded to 6 decimals (cosine descending / L2
    ascending), centroid id ascending — so assignments are bit-identical
    to the windowed form and engine-reproducible.

    ``metric``: ``'cosine'`` (IVF probing, semantic dedup) or ``'l2'``
    (squared Euclidean — the standard quantizer objective PQ codebook
    training minimizes; exact sequential-fold arithmetic, see
    :func:`l2sq_cols`).

    ``group_col``: when set, rows and centroids carry a group key and
    each row argmins ONLY over its group's centroids — one broadcast
    join on the key instead of N separate assignment passes (PQ trains
    all m subspaces in a single pass this way). Same comparator, same
    results as per-group calls.
    """
    if metric not in ("cosine", "l2"):
        raise ValueError(f"metric must be 'cosine' or 'l2', got {metric!r}")
    use_cos = metric == "cosine"
    cstruct = centroids.select(
        *([F.col(group_col)] if group_col else []),
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cvec"),
        (vec_norm(F.col(vec_col)) if use_cos else F.lit(0.0)).alias("cnorm"),
    )
    agg_cents = F.array_sort(
        F.collect_list(F.struct("cid", "cvec", "cnorm"))
    ).alias("__cents")
    carr = (
        cstruct.groupBy(group_col).agg(agg_cents)
        if group_col
        else cstruct.agg(agg_cents)
    )
    scored = F.transform(
        F.col("__cents"),
        lambda c: F.struct(
            F.round(
                cosine_from_norms(
                    F.col(vec_col), c["cvec"], F.col("__vnorm"), c["cnorm"]
                )
                if use_cos
                else l2sq_cols(F.col(vec_col), c["cvec"]),
                6,
            ).alias("cs"),
            c["cid"].alias("cid"),
        ),
    )
    # "better" = higher cosine / lower L2; the two when-branches flip
    better, worse = (F.lit(-1), F.lit(1))
    ranked = F.slice(
        F.array_sort(
            scored,
            lambda l, r: F.when(
                l["cs"] > r["cs"] if use_cos else l["cs"] < r["cs"], better
            )
            .when(l["cs"] < r["cs"] if use_cos else l["cs"] > r["cs"], worse)
            .when(l["cid"] < r["cid"], F.lit(-1))
            .when(l["cid"] > r["cid"], F.lit(1))
            .otherwise(F.lit(0)),
        ),
        1,
        n_assign,
    )
    out_cols = df.columns
    base = (
        df.withColumn("__vnorm", vec_norm(F.col(vec_col))) if use_cos else df
    )
    joined = (
        base.join(F.broadcast(carr), group_col)
        if group_col
        else base.crossJoin(F.broadcast(carr))
    )
    return (
        joined.select(*out_cols, F.explode(ranked).alias("__pick"))
        .select(*out_cols, F.col("__pick")["cid"].alias(centroid_id_col))
    )


def kmeans_train(
    corpus: DataFrame,
    seeds: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iterations: int = 2,
    weight_col: str | None = None,
    metric: str = "cosine",
    group_col: str | None = None,
) -> DataFrame:
    """Lloyd's k-means over an embedding column — trains the centroids
    that ``ivf_cosine_topk`` probes (completing the IVF story: index
    build, not just search). ``metric='l2'`` assigns by exact squared
    Euclidean instead of cosine — the quantizer objective PQ codebook
    training minimizes (``pq_train_codebooks``). ``group_col`` trains
    INDEPENDENT k-means per group in one pass (grouped assignment +
    group-keyed update shuffles) — m PQ subspaces cost one pipeline,
    not m.

    Scale shape per iteration:

    - **assign**: nearest centroid by cosine via ``ivf_assign`` —
      centroids broadcast, one map-side pass over the corpus;
    - **update**: per-dimension mean via ``posexplode`` + groupBy
      (centroid, dim). The explode looks expensive but is the RIGHT
      distributed shape: partial aggregation (map-side combine) reduces
      each partition to k x dim running sums before the shuffle, so
      shuffle volume is O(k x dim x partitions), independent of corpus
      size — unlike collecting raw vectors per centroid.

    Determinism: assignments round cosine to 6 decimals with centroid-id
    tie-break (``ivf_assign``); means go through scaled-long arithmetic —
    round(component·10^12) as long, exact 64-bit sums, two shared double
    divides — so every engine derives bit-identical centroids and the
    next iteration sees the same assignment. Empty clusters drop out
    (standard Lloyd's behavior).

    ``weight_col`` (integer multiplicity) trains on pre-collapsed
    distinct vectors: a rep with weight w contributes exactly what w
    byte-identical clones would (the scaled long multiplies by w before
    summing), so exact-dedup-first costs nothing in fidelity and removes
    the clone share of assignment + explode work. Headroom: |component|
    < 10^3 keeps each scaled term under 10^15; clusters up to ~10^3
    members-x-weight per dimension stay within the 9.2e18 long range.

    Returns (centroid_id, centroid array<double>, n_members) after
    ``iterations`` update steps (n_members counts weights).
    """
    scale = 10**12
    w_expr = F.col(weight_col) if weight_col else F.lit(1)
    grp = [group_col] if group_col else []
    cents = seeds.select(
        *grp, F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("__cent")
    )
    for _ in range(iterations):
        assigned = ivf_assign(
            corpus.withColumn("__w", w_expr),
            cents.select(
                *grp,
                F.col("centroid_id").alias(id_col),
                F.col("__cent").alias(vec_col),
            ),
            vec_col=vec_col,
            id_col=id_col,
            n_assign=1,
            metric=metric,
            group_col=group_col,
        )
        dims = assigned.select(
            *grp, "centroid_id", "__w",
            F.posexplode(F.col(vec_col)).alias("pos", "val"),
        )
        per_dim = dims.groupBy(*grp, "centroid_id", "pos").agg(
            (
                F.sum(F.round(F.col("val") * scale).cast("long") * F.col("__w"))
                .cast("double")
                / float(scale)
                / F.sum("__w")
            ).alias("val"),
            F.sum("__w").alias("n"),
        )
        cents = per_dim.groupBy(*grp, "centroid_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "val"))),
                lambda s: s["val"],
            ).alias("__cent"),
            F.first("n").alias("n_members"),
        )
    return cents.select(
        *grp, "centroid_id", F.col("__cent").alias("centroid"), "n_members"
    )


def ivf_cosine_topk(
    corpus: DataFrame,
    query: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    nprobe: int = 4,
    score_col: str = "cosine",
) -> DataFrame:
    """IVF-flat approximate nearest neighbours: the scale path for ANN.

    Index once: every corpus vector lands in exactly one inverted list
    (nearest centroid). Search: each query probes its ``nprobe`` nearest
    lists and scores only those candidates — at 1B vectors with 30k
    centroids and nprobe=32 this touches ~0.1% of the corpus per query,
    vs. 100% for brute force (``cosine_topk``). The candidate join keys on
    centroid_id, and the query side (queries × nprobe) is broadcast.
    Recall is approximate: a true neighbour assigned to an unprobed list
    is missed — the standard IVF trade-off.
    """
    assigned = ivf_assign(corpus, centroids, vec_col, id_col, n_assign=1).withColumn(
        "__vnorm", vec_norm(F.col(vec_col))
    )
    probes = ivf_assign(query, centroids, vec_col, id_col, n_assign=nprobe).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        vec_norm(F.col(vec_col)).alias("__qnorm"),
        "centroid_id",
    )
    scored = assigned.join(F.broadcast(probes), "centroid_id").select(
        "query_id",
        F.col(id_col),
        F.round(
            cosine_from_norms(
                F.col(vec_col), F.col("__qvec"), F.col("__vnorm"), F.col("__qnorm")
            ),
            6,
        ).alias(score_col),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(score_col), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .withColumnRenamed("__rn", "rank")
    )


def pq_codebooks(
    m: int, k: int, dim: int, seed: str = "pq"
) -> list[list[list[float]]]:
    """Deterministic product-quantization codebooks: ``m`` subspaces of
    ``dim/m`` dims, ``k`` centroids each, values in [-1, 1) derived from
    md5 — the same literals embed in any engine's SQL (the
    hyperplane_signs portability trick), so PQ encode/ADC is
    value-checkable against an external oracle without a shared RNG or
    a trained model artifact. Production swaps these for kmeans_train
    output per subspace; every downstream expression is unchanged."""
    import hashlib

    if dim % m:
        raise ValueError(f"dim {dim} must split evenly into {m} subspaces")
    sub = dim // m
    return [
        [
            [
                (int(hashlib.md5(f"{seed}{j}_{c}_{d}".encode()).hexdigest()[:8], 16)
                 / float(1 << 31)) - 1.0
                for d in range(sub)
            ]
            for c in range(k)
        ]
        for j in range(m)
    ]


def pq_train_codebooks(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iterations: int = 1,
    weight_col: str | None = None,
) -> list[list[list[float]]]:
    """TRAINED product-quantization codebooks: per subspace, L2 Lloyd's
    k-means (``kmeans_train(metric='l2')``) seeded from the slices of
    the ``k`` lowest ids PRESENT in the corpus (rank-based — a literal
    ``id < k`` filter would under-seed any corpus whose ids are sparse,
    e.g. clone-collapsed reps keeping min-id per distinct vector, and a
    1-seed book silently trains constant ADC distances). Returns the same nested-literal structure
    ``pq_codes``/``pq_adc_scores`` consume, so the md5-random
    ``pq_codebooks`` and this trainer are drop-in interchangeable — the
    production swap the pq_codebooks docstring promises, now exercised.

    The collect here is a MODEL ARTIFACT (m x k x dim/m doubles — a few
    KB regardless of corpus size), not a data collect: codebooks are
    broadcast back into the encode/ADC expressions as literals, exactly
    how a trained quantizer ships to a scan at 1B vectors. Each
    subspace's training is one map-side assignment pass plus a
    k x sub-sized shuffle per iteration (see kmeans_train); the corpus
    is never shuffled. Empty clusters drop out (standard Lloyd's), so a
    book may hold fewer than ``k`` centroids; code indices are the rank
    of the surviving centroid ids in ascending order on BOTH engines.
    """
    if dim % m:
        raise ValueError(f"dim {dim} must split evenly into {m} subspaces")
    sub = dim // m
    # all m subspaces train in ONE grouped pipeline: each vector
    # contributes m (subspace, slice) rows, assignment argmins only over
    # its subspace's centroids (group-keyed broadcast join), and the
    # update shuffles key on (subspace, centroid, dim) — one pass and
    # one model collect instead of m sequential trainings
    slices = corpus.select(
        F.col(id_col),
        *([F.col(weight_col)] if weight_col else []),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.slice(
                            F.col(vec_col).cast("array<double>"),
                            j * sub + 1,
                            sub,
                        ).alias("s"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("__e"),
    ).select(
        F.col(id_col),
        *([F.col(weight_col)] if weight_col else []),
        F.col("__e.j").alias("__j"),
        F.col("__e.s").alias("__s"),
    )
    seed_ids = corpus.select(id_col).orderBy(id_col).limit(k)
    cents = kmeans_train(
        slices,
        slices.join(F.broadcast(seed_ids), id_col),
        vec_col="__s",
        id_col=id_col,
        iterations=iterations,
        weight_col=weight_col,
        metric="l2",
        group_col="__j",
    )
    books: list[list[list[float]]] = [[] for _ in range(m)]
    for r in cents.orderBy("__j", "centroid_id").collect():
        books[r["__j"]].append([float(x) for x in r["centroid"]])
    return books


def _l2sq(slice_col: Column, centroid: list[float]) -> Column:
    """Exact sequential-sum squared L2 between a vector slice and a
    centroid literal — F.aggregate folds left-to-right, the same order
    DuckDB's list_sum uses, so the doubles match bit-for-bit."""
    pairs = F.zip_with(
        slice_col,
        F.array(*[F.lit(x) for x in centroid]),
        lambda a, b: (a - b) * (a - b),
    )
    return F.aggregate(pairs, F.lit(0.0), lambda acc, x: acc + x)


def pq_codes(vec: Column, codebooks: list[list[list[float]]]) -> Column:
    """PQ encoding: per subspace, the index of the nearest centroid
    (squared L2; ties -> lowest index). Returns array<int> of length m.
    Pure Column expressions — the corpus encodes map-side with ZERO
    shuffle, the property that makes PQ viable at billions of vectors
    (store m bytes, not dim floats)."""
    codes = []
    for j, book in enumerate(codebooks):
        sub = len(book[0])
        sl = F.slice(vec.cast("array<double>"), j * sub + 1, sub)
        # argmin via struct-min: (dist, idx) orders lexicographically, so
        # equal dists fall back to the lower index — same rule as the
        # oracle's list_position(dists, list_min(dists))
        cands = F.array(
            *[
                F.struct(
                    _l2sq(sl, c).alias("d"), F.lit(i).alias("i")
                )
                for i, c in enumerate(book)
            ]
        )
        codes.append(F.array_min(cands)["i"])
    return F.array(*codes)


def pq_adc_scores(
    corpus_codes: Column, query_vec: Column, codebooks: list[list[list[float]]]
) -> Column:
    """Asymmetric distance computation: the QUERY builds one m x k
    distance table (its slices vs every centroid — k*m small exprs, once
    per query row); each corpus row then sums m table LOOKUPS by its
    codes. No corpus-side vector math at query time — the entire scan
    cost is m element_at calls per row."""
    total = F.lit(0.0)
    for j, book in enumerate(codebooks):
        sub = len(book[0])
        qsl = F.slice(query_vec.cast("array<double>"), j * sub + 1, sub)
        dtable = F.array(*[_l2sq(qsl, c) for c in book])
        total = total + F.element_at(dtable, corpus_codes[j] + F.lit(1))
    return total
