"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random hyperplane / SRP) variant as the scale path. Dot products are
computed with ``F.zip_with`` + ``F.aggregate`` — JVM-side, no Python.

At 100 TB the brute-force form is only for (small query set) × (big
base): the base stays partitioned, queries broadcast. The SRP variant
turns the cross product into an equi-join on bucket signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def with_cosine(df: DataFrame, a_col: str, b_col: str, out: str = "cosine") -> DataFrame:
    a, b = F.col(a_col), F.col(b_col)
    return df.withColumn(out, _dot(a, b) / (_norm(a) * _norm(b)))


def cosine_topk_bruteforce(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    q_id: str = "vec_id",
    b_id: str = "vec_id",
    q_vec: str = "embedding",
    b_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries against the partitioned
    base, per-query top-k window. Output (query_id, neighbor_id,
    cosine, sim_rank); ties broken by neighbor id."""
    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("_qv"))
    b = base.select(F.col(b_id).alias("neighbor_id"), F.col(b_vec).alias("_bv"))
    pairs = b.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    pairs = pairs.withColumn(
        "cosine", _dot(F.col("_qv"), F.col("_bv")) / (_norm(F.col("_qv")) * _norm(F.col("_bv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "sim_rank")
    )


def srp_signature(df: DataFrame, vec_col: str, planes: list[list[float]], out: str = "srp_sig") -> DataFrame:
    """Signed-random-projection signature: one bit per hyperplane
    (deterministic plane list, supplied by the caller/planner). The
    signature is an integer — the LSH bucket key."""
    sig = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(v)) for v in plane])
        bit = (_dot(F.col(vec_col), arr) > 0).cast("bigint")
        sig = sig + bit * F.lit(1 << i).cast("bigint")
    return df.withColumn(out, sig)


def cosine_topk_srp(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    planes: list[list[float]],
    q_id: str = "vec_id",
    b_id: str = "vec_id",
    q_vec: str = "embedding",
    b_vec: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: SRP-bucket both sides, equi-join on the
    bucket signature, exact rerank within buckets. Recall is tuned by
    the number of planes (fewer planes → bigger buckets → higher recall,
    more compute). The equi-join on an integer key is the 100 TB path."""
    qs = srp_signature(
        queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("_qv")), "_qv", planes
    )
    bs = srp_signature(
        base.select(F.col(b_id).alias("neighbor_id"), F.col(b_vec).alias("_bv")), "_bv", planes
    )
    pairs = qs.join(bs, "srp_sig", "inner").filter(F.col("query_id") != F.col("neighbor_id"))
    pairs = pairs.withColumn(
        "cosine", _dot(F.col("_qv"), F.col("_bv")) / (_norm(F.col("_qv")) * _norm(F.col("_bv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "sim_rank")
    )


def label_centroids(df: DataFrame, vec_col: str, label_col: str) -> list[tuple[int, list[float]]]:
    """Element-wise mean vector per label → [(label, center), …] sorted
    by label. Driver-side collect of (n_labels × dim) doubles — the
    'fit' step of the IVF coarse quantizer (tiny; the big table never
    moves). posexplode+groupBy keeps the reduction map-side-combined."""
    rows = (
        df.select(F.col(label_col).alias("_lbl"), F.posexplode(F.col(vec_col)))
        .groupBy("_lbl", "pos")
        .agg(F.avg(F.col("col").cast("double")).alias("m"))
        .collect()
    )
    by_label: dict[int, dict[int, float]] = {}
    for r in rows:
        by_label.setdefault(r._lbl, {})[r.pos] = r.m
    return [
        (lbl, [d[p] for p in sorted(d)]) for lbl, d in sorted(by_label.items())
    ]


def _cell_scores(vec, centers: list[tuple[int, list[float]]]):
    """array<struct<neg_cos, cell>> — sortable cell ranking by cosine
    desc, cell asc. Centers are literal arrays (broadcast in the plan)."""
    n = _norm(vec)
    scored = []
    for cell, c in centers:
        arr = F.array(*[F.lit(float(v)) for v in c])
        cnorm = sum(v * v for v in c) ** 0.5
        scored.append(
            F.struct(
                (-(_dot(vec, arr) / (n * F.lit(cnorm)))).alias("neg_cos"),
                F.lit(int(cell)).alias("cell"),
            )
        )
    return F.array(*scored)


def cosine_topk_ivf(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    centers: list[tuple[int, list[float]]],
    nprobe: int = 3,
    q_id: str = "vec_id",
    b_id: str = "vec_id",
    q_vec: str = "embedding",
    b_vec: str = "embedding",
) -> DataFrame:
    """IVF-style approximate cosine top-k: a coarse quantizer (`centers`,
    e.g. KMeans or per-label centroids) partitions the base into cells;
    each query probes its `nprobe` nearest cells and reranks exactly
    inside them.

    Scale shape: base cell assignment is a map (argmax over a handful of
    centroid dot products); the probe is an equi-join on the integer
    cell id — candidate count ≈ nprobe/n_cells of the base, tunable
    recall/cost. With nprobe = n_cells this degrades gracefully to the
    exact answer. At 100 TB: repartition the base by cell (co-located
    probe join), broadcast the (tiny) query-probe side."""
    bs = base.select(
        F.col(b_id).alias("neighbor_id"), F.col(b_vec).alias("_bv")
    ).withColumn(
        "cell", F.element_at(F.array_sort(_cell_scores(F.col("_bv"), centers)), 1)["cell"]
    )
    qs = queries.select(
        F.col(q_id).alias("query_id"), F.col(q_vec).alias("_qv")
    ).withColumn(
        "cell",
        F.explode(
            F.transform(
                F.slice(F.array_sort(_cell_scores(F.col("_qv"), centers)), 1, nprobe),
                lambda s: s["cell"],
            )
        ),
    )
    pairs = qs.join(bs, "cell", "inner").filter(F.col("query_id") != F.col("neighbor_id"))
    pairs = pairs.withColumn(
        "cosine", _dot(F.col("_qv"), F.col("_bv")) / (_norm(F.col("_qv")) * _norm(F.col("_bv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "sim_rank")
    )
