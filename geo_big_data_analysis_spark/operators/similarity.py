"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and two approximate
scale paths: SRP-LSH buckets and IVF centroid cells — both turn the
cross product into an equi-join on an integer key.

Expression strategy (measured, sf0.1, local[32]):
- Constant vectors (centroids, SRP planes) enter the plan as ONE
  ``F.expr("array(…D)")`` text literal each — building them as
  ``F.array(*[F.lit(v)…])`` costs a py4j round-trip per element
  (~1.5 s of pure driver time per IVF plan at 10 centers × 64 dims).
- Dot products against them stay Column-API ``aggregate``/``zip_with``
  folds: the fold is interpreted per row, but a fully unrolled
  ``v[0]*w[0] + …`` alternative generates a method past the JIT limit
  once ~10 centers are inlined (observed 3× slower + multi-MB task
  binaries), and a parsed-SQL HOF re-compiles ~0.4 s worse per stage.
- The per-pair cosine (the true hot path: candidates × dim) IS
  unrolled via ``_cosine_sql`` when dim is known — one 3·dim-term
  expression whole-stage-codegens fine and skips the interpreter where
  row counts are largest.
All folds/sums are left-associated identically, so results (and the
DuckDB ``list_dot_product`` oracles) stay bit-identical across the
paths.

At 100 TB the brute-force form is only for (small query set) × (big
base): the base stays partitioned, queries broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot_sql(a: str, b: str, dim: int) -> str:
    return " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(dim))


def _const_array(vec: list[float]) -> Column:
    """Constant double-array literal via one parsed expression (one py4j
    call total, vs one per element through the Column API)."""
    return F.expr("array(" + ", ".join(f"{float(v)!r}D" for v in vec) + ")")


def _cosine_sql(qv: str, bv: str, dim: int) -> str:
    return (
        f"({_dot_sql(qv, bv, dim)})"
        f" / (sqrt({_dot_sql(qv, qv, dim)}) * sqrt({_dot_sql(bv, bv, dim)}))"
    )


def _dot(a, b):
    """Dynamic-dim fallback: interpreted HOF fold (left-assoc, init 0.0
    — same fp order as the unrolled form)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def _cosine_col(qv: str, bv: str, dim: int | None) -> Column:
    if dim:
        return F.expr(_cosine_sql(qv, bv, dim))
    return _dot(F.col(qv), F.col(bv)) / (_norm(F.col(qv)) * _norm(F.col(bv)))


def with_cosine(
    df: DataFrame, a_col: str, b_col: str, out: str = "cosine", dim: int | None = None
) -> DataFrame:
    return df.withColumn(out, _cosine_col(a_col, b_col, dim))


def _topk(pairs: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "sim_rank")
    )


def cosine_topk_bruteforce(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    q_id: str = "vec_id",
    b_id: str = "vec_id",
    q_vec: str = "embedding",
    b_vec: str = "embedding",
    exclude_self: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries against the partitioned
    base, per-query top-k window. Output (query_id, neighbor_id,
    cosine, sim_rank); ties broken by neighbor id."""
    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("_qv"))
    b = base.select(F.col(b_id).alias("neighbor_id"), F.col(b_vec).alias("_bv"))
    pairs = b.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    return _topk(pairs.withColumn("cosine", _cosine_col("_qv", "_bv", dim)), k)


def cosine_topk_pandas(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    q_id: str = "vec_id",
    b_id: str = "vec_id",
    q_vec: str = "embedding",
    b_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k, Arrow/numpy path: the vectorized-Pandas-UDF
    alternative to the codegen'd unrolled cosine
    (:func:`cosine_topk_bruteforce`). The (small) query matrix is
    row-normalized on the driver and broadcast; each base Arrow batch
    is one ``numpy`` matmul (batch×dim @ dim×q) followed by a
    per-column argpartition for the batch-local top-k, so only
    queries×k candidate rows per batch reach the global top-k window —
    the partial-top-k-then-merge shape that scales with base rows, not
    pairs. Same tie rule (cosine desc, neighbor id asc) as the JVM
    path; fp sums differ in association order, so cosines agree to
    ~1e-12 relative, not bitwise (pytest pins set-parity)."""
    import numpy as np
    import pandas as pd

    qrows = queries.select(q_id, q_vec).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([r[1] for r in qrows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    bc = base.sparkSession.sparkContext.broadcast((qids, Qn))

    def gen(batches):
        bqids, bQn = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            B = np.stack(pdf["_bv"].to_numpy())
            ids = pdf["_bid"].to_numpy()
            Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
            S = Bn @ bQn.T  # batch × queries
            kk = min(k + 1, len(ids))  # +1 absorbs a possible self-hit
            out_q, out_n, out_c = [], [], []
            for j, qid in enumerate(bqids):
                col = S[:, j]
                top = np.argpartition(-col, kk - 1)[:kk]
                for t in top:
                    if exclude_self and ids[t] == qid:
                        continue
                    out_q.append(qid)
                    out_n.append(ids[t])
                    out_c.append(col[t])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
            )

    cand = base.select(
        F.col(b_id).alias("_bid"), F.col(b_vec).alias("_bv")
    ).mapInPandas(gen, "query_id bigint, neighbor_id bigint, cosine double")
    return _topk(cand, k)


def srp_signature(
    df: DataFrame, vec_col: str, planes: list[list[float]], out: str = "srp_sig"
) -> DataFrame:
    """Signed-random-projection signature: one bit per hyperplane
    (deterministic plane list, supplied by the caller/planner). The
    signature is an integer — the LSH bucket key."""
    sig = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        bit = (_dot(F.col(vec_col), _const_array(plane)) > 0).cast("bigint")
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
    dim = len(planes[0]) if planes else None
    qs = srp_signature(
        queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("_qv")),
        "_qv",
        planes,
    )
    bs = srp_signature(
        base.select(F.col(b_id).alias("neighbor_id"), F.col(b_vec).alias("_bv")),
        "_bv",
        planes,
    )
    pairs = qs.join(bs, "srp_sig", "inner").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    return _topk(pairs.withColumn("cosine", _cosine_col("_qv", "_bv", dim)), k)


def _srp_sig_expr(planes: list[list[float]], vec_col: str) -> Column:
    """Signature as ONE parsed expression per table. The dot stays an
    aggregate/zip_with HOF — bit-identical fp order to the Column-API
    fold it replaced and the same interpreted evaluation — but parsing
    one string replaces ~60 py4j round-trips per table (measured ~2 s
    of driver plan-build across 8 tables). NOTE: an unrolled 64-term
    constant dot was tried and REVERTED — 8 tables × 4 planes × 64
    terms in one Generate projection overflows janino's method limit,
    and the whole-stage fallback ran ~30× slower interpreted."""
    terms = []
    for i, plane in enumerate(planes):
        arr = "array(" + ", ".join(f"{float(v)!r}D" for v in plane) + ")"
        dot = (
            f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> x * y), "
            f"0D, (acc, v) -> acc + v)"
        )
        terms.append(
            f"(CASE WHEN ({dot}) > 0D THEN CAST({1 << i} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END)"
        )
    return F.expr("(" + " + ".join(terms) + ")")


def cosine_topk_srp_multi(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    tables: list[list[list[float]]],
    q_id: str = "vec_id",
    b_id: str = "vec_id",
    q_vec: str = "embedding",
    b_vec: str = "embedding",
) -> DataFrame:
    """Multi-table SRP-LSH — the standard recall amplifier: L
    independent plane sets, candidates = UNION of per-table bucket
    matches (a near-neighbor is missed only if it collides in NONE of
    the L tables: miss ≈ (1-p^b)^L vs (1-p^b) single-table), then one
    exact rerank over the deduped candidate set.

    Scale shape: each side explodes to L (table, sig) rows — the same
    banding pattern as MinHash-LSH — so the probe is one equi-join on
    (table, sig); candidates dedup on ids BEFORE vectors are re-joined
    for the rerank, so the wide arrays never ride through the
    explode/union."""
    dim = len(tables[0][0])

    def banded(df: DataFrame, idc: str, vecc: str, out_id: str) -> DataFrame:
        # r9: numpy signature kernel (guide §4.2) — bit-identical to the
        # former _srp_sig_expr HOF build, see _srp_sig_rows_numpy
        return _srp_sig_rows_numpy(df, tables, idc, vecc, out_id)

    cand = (
        banded(queries, q_id, q_vec, "query_id")
        .join(banded(base, b_id, b_vec, "neighbor_id"), ["t", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("_qv"))
    bv = base.select(F.col(b_id).alias("neighbor_id"), F.col(b_vec).alias("_bv"))
    pairs = cand.join(qv, "query_id").join(bv, "neighbor_id")
    return _topk(pairs.withColumn("cosine", _cosine_col("_qv", "_bv", dim)), k)


#: The exact all-pairs path refuses inputs beyond this row count
#: unless the caller passes ``force_exact=True`` — an O(n²·d) plan has
#: no place in a default code path at scale (VERDICT r1 #4).
EXACT_NEAR_DUP_MAX_ROWS = 100_000


def _split_planes(n: int, dim: int) -> list[list[float]]:
    """Deterministic hyperplanes for skew splitting, coefficients from
    splitmix64 finalization over the (plane, dim) index. NOT the
    registry's LCG family: LCG outputs over sequential indices carry
    lattice structure that measurably correlates with LCG-generated
    fixture data — at the sf10 fixture, LCG split planes left the
    hottest 3,325-member bucket intact (every member on the same side
    of 16 'fresh' planes) while hash-mixed planes split it ~50/50 per
    bit. The planes are plain Python floats baked as literals, so the
    split stays run-to-run deterministic."""
    mask = (1 << 64) - 1

    def h(k: int) -> float:
        x = (k * 0x9E3779B97F4A7C15) & mask
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & mask
        x ^= x >> 27
        x = (x * 0x94D049BB133111EB) & mask
        x ^= x >> 31
        return x / 2.0**64 - 0.5

    return [[h(1 + p * dim + d) for d in range(dim)] for p in range(n)]


#: skew-split extension never exceeds this many extra signature bits
_SPLIT_MAX_EXTRA = 16


def _srp_sig_rows_numpy(
    df: DataFrame,
    tables: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    out_id: str,
    center: list[float] | None = None,
) -> DataFrame:
    """SRP signature ROWS (out_id, t, sig) via an Arrow-batched numpy
    kernel (guide §4.2) — replaces the interpreted ``aggregate∘zip_with``
    HOF dots of :func:`_srp_sig_expr` (CodegenFallback, the measured
    dominant cost of every SRP query) with vectorized native code.

    Bit-identical fp: the HOF fold is ``((0D + p0) + p1) + …`` and
    ``np.cumsum(V * p, axis=1)[:, -1]`` is the same left-associated
    chain (0.0 + p0 == p0 exactly); the sign test and bit packing are
    integer-exact. With ``center`` the input is shifted elementwise
    first — the same double subtraction as the ``zip_with(x - y)``
    centering of the skew-split path."""
    tbls = [[[float(x) for x in p] for p in tbl] for tbl in tables]
    mu = [float(x) for x in center] if center is not None else None
    schema = f"{out_id} bigint, t int, sig bigint"

    def gen(batches):
        import numpy as np
        import pandas as pd

        planes = [np.asarray(tbl, dtype=np.float64) for tbl in tbls]
        mu_a = np.asarray(mu, dtype=np.float64) if mu is not None else None
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if mu_a is not None:
                V = V - mu_a
            frames = []
            for t, tp in enumerate(planes):
                sig = np.zeros(len(ids), dtype=np.int64)
                for i in range(tp.shape[0]):
                    dot = np.cumsum(V * tp[i], axis=1)[:, -1]
                    sig |= (dot > 0).astype(np.int64) << i
                frames.append(
                    pd.DataFrame(
                        {
                            out_id: ids,
                            "t": np.full(len(ids), t, dtype=np.int32),
                            "sig": sig,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(gen, schema)


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float,
    tables: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    force_exact: bool = False,
    exact_max_rows: int = EXACT_NEAR_DUP_MAX_ROWS,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate embedding pairs (cosine ≥ threshold), DEFAULT
    path = multi-table SRP-LSH candidate generation + exact cosine
    verification — banding equi-join on (table, signature), no cross
    product, the 100 TB shape. A true near-dup pair is missed only if
    its vectors collide in none of the L tables (miss ≈ (1−p^b)^L).

    ``exact=True`` is the all-pairs oracle baseline: guarded by
    ``exact_max_rows`` (ValueError beyond it unless ``force_exact``) so
    the O(n²) plan cannot be reached by accident on a large table.

    ``bucket_cap`` enables skew-adaptive bucket splitting — the LSH
    analogue of AQE's skew-join handling. Clustered embeddings pile
    into a few signatures regardless of plane count (measured at the
    sf10 fixture: max occupancy 3,325 of 200k vectors, 169M candidate
    pairs per table, a >70 GB verify shuffle that spilled out the
    disk). With a cap, per-(t, sig) occupancy is counted (map-side
    combinable agg, bucket-cardinality output), buckets over the cap
    get ``ceil(log2(occ/cap))`` extra signature bits from a DISJOINT
    deterministic plane family, and the candidate join key becomes
    (t, depth, sig) — depth keeps split and unsplit signature spaces
    prefix-safe. Cost: one tiny agg + one broadcast join + one re-hash
    of only the hot rows (linear in n, never in pairs). Recall: a pair
    split apart here can still collide in any other table — the same
    (1−p^b)^L contract, with b grown only inside hot buckets. Default
    OFF so oracle-replayed queries keep their exact bucket geometry.

    Output: (id_a, id_b, cosine) with id_a < id_b.
    """
    from .spread import spread

    # The SRP signatures below are interpreted HOF dots (CodegenFallback
    # — see _srp_sig_expr) and the norms are unrolled dots: per-row cost
    # is orders of magnitude above the bytes, and the fixture scan is a
    # single task. Spread before computing either (guide §2.5); every
    # downstream step is a key join or aggregate, partitioning-free.
    e = spread(
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    )
    if exact:
        if not force_exact:
            n = e.count()
            if n > exact_max_rows:
                raise ValueError(
                    f"exact all-pairs near-dup on {n} rows exceeds "
                    f"exact_max_rows={exact_max_rows}; use the default "
                    "SRP path or pass force_exact=True"
                )
        norm = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
        wn = e.select("vec_id", "embedding", norm.alias("nrm"))
        a = wn.select(
            F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), F.col("nrm").alias("na")
        )
        b = wn.select(
            F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), F.col("nrm").alias("nb")
        )
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
        cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        return (
            pairs.withColumn("cosine", cos)
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine")
        )

    dim = len(tables[0][0])

    def banded(df: DataFrame, out_id: str) -> DataFrame:
        # r9: numpy signature kernel (guide §4.2) — bit-identical to the
        # former _srp_sig_expr HOF build, see _srp_sig_rows_numpy
        return _srp_sig_rows_numpy(df, tables, "vec_id", "embedding", out_id)

    # norms once per VECTOR (n of them), not per pair — the verify then
    # evaluates a single unrolled dot per candidate instead of three.
    # The lazy localCheckpoint is a projection barrier: without it the
    # join's inferred isnotnull(norm) re-evaluates the whole unrolled
    # dot inside the scan filter and the giant expression kicks the
    # stage out of whole-stage codegen (measured 8.8s → 1.9s at sf0.1).
    nrm = F.sqrt(F.expr(f"({_dot_sql('embedding', 'embedding', dim)})"))
    wn = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), nrm.alias("_n")
    ).localCheckpoint(eager=False)
    # signatures once: the HOF dot inside _srp_sig_expr is interpreted
    # (CodegenFallback), so evaluating the banded side twice for the
    # self-join doubles the dominant cost; the lazy checkpoint
    # materializes the (id, t, sig) rows — 3 integers per row — once.
    banded_all = banded(e, "vec_id").localCheckpoint(eager=False)
    join_keys = ["t", "sig"]
    if bucket_cap:
        occ = banded_all.groupBy("t", "sig").agg(F.count(F.lit(1)).alias("_occ"))
        two_pow = F.expr("shiftleft(cast(1 as bigint), _extra)")
        hot = occ.filter(F.col("_occ") > bucket_cap).select(
            "t",
            "sig",
            F.least(
                F.lit(_SPLIT_MAX_EXTRA),
                F.ceil(F.log2(F.col("_occ") / F.lit(float(bucket_cap)))),
            ).cast("int").alias("_extra"),
        )
        marked = banded_all.join(F.broadcast(hot), ["t", "sig"], "left")
        cold = marked.filter(F.col("_extra").isNull()).select(
            "vec_id", "t", F.lit(0).alias("depth"), "sig"
        )
        # Split bits hash MEAN-CENTERED directions: a hot bucket is hot
        # because its members share a dominant direction, and a
        # through-origin plane whose normal isn't near-orthogonal to
        # that direction puts them all on the same side (measured at
        # sf10: extension planes on RAW vectors left max occupancy
        # 3325 → 3293). Centering on the two-phase global mean spreads
        # the cone across the extension buckets, while a genuine
        # near-dup pair — a small perturbation relative to ‖v−μ‖ —
        # still agrees on the centered signs.
        # exact decimal sums (order-free on every engine), divided once
        # in double — the mean is bit-replayable by a SQL oracle, unlike
        # a double avg whose partial-aggregation order is free. Built as
        # ONE parsed selectExpr (r9, the _signature_from_hash_rows
        # lesson): the 64-column Column-API agg cost ~6 py4j round trips
        # per dim of pure driver plan-build — measured 3.9 s → 0.7 s for
        # this collect at sf0.1, identical values.
        tot = e.selectExpr(
            "count(1) AS _n",
            *[
                f"sum(cast(embedding[{d}] as decimal(30,10))) AS m{d}"
                for d in range(dim)
            ],
        ).collect()[0]
        mu = [float(tot[f"m{d}"]) / int(tot["_n"]) for d in range(dim)]
        # only the hot rows pay a vector re-join + re-hash; the masked
        # low `_extra` bits of the full extension signature append to
        # the base signature, depth disambiguates split widths.
        # r9: the 16 centered extension dots run in the numpy kernel
        # (same fp contract as the base signatures) and ONCE PER DISTINCT
        # hot VECTOR — the former per-(row, table) HOF evaluated them
        # L× per hot vector.
        hot_marked = marked.filter(F.col("_extra").isNotNull())
        hot_vecs = wn.join(
            hot_marked.select("vec_id"), "vec_id", "left_semi"
        ).select("vec_id", "embedding")
        ext_tbl = _srp_sig_rows_numpy(
            hot_vecs,
            [_split_planes(_SPLIT_MAX_EXTRA, dim)],
            "vec_id",
            "embedding",
            "vec_id",
            center=mu,
        ).select("vec_id", F.col("sig").alias("_ext"))
        hot_rows = (
            hot_marked.join(ext_tbl, "vec_id")
            .select(
                "vec_id",
                "t",
                F.col("_extra").alias("depth"),
                (F.col("sig") * two_pow + F.pmod(F.col("_ext"), two_pow)).alias("sig"),
            )
        )
        banded_all = cold.unionByName(hot_rows).localCheckpoint(eager=False)
        join_keys = ["t", "depth", "sig"]
    cand = (
        banded_all.alias("l")
        .join(
            banded_all.withColumnRenamed("vec_id", "id_b").alias("r"),
            join_keys,
        )
        .filter(F.col("vec_id") < F.col("id_b"))
        .select(F.col("vec_id").alias("id_a"), "id_b")
        .distinct()
    )
    va = wn.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), F.col("_n").alias("na"))
    vb = wn.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), F.col("_n").alias("nb"))
    pairs = cand.join(va, "id_a").join(vb, "id_b")
    cos = F.expr(f"({_dot_sql('va', 'vb', dim)})") / (F.col("na") * F.col("nb"))
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — codebook training, encoding, ADC search
# ---------------------------------------------------------------------------
# The third ANN index family next to SRP-LSH and IVF (Jégou et al. 2011
# "Product quantization for nearest neighbor search"): split the vector
# into m sub-blocks, train a small codebook per block, store each vector
# as m small code ids, search via asymmetric distance (query block
# distances to codebook centroids, summed over blocks). Training uses
# the exact integer Lloyd (`ml/lloyd.lloyd_kmeans_nd`) on scaled-int
# sub-coordinates, so codebooks — and therefore codes and ADC ranks —
# are bit-replayable by the DuckDB oracle.


def _pq_int_cols(vec_col: str, dims: list[int], scale: int) -> list[Column]:
    """Scaled-integer sub-coordinates: round(v[d]·scale) as bigint —
    HALF_UP in Spark and round-half-away in DuckDB agree for all signs.

    Built as ONE parsed string per column (guide §7.3: plan-BUILD time
    was the measured bottleneck — the Column-API chain cost ~6 py4j
    round-trips per dim, ~1.0 s per probe invocation for 64 dims;
    `F.expr` is one round-trip and the JVM parser builds the identical
    getItem/cast/round tree)."""
    return [
        F.expr(
            f"CAST(round(CAST({vec_col}[{d}] AS DOUBLE) * {scale}, 0) "
            f"AS BIGINT) AS c{d}"
        )
        for d in dims
    ]


def pq_train(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    k: int = 4,
    iters: int = 2,
    scale: int = 1000,
) -> list[list[list[float]]]:
    """Train m per-block codebooks (each k centroids of dim/m scaled-int
    coords) with the exact replayable Lloyd. Returns
    codebooks[block][code][sub_dim] in the SCALED integer space.

    All m independent sub-problems run TOGETHER: the input explodes to
    (id, block, c0..c{dsub−1}) rows and each Lloyd round is ONE
    codegen'd projection (per-block argmin via a when-chain) + ONE
    groupBy(block, cid) collecting m·k rows — 1 + iters Spark jobs
    total instead of m·(1 + iters). Identical arithmetic to training
    blocks separately (the oracle replays them separately)."""
    dsub = dim // m
    structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("block"),
                *[
                    F.round(F.col(vec_col)[b * dsub + j].cast("double") * scale, 0)
                    .cast("bigint")
                    .alias(f"c{j}")
                    for j in range(dsub)
                ],
            )
            for b in range(m)
        ]
    )
    pts = (
        emb.select(F.col(id_col).alias("id"), F.explode(structs).alias("s"))
        .select("id", "s.block", *[F.col(f"s.c{j}").alias(f"c{j}") for j in range(dsub)])
        .localCheckpoint()
    )

    init = pts.filter(
        F.col("id").isin(
            [r["id"] for r in emb.select(F.col(id_col).alias("id")).orderBy("id").limit(k).collect()]
        )
    ).collect()
    by_block: dict[int, list] = {}
    for r in sorted(init, key=lambda r: r["id"]):
        by_block.setdefault(r["block"], []).append([float(r[f"c{j}"]) for j in range(dsub)])
    if any(len(v) < k for v in by_block.values()) or len(by_block) < m:
        raise ValueError(f"need at least k={k} vectors to train PQ codebooks")
    codebooks = [by_block[b] for b in range(m)]

    from ..ml.lloyd import _argmin_cid_nd

    cols = [f"c{j}" for j in range(dsub)]
    for _ in range(iters):
        # per-block argmin as one when-chain (block 0 is the fallthrough)
        cid = None
        for b in range(m):
            arm = _argmin_cid_nd(codebooks[b], cols)
            cid = arm if cid is None else F.when(F.col("block") == F.lit(b), arm).otherwise(cid)
        agg = (
            pts.withColumn("cid", cid)
            .groupBy("block", "cid")
            .agg(
                *[F.sum(c).alias(f"s_{c}") for c in cols],
                F.count(F.lit(1)).alias("cnt"),
            )
            .collect()
        )
        got = {(r["block"], r["cid"]): r for r in agg}
        codebooks = [
            [
                [got[(b, i)][f"s_{c}"] / got[(b, i)]["cnt"] for c in cols]
                if (b, i) in got
                else codebooks[b][i]
                for i in range(k)
            ]
            for b in range(m)
        ]
    return codebooks


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Encode each vector as m code columns code_0..code_{m-1} (the
    nearest per-block centroid, lowest-index tie break)."""
    from ..ml.lloyd import _argmin_cid_nd

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    out = emb
    for b in range(m):
        dims = list(range(b * dsub, (b + 1) * dsub))
        cols = [f"c{d}" for d in dims]
        out = out.select("*", *_pq_int_cols(vec_col, dims, scale))
        out = out.withColumn(f"code_{b}", _argmin_cid_nd(codebooks[b], cols)).drop(*cols)
    return out.drop(vec_col)


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    k: int,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    b_id: str = "vec_id",
    scale: int = 1000,
) -> DataFrame:
    """Asymmetric-distance top-k: broadcast the (small) query side into
    the codes table; per pair the distance is Σ_b ‖q_b − C_b[code_b]‖²
    in the scaled space — element_at into literal centroid arrays, all
    codegen. Output (query_id, neighbor_id, adc_dist, pq_rank)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    q = queries.select(
        F.col(q_id).alias("query_id"),
        *_pq_int_cols(q_vec, list(range(m * dsub)), scale),
    )
    b = codes.select(
        F.col(b_id).alias("neighbor_id"), *[F.col(f"code_{i}") for i in range(m)]
    )
    pairs = b.crossJoin(F.broadcast(q)).filter(F.col("query_id") != F.col("neighbor_id"))
    pairs = pairs.withColumn("adc_dist", _adc_dist_col(codebooks))
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("pq_rank", F.row_number().over(w))
        .filter(F.col("pq_rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "pq_rank")
    )


#: value-keyed memo for :func:`_adc_dist_col` — the Column build costs
#: ~1.0 s of py4j round-trips per call; Columns are immutable
#: session-scoped expression wrappers, safe to reuse across DataFrames,
#: so one build per distinct codebook set per process suffices.
_ADC_COL_MEMO: dict[tuple, Column] = {}


def _adc_dist_col(codebooks: list[list[list[float]]]) -> Column:
    """ADC distance Σ_b ‖q_b − C_b[code_b]‖² as one codegen column.
    Expects the scaled-int query coords ``c0..c{dim-1}`` and the code
    columns ``code_0..code_{m-1}`` to be in scope; term order is the
    left-associated (block, sub-dim) chain the DuckDB oracle joins in
    the same order, so the double sums are bit-identical.

    Built through the Column API so the per-block codebook literal and
    centroid lookup are STRUCTURALLY SHARED subtrees (2·dsub references
    each): an equivalent flat SQL string duplicates the codebook
    literal per term — measured 1.2 MB task binaries and a 10×
    analysis/codegen blow-up on the composed IVF-PQ probe. The py4j
    build cost is paid once per codebook set via the value-keyed memo."""
    key = tuple(tuple(tuple(c) for c in blk) for blk in codebooks)
    hit = _ADC_COL_MEMO.get(key)
    if hit is not None:
        return hit
    dsub = len(codebooks[0][0])
    dist = None
    for blk in range(len(codebooks)):
        cb = F.expr(
            "array("
            + ", ".join(
                "array(" + ", ".join(f"{c!r}D" for c in ctr) + ")" for ctr in codebooks[blk]
            )
            + ")"
        )
        ctr = F.element_at(cb, F.col(f"code_{blk}") + 1)
        for j in range(dsub):
            d = blk * dsub + j
            qd = F.col(f"c{d}").cast("double")
            term = (qd - F.element_at(ctr, j + 1)) * (qd - F.element_at(ctr, j + 1))
            dist = term if dist is None else dist + term
    _ADC_COL_MEMO[key] = dist
    return dist


def ivfpq_topk(
    queries: DataFrame,
    base: DataFrame,
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    k: int,
    centers: list[tuple[int, list[float]]],
    nprobe: int = 3,
    q_id: str = "vec_id",
    b_id: str = "vec_id",
    q_vec: str = "embedding",
    b_vec: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """IVF-PQ composed index probe — the FAISS ``IVFPQ`` shape and the
    production 100 TB ANN layout: the coarse quantizer (`centers`)
    restricts each query to its `nprobe` nearest cells, and ranking
    inside the probed cells uses the PQ codes' asymmetric distance
    (codes are m small ints per vector — the only per-vector state the
    search touches; the raw vectors never ride through the join).

    Scale shape: base cell assignment + PQ encode are map-only; the
    probe is an equi-join on the integer cell id against a broadcast
    query-probe side; candidate count ≈ nprobe/n_cells of the base.
    Output (query_id, neighbor_id, adc_dist, pq_rank)."""
    m = len(codebooks)
    bs = (
        base.select(F.col(b_id).alias("neighbor_id"), F.col(b_vec).alias("_bv"))
        .withColumn("_n", F.expr(_norm_sql("_bv")))
        .withColumn(
            "cell",
            F.element_at(
                F.array_sort(F.expr(_cell_scores_sql("_bv", "_n", centers))), 1
            )["cell"],
        )
        .select("neighbor_id", "cell")
    )
    bcodes = codes.select(
        F.col(b_id).alias("neighbor_id"), *[F.col(f"code_{i}") for i in range(m)]
    ).join(bs, "neighbor_id")
    return ivfpq_probe(
        queries, bcodes, codebooks, centers, k,
        nprobe=nprobe, q_id=q_id, q_vec=q_vec, scale=scale,
    )


def ivfpq_probe(
    queries: DataFrame,
    coded_base: DataFrame,
    codebooks: list[list[list[float]]],
    centers: list[tuple[int, list[float]]],
    k: int,
    nprobe: int = 3,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Probe a PREPARED IVF-PQ index: ``coded_base`` already carries
    (neighbor_id, cell, code_0..code_{m-1}) — the stored-index shape
    (`sources/ann_index.py`). This is the build-once/probe-many hot
    path: the base side is a parquet scan of m+2 small ints per vector
    (raw vectors never load), the query side broadcasts with its
    ``nprobe`` probe cells exploded, and ranking is the codegen'd ADC
    distance. Output (query_id, neighbor_id, adc_dist, pq_rank)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    qs = (
        queries.select(
            F.col(q_id).alias("query_id"),
            F.col(q_vec).alias("_qv"),
            *_pq_int_cols(q_vec, list(range(m * dsub)), scale),
        )
        .withColumn("_n", F.expr(_norm_sql("_qv")))
        .withColumn(
            "cell",
            F.explode(
                F.transform(
                    F.slice(
                        F.array_sort(F.expr(_cell_scores_sql("_qv", "_n", centers))),
                        1,
                        nprobe,
                    ),
                    lambda s: s["cell"],
                )
            ),
        )
        .drop("_qv", "_n")
    )
    pairs = coded_base.join(F.broadcast(qs), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    pairs = pairs.withColumn("adc_dist", _adc_dist_col(codebooks))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("pq_rank", F.row_number().over(w))
        .filter(F.col("pq_rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "pq_rank")
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


def _norm_sql(vec_col: str) -> str:
    """Same fp order as :func:`_norm` (left-assoc fold with the
    defensive double cast), as a parsable string."""
    return (
        f"sqrt(aggregate({vec_col}, 0D, "
        f"(acc, v) -> acc + CAST(v AS DOUBLE) * v))"
    )


def _cell_scores_sql(
    vec_col: str, norm_col: str, centers: list[tuple[int, list[float]]]
) -> str:
    """array<struct<neg_cos, cell>> — sortable cell ranking by cosine
    desc, cell asc — as ONE parsed expression (the per-center
    Column-API/HOF loop cost ~1 s of py4j plan-build for ~10 centers;
    same fp order, so cell assignment is bit-identical). The row norm
    is referenced as a pre-projected column so interpreted HOF eval
    computes it once per row, not once per center."""
    structs = []
    for cell, c in centers:
        cnorm = sum(v * v for v in c) ** 0.5
        arr = "array(" + ", ".join(f"{float(v)!r}D" for v in c) + ")"
        dot = (
            f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> x * y), "
            f"0D, (acc, v) -> acc + v)"
        )
        structs.append(
            f"named_struct('neg_cos', -({dot} / ({norm_col} * {float(cnorm)!r}D)), "
            f"'cell', {int(cell)})"
        )
    return "array(" + ", ".join(structs) + ")"


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
    from .spread import spread

    dim = len(centers[0][1])
    # spread before the per-row cell sweep + rerank (guide §2.5): with
    # the broadcast probe join below there is no exchange after this
    # point, so scan parallelism IS the stage parallelism
    bs = (
        spread(base.select(F.col(b_id).alias("neighbor_id"), F.col(b_vec).alias("_bv")))
        .withColumn("_n", F.expr(_norm_sql("_bv")))
        .withColumn(
            "cell",
            F.element_at(
                F.array_sort(F.expr(_cell_scores_sql("_bv", "_n", centers))), 1
            )["cell"],
        )
        .drop("_n")
    )
    qs = (
        queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("_qv"))
        .withColumn("_n", F.expr(_norm_sql("_qv")))
        .withColumn(
            "cell",
            F.explode(
                F.transform(
                    F.slice(
                        F.array_sort(F.expr(_cell_scores_sql("_qv", "_n", centers))),
                        1,
                        nprobe,
                    ),
                    lambda s: s["cell"],
                )
            ),
        )
        .drop("_n")
    )
    # broadcast the (tiny) exploded probe side — the docstring's 100 TB
    # shape, and locally the fix for the cell key's low cardinality
    # (~n_labels distinct values): a hash join on it collapses the
    # rerank to ≤n_cells tasks, while the broadcast keeps the base side
    # at scan parallelism (guide §3.1)
    pairs = bs.join(F.broadcast(qs), "cell", "inner").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    return _topk(pairs.withColumn("cosine", _cosine_col("_qv", "_bv", dim)), k)


def ivf_cell_base(
    base: DataFrame,
    centers: list[tuple[int, list[float]]],
    b_id: str = "vec_id",
    b_vec: str = "embedding",
    b_label: str = "label",
) -> DataFrame:
    """Assign every base vector to its nearest coarse-quantizer cell:
    (negative_id, negative_label, _bv, cell). The per-row cell-score
    sweep (interpreted HOF dot per center) is the heavy map of the IVF
    family — callers running multiple probe variants should compute
    this once and share it (see `hard_negatives_ivf`)."""
    from .spread import spread

    return (
        spread(
            base.select(
                F.col(b_id).alias("negative_id"),
                F.col(b_label).alias("negative_label"),
                F.col(b_vec).alias("_bv"),
            )
        )
        .withColumn("_n", F.expr(_norm_sql("_bv")))
        .withColumn(
            "cell",
            F.element_at(
                F.array_sort(F.expr(_cell_scores_sql("_bv", "_n", centers))), 1
            )["cell"],
        )
        .drop("_n")
    )


def hard_negatives_ivf(
    queries: DataFrame,
    base: DataFrame,
    k: int,
    centers: list[tuple[int, list[float]]],
    nprobe: int = 3,
    q_id: str = "vec_id",
    b_id: str = "vec_id",
    q_vec: str = "embedding",
    b_vec: str = "embedding",
    q_label: str = "label",
    b_label: str = "label",
    celled_base: DataFrame | None = None,
) -> DataFrame:
    """Index-driven hard-negative mining (VERDICT r3 "Next" #4): the
    IVF candidate pre-stage of :func:`cosine_topk_ivf` — base vectors
    bucketed by nearest coarse centroid, each probe expanding to its
    ``nprobe`` nearest cells via an integer-cell equi-join — followed
    by the different-label filter and an exact cosine re-rank to the
    top-k strongest negatives. This is the shape a 100 TB contrastive-
    data job needs: candidates come from the index (≈ nprobe/n_cells
    of the base per probe), never from an all-pairs probe broadcast;
    the exact variant (`hard_negative_mining`) stays as the recall
    anchor.

    ``celled_base`` lets a caller running SEVERAL probe widths assign
    cells once (via :func:`ivf_cell_base`, ideally behind a lazy
    localCheckpoint): the per-row interpreted cell-score sweep over the
    whole base is the dominant cost, and without sharing it every
    variant re-pays it (guide §1.2 "don't compute things you throw
    away").

    Ranks on round(cosine, 6) like the exact anchor (rank at the
    compared precision, never raw floats). Returns (query_id,
    probe_label, rank, negative_id, negative_label, cosine)."""
    dim = len(centers[0][1])
    bs = (
        ivf_cell_base(base, centers, b_id, b_vec, b_label)
        if celled_base is None
        else celled_base
    )
    qs = (
        queries.select(
            F.col(q_id).alias("query_id"),
            F.col(q_label).alias("probe_label"),
            F.col(q_vec).alias("_qv"),
        )
        .withColumn("_n", F.expr(_norm_sql("_qv")))
        .withColumn(
            "cell",
            F.explode(
                F.transform(
                    F.slice(
                        F.array_sort(F.expr(_cell_scores_sql("_qv", "_n", centers))),
                        1,
                        nprobe,
                    ),
                    lambda s: s["cell"],
                )
            ),
        )
        .drop("_n")
    )
    # broadcast the probe side: the cell key has ~n_labels distinct
    # values, so a hash join on it caps rerank parallelism at n_cells
    # (guide §3.1; same shape as cosine_topk_ivf)
    pairs = (
        bs.join(F.broadcast(qs), "cell", "inner")
        .filter(F.col("probe_label") != F.col("negative_label"))
        .withColumn("cosine", F.round(_cosine_col("_qv", "_bv", dim), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("negative_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "probe_label", "rank",
            "negative_id", "negative_label", "cosine",
        )
    )
