"""Linear invariant oracles for the sf1 goldened queries (VERDICT r6
"Next" #4).

A golden hash proves run-to-run stability, not correctness: the
goldened queries are exactly those whose full DuckDB replay is
super-linear in SQL at sf1 (all-pairs LSH/shingle joins). But their
*outputs* are small, and correctness of the reported rows IS checkable
cross-engine in time linear in the output: recompute the exact
similarity for every reported pair from the base tables, assert the
ordering/threshold contracts, and replay the linear post-pair stages
(split labeling, connected components, dedup census) on the verified
pairs. An invariant CANNOT catch a missed pair — completeness remains
pinned by the sf0.01/0.001 full cross-engine proofs plus the golden —
but a reported value can no longer be wrong without a FAIL.

Each invariant: fn(spark, con, sf_dir, sdf, outputs) -> list[str]
(empty = pass). `outputs` caches earlier goldened queries' pandas
frames within one sweep (REGISTRY order puts minhash_near_dup_docs
before its consumers); a missing dependency is recomputed Spark-side
(the Spark pipeline is linear — only the SQL replay isn't).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geo_big_data_analysis_spark.plans.registry import (  # noqa: E402
    REGISTRY,
    _CLEAN_SQL,
    _SHINGLES_SQL,
)

#: shared doc→3-gram-shingle fragment (MATERIALIZED: referenced twice
#: by the pair join; DuckDB would otherwise inline and recompute it)
_SH_CTE = f"""
docs AS (SELECT doc_id, {_CLEAN_SQL} AS ct FROM documents),
sh AS MATERIALIZED (
  SELECT doc_id, {_SHINGLES_SQL} AS shingles
  FROM (SELECT doc_id, string_split(ct, ' ') AS toks FROM docs)
)
"""


def _minhash_pairs(spark, sf_dir, outputs):
    if "minhash_near_dup_docs" not in outputs:
        outputs["minhash_near_dup_docs"] = (
            REGISTRY["minhash_near_dup_docs"][0](spark, sf_dir).toPandas()
        )
    return outputs["minhash_near_dup_docs"]


def _pair_jaccard(spark, con, sf_dir, sdf, outputs, threshold: float):
    """Reported (doc_a, doc_b, jaccard) rows: recompute the exact
    3-gram Jaccard for every reported pair (linear in output), assert
    value equality, the threshold, and doc_a < doc_b."""
    con.register("rep_pairs", sdf)
    row = con.execute(f"""
WITH {_SH_CTE},
chk AS (
  SELECT r.doc_a, r.doc_b, r.jaccard,
         round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
               / len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS tru
  FROM rep_pairs r
  JOIN sh a ON a.doc_id = r.doc_a
  JOIN sh b ON b.doc_id = r.doc_b
)
SELECT count(*),
       sum(CASE WHEN tru <> jaccard THEN 1 ELSE 0 END),
       sum(CASE WHEN jaccard < {threshold} THEN 1 ELSE 0 END),
       sum(CASE WHEN doc_a >= doc_b THEN 1 ELSE 0 END)
FROM chk""").fetchone()
    msgs = []
    if row[0] != len(sdf):
        msgs.append(f"only {row[0]}/{len(sdf)} reported pairs joined to docs")
    if row[1]:
        msgs.append(f"{row[1]} reported jaccards != exact recompute")
    if row[2]:
        msgs.append(f"{row[2]} pairs below threshold {threshold}")
    if row[3]:
        msgs.append(f"{row[3]} pairs violate doc_a < doc_b")
    return msgs


def inv_minhash_near_dup(spark, con, sf_dir, sdf, outputs):
    outputs["minhash_near_dup_docs"] = sdf
    return _pair_jaccard(spark, con, sf_dir, sdf, outputs, 0.8)


def inv_ngram_jaccard(spark, con, sf_dir, sdf, outputs):
    return _pair_jaccard(spark, con, sf_dir, sdf, outputs, 0.5)


def inv_shingle_containment(spark, con, sf_dir, sdf, outputs):
    """Reported (doc_a, doc_b, containment, jaccard): exact recompute of
    BOTH scores per reported pair + the containment≥0.8 / jaccard≤0.5
    report contract."""
    con.register("rep_pairs", sdf)
    row = con.execute(f"""
WITH {_SH_CTE},
chk AS (
  SELECT r.*,
         len(list_intersect(a.shingles, b.shingles)) AS i,
         len(a.shingles) AS na, len(b.shingles) AS nb
  FROM rep_pairs r
  JOIN sh a ON a.doc_id = r.doc_a
  JOIN sh b ON b.doc_id = r.doc_b
)
SELECT count(*),
       sum(CASE WHEN round(i / least(na, nb)::DOUBLE, 6) <> containment
                THEN 1 ELSE 0 END),
       sum(CASE WHEN round(i / (na + nb - i)::DOUBLE, 6) <> jaccard
                THEN 1 ELSE 0 END),
       sum(CASE WHEN containment < 0.8 OR jaccard > 0.5 THEN 1 ELSE 0 END),
       sum(CASE WHEN doc_a >= doc_b THEN 1 ELSE 0 END)
FROM chk""").fetchone()
    msgs = []
    if row[0] != len(sdf):
        msgs.append(f"only {row[0]}/{len(sdf)} reported pairs joined to docs")
    if row[1]:
        msgs.append(f"{row[1]} containment values != exact recompute")
    if row[2]:
        msgs.append(f"{row[2]} jaccard values != exact recompute")
    if row[3]:
        msgs.append(f"{row[3]} pairs violate the cont>=0.8 & jac<=0.5 contract")
    if row[4]:
        msgs.append(f"{row[4]} pairs violate doc_a < doc_b")
    return msgs


def inv_near_dup_clusters(spark, con, sf_dir, sdf, outputs):
    """Reported cluster census must equal the connected components of
    the (invariant-verified) minhash near-dup pairs — the recursive
    closure runs over the pair OUTPUT, linear in pairs, never all-docs."""
    pairs = _minhash_pairs(spark, sf_dir, outputs)
    con.register("rep_pairs", pairs)
    con.register("rep_clusters", sdf)
    bad = con.execute("""
WITH RECURSIVE edges2 AS (
  SELECT doc_a AS a, doc_b AS b FROM rep_pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM rep_pairs
),
reach(id, r) AS (
  SELECT a, a FROM edges2
  UNION
  SELECT e.a, r.r FROM edges2 e JOIN reach r ON r.id = e.b
),
comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
census AS (SELECT comp AS cluster_rep, count(*)::BIGINT AS n_members
           FROM comp GROUP BY comp)
SELECT count(*) FROM census c
FULL JOIN rep_clusters r USING (cluster_rep)
WHERE c.n_members IS DISTINCT FROM r.n_members""").fetchone()[0]
    return (
        [f"{bad} cluster rows differ from the CC closure of verified pairs"]
        if bad
        else []
    )


def inv_split_leakage(spark, con, sf_dir, sdf, outputs):
    """Reported leakage census must equal relabeling the verified
    minhash pairs by the 90/5/5 hash split (pure linear SQL)."""
    pairs = _minhash_pairs(spark, sf_dir, outputs)
    con.register("rep_pairs", pairs)
    con.register("rep_cells", sdf)
    bad = con.execute("""
WITH assign AS (
  SELECT doc_id,
         CASE WHEN (doc_id * 2654435761) % 20 < 18 THEN 'train'
              WHEN (doc_id * 2654435761) % 20 = 18 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
labeled AS (
  SELECT least(sa.split, sb.split) AS split_a,
         greatest(sa.split, sb.split) AS split_b
  FROM rep_pairs p
  JOIN assign sa ON sa.doc_id = p.doc_a
  JOIN assign sb ON sb.doc_id = p.doc_b
),
census AS (
  SELECT split_a, split_b, count(*)::BIGINT AS n_pairs,
         split_a <> split_b AS is_leak
  FROM labeled GROUP BY 1, 2
)
SELECT count(*) FROM census c
FULL JOIN rep_cells r USING (split_a, split_b)
WHERE c.n_pairs IS DISTINCT FROM r.n_pairs
   OR c.is_leak IS DISTINCT FROM r.is_leak""").fetchone()[0]
    return (
        [f"{bad} leakage cells differ from relabeled verified pairs"]
        if bad
        else []
    )


def inv_training_corpus(spark, con, sf_dir, sdf, outputs):
    """Full pipeline replay with the ONE super-linear stage (near-dup
    pair generation) substituted by the verified minhash pairs: exact
    dedup, domination filter, quality gate, and per-source census are
    all linear SQL. A pair over the deduped set is a pair over docs
    with both endpoints kept, so the substitution is exact."""
    from geo_big_data_analysis_spark.plans.registry import (
        _SQL_CORPUS_PIPELINE,
    )

    pairs = _minhash_pairs(spark, sf_dir, outputs)
    con.register("rep_pairs", pairs)
    con.register("rep_corpus", sdf)
    # splice: reuse the committed oracle text verbatim from `survivors`
    # on; replace docs0..dup_pairs with the kept-endpoint filter
    tail = _SQL_CORPUS_PIPELINE.split("survivors AS (", 1)[1]
    sql = f"""
WITH docs0 AS (SELECT doc_id, source, text, {_CLEAN_SQL} AS ct FROM documents),
keep AS (SELECT min(doc_id) AS doc_id FROM docs0 GROUP BY ct),
uniq AS (SELECT d.doc_id, d.source, d.text, d.ct
         FROM docs0 d JOIN keep k USING (doc_id)),
dup_pairs AS (
  SELECT r.doc_a, r.doc_b FROM rep_pairs r
  JOIN keep k1 ON k1.doc_id = r.doc_a
  JOIN keep k2 ON k2.doc_id = r.doc_b
),
survivors AS ({tail}
"""
    got = con.execute(sql).fetchdf()
    con.register("replayed", got)
    bad = con.execute("""
SELECT count(*) FROM replayed g FULL JOIN rep_corpus r USING (source)
WHERE g.n_docs IS DISTINCT FROM r.n_docs
   OR g.total_tokens IS DISTINCT FROM r.total_tokens
   OR g.avg_quality IS DISTINCT FROM r.avg_quality""").fetchone()[0]
    return (
        [f"{bad} corpus census rows differ from verified-pair replay"]
        if bad
        else []
    )


def inv_distance_band(spark, con, sf_dir, sdf, outputs):
    """The output is one aggregate row over a density-bound (∝n²) pair
    set — no output-linear exact replay exists. Bound it: n_a_matched
    ≤ purchase count, n_pairs ≥ n_a_matched, 0 < avg_km ≤ 2.0 (the
    band radius). Weaker than a value check, stated as such."""
    from geo_big_data_analysis_spark.plans.registry import (
        _DERIVED_POINTS_SQL,
    )

    r = sdf.iloc[0]
    n_purch = con.execute(
        f"SELECT count(*) FROM ({_DERIVED_POINTS_SQL}) "
        "WHERE event_type = 'purchase'"
    ).fetchone()[0]
    msgs = []
    if not (0 < r["n_a_matched"] <= n_purch):
        msgs.append(f"n_a_matched {r['n_a_matched']} outside (0, {n_purch}]")
    if r["n_pairs"] < r["n_a_matched"]:
        msgs.append("n_pairs < n_a_matched")
    if not (0.0 < r["avg_km"] <= 2.0):
        msgs.append(f"avg_km {r['avg_km']} outside (0, 2.0]")
    return msgs


#: query name -> invariant fn; PASSg lines gain "+invariant" when the
#: check runs clean (tests/test_selfcheck_record gates this for r7+)
INVARIANTS = {
    "minhash_near_dup_docs": inv_minhash_near_dup,
    "ngram_jaccard_pairs": inv_ngram_jaccard,
    "shingle_containment_pairs": inv_shingle_containment,
    "near_dup_clusters_docs": inv_near_dup_clusters,
    "split_leakage_audit": inv_split_leakage,
    "training_corpus_pipeline": inv_training_corpus,
    "distance_band_pairs": inv_distance_band,
}
