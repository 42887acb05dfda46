"""String-similarity scalars Spark lacks natively.

`jaro_winkler` implements the full Jaro-Winkler similarity (matching
window, one-to-one greedy character matching, half-transposition count,
Winkler prefix boost gated at 0.7) as ONE pure column expression —
whole-stage codegen, no Python UDF. The cross-engine oracle is DuckDB's
independent built-in ``jaro_winkler_similarity`` (a separate C++
implementation), making this one of the few operators checked against a
*foreign* implementation rather than a SQL replay.

Semantics (verified against DuckDB on the standard literature pairs —
martha/marhta 0.9611…, dixon/dicksonx 0.8133…, dwayne/duane 0.84):
  window  = max(|s1|,|s2|)/2 - 1 (integer division)
  match   = for each s1 char left-to-right, the smallest unused s2
            position within the window holding the same char
  t       = (positions where the matched sequences disagree) div 2 —
            INTEGER division (DuckDB/RapidFuzz convention; the
            textbook's fractional /2 disagrees on odd mismatch counts)
  jaro    = (m/|s1| + m/|s2| + (m-t)/m) / 3      (0 if m = 0)
  jw      = jaro + l·0.1·(1-jaro) if jaro > 0.7 else jaro
            (l = common prefix length, capped at 4)
  equal non-empty strings → 1.0 (covers the degenerate |s|=1
  window=-1 case); '' vs '' → 0.0 (DuckDB convention).

The greedy one-to-one matching is a fold (``aggregate`` HOF) over s1
positions carrying a (used-positions array, matched-chars string)
state — O(|s|) state evaluated entirely inside codegen. The fold
expression appears several times in the final tree (m, m1, s2m, t);
callers should project it once per pair (the builder wraps everything
in one scalar), and Spark's subexpression elimination collapses the
duplicates inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def jaro_winkler_sql(a: str, b: str) -> str:
    """Spark-SQL expression text for jaro_winkler(a, b); ``a``/``b``
    are column names or SQL sub-expressions yielding strings."""
    window = f"(int(greatest(length({a}), length({b}))) div 2 - 1)"
    cand = (
        f"CASE WHEN least(int(length({b})), i + {window})"
        f" >= greatest(1, i - {window}) THEN"
        f" array_min(filter("
        f"sequence(greatest(1, i - {window}),"
        f" least(int(length({b})), i + {window})),"
        f" j -> substring({b}, j, 1) = substring({a}, i, 1)"
        f" AND NOT array_contains(acc.used, j)))"
        f" ELSE NULL END"
    )
    fold = (
        f"aggregate(sequence(1, int(length({a}))),"
        f" named_struct('used', cast(array() as array<bigint>), 'm1', ''),"
        f" (acc, i) -> CASE WHEN ({cand}) IS NULL THEN acc"
        f" ELSE named_struct('used', concat(acc.used, array(({cand}))),"
        f" 'm1', concat(acc.m1, substring({a}, i, 1))) END)"
    )
    # let-binding via single-element transform: binds each intermediate
    # ONCE — without this, the match fold / matched-s2 string /
    # transposition fold are re-evaluated at every reference site
    # inside the lambda tree (measured 100x slowdown at 40-char names).
    def let(var: str, val: str, body: str) -> str:
        return f"element_at(transform(array({val}), {var} -> ({body})), 1)"

    st = "__jw_st"
    m = f"cast(size({st}.used) as double)"
    s2m_val = (
        f"array_join(transform(array_sort({st}.used),"
        f" j -> substring({b}, j, 1)), '')"
    )
    s2 = "__jw_s2m"
    # transpositions: mismatched positions div 2 — INTEGER division,
    # matching DuckDB/RapidFuzz (an odd mismatch count floors; the
    # textbook's fractional t/2 differs on e.g. 39-char vs 5-char pairs)
    t = (
        f"cast((aggregate(sequence(1, int({m})), 0, (x, k) -> x +"
        f" IF(substring({st}.m1, k, 1) = substring({s2}, k, 1), 0, 1))"
        f" div 2) as double)"
    )
    jaro_val = (
        f"CASE WHEN size({st}.used) = 0 THEN 0.0D ELSE"
        f" (({m} / length({a}) + {m} / length({b})"
        f" + ({m} - {t}) / {m}) / 3.0D) END"
    )
    conds: list[str] = []
    for j in range(1, 5):
        this = (
            f"({j} <= least(length({a}), length({b}))"
            f" AND substring({a}, {j}, 1) = substring({b}, {j}, 1))"
        )
        conds.append(this if not conds else f"({conds[-1]} AND {this})")
    pl = "(" + " + ".join(f"IF({c}, 1, 0)" for c in conds) + ")"
    jv = "__jw_j"
    boost = (
        f"CASE WHEN {jv} > 0.7D"
        f" THEN {jv} + {pl} * 0.1D * (1.0D - {jv})"
        f" ELSE {jv} END"
    )
    let_bound = let(st, fold, let(s2, s2m_val, let(jv, jaro_val, boost)))
    # empty-before-equal: DuckDB scores '' vs '' as 0.0, not 1.0
    return (
        f"CASE WHEN {a} IS NULL OR {b} IS NULL THEN CAST(NULL AS DOUBLE)"
        f" WHEN length({a}) = 0 OR length({b}) = 0 THEN 0.0D"
        f" WHEN {a} = {b} THEN 1.0D"
        f" ELSE {let_bound} END"
    )


def jaro_winkler(a: str, b: str) -> Column:
    """Jaro-Winkler similarity of two string columns (referenced by
    name or SQL sub-expression) as a double in [0, 1]."""
    return F.expr(jaro_winkler_sql(a, b))


def _jw_py(s1: str | None, s2: str | None) -> float | None:
    """Scalar Jaro-Winkler, bit-identical semantics to
    ``jaro_winkler_sql`` (greedy smallest-unused-position matching,
    integer-division transpositions, 0.7 boost gate, prefix cap 4,
    DuckDB's ''-vs-'' = 0.0 convention)."""
    if s1 is None or s2 is None:
        return None
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(l1, l2) // 2 - 1
    used = [False] * l2
    m1: list[str] = []
    m2pos: list[int] = []
    for i in range(l1):
        c = s1[i]
        for j in range(max(0, i - window), min(l2 - 1, i + window) + 1):
            if not used[j] and s2[j] == c:
                used[j] = True
                m1.append(c)
                m2pos.append(j)
                break
    m = len(m1)
    if m == 0:
        return 0.0
    m2pos.sort()
    t = sum(1 for k in range(m) if m1[k] != s2[m2pos[k]]) // 2
    jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if jaro > 0.7:
        pl = 0
        for k in range(min(4, l1, l2)):
            if s1[k] != s2[k]:
                break
            pl += 1
        jaro = jaro + pl * 0.1 * (1.0 - jaro)
    return jaro


def jaro_winkler_pandas(a, b) -> Column:
    """Arrow-batched Jaro-Winkler — SURVEY §2.12's warranted pandas
    crossing: the codegen expression above costs ~0.4 ms/pair (nested
    HOF folds re-entered per reference site), this scalar loop ~5 µs.
    Use when JW is the hot inner loop over many candidate pairs
    (geocode fuzzy fallback); use ``jaro_winkler`` when a handful of
    evaluations rides along inside an otherwise codegen stage.

    pandas/pyspark import lazily (expression-only users of this module
    never pay them) and the constructed UDF is cached at module scope —
    registering a fresh pandas_udf per call re-serialized the wrapped
    function every time (ADVICE r7)."""
    global _JW_PANDAS_UDF
    if _JW_PANDAS_UDF is None:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        # `from __future__ import annotations` makes the pd.Series type
        # hints below lazy strings that pandas_udf resolves against this
        # MODULE's globals — bind pd there for the one-time resolution
        globals()["pd"] = pd

        @pandas_udf("double")
        def _jw(sa: pd.Series, sb: pd.Series) -> pd.Series:
            return pd.Series(
                [_jw_py(x, y) for x, y in zip(sa, sb)], dtype="float64"
            )

        _JW_PANDAS_UDF = _jw
    return _JW_PANDAS_UDF(a, b)


_JW_PANDAS_UDF = None
