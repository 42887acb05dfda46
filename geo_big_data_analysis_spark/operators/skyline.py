"""Distributed skyline (Pareto frontier) operator.

An operator family the reference lacks and Spark has no built-in for
(SURVEY §2 extension): keep the rows not dominated by any other row,
where q dominates p iff q is ≤ p on every minimized objective, ≥ p on
every maximized one, and strictly better on at least one.

Physical strategy (the textbook two-phase distributed skyline,
e.g. Börzsönyi et al.'s block-nested-loop with presorting, run
map-side then reduce-side):

1. **Local phase** — ``mapInPandas`` computes the skyline of each
   partition independently (Arrow-batched, numpy kernel). Sound
   because dominance is transitive: every *global* skyline point is a
   *local* skyline point of whichever partition holds it, so the local
   pass can only discard globally-dominated rows.
2. **Global phase** — the union of local skylines (O(frontier) per
   partition, typically ≪ partition size) is coalesced to one
   partition and the same kernel runs once more.

The kernel presorts lexicographically on the (sign-normalized)
objective vector: any dominator of p sorts strictly before p, so one
forward pass testing each candidate only against the *current skyline
set* is exact — O(n·s) for skyline size s, never the O(n²) all-pairs.

At 100 TB the local phase is embarrassingly parallel and the reduce
input is bounded by Σ per-partition frontier sizes; for pathological
(anti-correlated) data where frontiers stay large, add intermediate
tree-reduce rounds of the same kernel — the operator composes with
itself.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def _skyline_kernel(
    pdf: pd.DataFrame, minimize: list[str], maximize: list[str]
) -> pd.DataFrame:
    import numpy as np

    if len(pdf) == 0:
        return pdf
    # sign-normalize: all objectives become "minimize"
    obj = np.column_stack(
        [pdf[c].to_numpy(dtype=float) for c in minimize]
        + [-pdf[c].to_numpy(dtype=float) for c in maximize]
    )
    order = np.lexsort(tuple(obj[:, d] for d in reversed(range(obj.shape[1]))))
    obj = obj[order]
    kept_rows: list[int] = []
    kept = np.empty((0, obj.shape[1]))
    for i in range(obj.shape[0]):
        p = obj[i]
        if kept.shape[0]:
            # q dominates p ⇔ all(q <= p) and any(q < p)
            le = (kept <= p).all(axis=1)
            lt = (kept < p).any(axis=1)
            if (le & lt).any():
                continue
        kept_rows.append(order[i])
        kept = np.vstack([kept, p])
    return pdf.iloc[sorted(kept_rows)]


def skyline(
    df: DataFrame, minimize: list[str] | None = None, maximize: list[str] | None = None
) -> DataFrame:
    """Pareto frontier of ``df`` over the given objective columns.

    Returns the non-dominated rows with the original schema. Both
    phases run the same presort+BNL kernel; the global phase sees only
    the union of per-partition frontiers.
    """
    minimize = minimize or []
    maximize = maximize or []
    if not minimize and not maximize:
        raise ValueError("skyline needs at least one objective column")
    schema = df.schema

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _skyline_kernel(pdf, minimize, maximize)

    def global_(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_pdf = pd.concat(list(batches), ignore_index=True)
        if len(all_pdf) == 0:
            return
        yield _skyline_kernel(all_pdf, minimize, maximize)

    local_sky = df.mapInPandas(local, schema=schema)
    return local_sky.coalesce(1).mapInPandas(global_, schema=schema)
