"""Python UDTF surface (Spark 4) — demonstrated OFF the hot path.

Engine policy (SCALE.md) keeps per-row Python out of hot paths; the
registry's chunking query is pure column expressions. This test proves
a Python UDTF computes the IDENTICAL chunk set — the UDTF surface is
available for genuinely row-generative logic Spark expressions can't
express, and its semantics are pinned against the codegen'd form.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="doc_id bigint, k bigint, chunk_tokens bigint")
class ChunkDoc:
    """32-token windows, stride 24, final partial kept — the same
    contract as q_chunk_docs_manifest's sequence+explode."""

    def eval(self, doc_id: int, text: str):
        c, s = 32, 24
        n = len((text or "").strip().split()) or 1
        start = 0
        while True:
            yield doc_id, start // s, min(c, n - start)
            if start + c >= n:
                break
            start += s


def test_udtf_chunks_match_column_expression(spark):
    from geo_big_data_analysis_spark.functions import text as tx

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )

    # column-expression form (the registry query's core)
    c, s = 32, 24
    n = tx.token_count("text").cast("bigint")
    n_starts = F.greatest(F.ceil((n - c) / F.lit(float(s))).cast("bigint"), F.lit(0))
    expr_chunks = (
        docs.withColumn("n", n)
        .select(
            "doc_id",
            "n",
            F.explode(F.sequence(F.lit(0).cast("bigint"), n_starts)).alias("k"),
        )
        .select(
            "doc_id",
            "k",
            F.least(F.lit(c), F.col("n") - F.col("k") * s).alias("chunk_tokens"),
        )
    )
    got_expr = {(r["doc_id"], r["k"], r["chunk_tokens"]) for r in expr_chunks.collect()}

    spark.udtf.register("chunk_doc", ChunkDoc)
    docs.createOrReplaceTempView("udtf_docs_v")
    got_udtf = {
        (r["doc_id"], r["k"], r["chunk_tokens"])
        for r in spark.sql(
            "SELECT c.doc_id, c.k, c.chunk_tokens "
            "FROM udtf_docs_v, LATERAL chunk_doc(doc_id, text) AS c"
        ).collect()
    }
    assert got_udtf == got_expr
    assert len(got_expr) > docs.count()  # multi-chunk docs exist
