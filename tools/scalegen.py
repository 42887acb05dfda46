"""Deterministic fixture generator for scale factors beyond the
driver's sf0.1 — the input side of the empirical scale-proof
(VERDICT r4 "Next" #1).

Mimics the driver fixtures' schema and distributions (measured off
/root/testdata/sf0.1 — see SCALING.md): TPC-H-ish star schema with the
same key domains, value ranges, and category mixes; an `events` stream
with constant per-user rate (users scale with sf, the 30-day window
stays fixed); `documents` drawn from the same 31-word vocabulary with
planted exact-duplicate groups at the sf0.1 per-doc rate; unit-norm
64-dim `embeddings` with 10 weak label clusters calibrated to the
measured within-label mean cosine (~0.07).

The generated set is NOT the driver's data (its generator is not in
this repo): absolute query outputs differ from sf0.1's, but the
workload SHAPE — join fan-outs, group cardinalities, shingle-collision
rates, session lengths — scales the way the driver's own sf ladder
scales, which is what the per-query scaling curves in
tools/scalebench.py measure. Cross-engine correctness still holds at
any generated sf: tools/selfcheck.py runs Spark and DuckDB on the SAME
parquet, so the oracle gate is sf-independent.

Usage: python tools/scalegen.py SF [OUT_DIR]   (default OUT_DIR
scaledata/sf{SF} under the repo root; ~180 MB at sf=1)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260815
VOCAB = (
    "batch part spark line column order small sort fast value scan a hash "
    "slow group agg filter query big key window table row data stream vector "
    "merge customer join index shuffle"
).split()
assert len(VOCAB) == 31
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.51, 0.1225, 0.1225, 0.1225, 0.1225]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]
PADJ = ["large", "hot", "blue", "red", "green", "small", "dark", "light"]
PNOUN = ["ring", "bolt", "disk", "gear", "tube", "plate", "rod", "cap"]

US = 1_000_000
DAY_US = 86_400 * US
T0_EVENTS = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
T0_ORDERS = np.datetime64("1995-01-01T00:00:00", "us").astype(np.int64)
ORDER_DAYS = 2404  # 1995-01-01 .. 2001-08-01


def _ts_col(ints: np.ndarray) -> pa.Array:
    return pa.array(ints, type=pa.timestamp("us"))


def _write(path: str, table: pa.Table) -> None:
    pq.write_table(table, path, compression="snappy")
    print(f"  {os.path.basename(path)}: {table.num_rows} rows")


def gen_dims(out: str) -> None:
    _write(
        os.path.join(out, "region.parquet"),
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int64()),
                "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
            }
        ),
    )
    _write(
        os.path.join(out, "nation.parquet"),
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int64()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int64()),
            }
        ),
    )


def gen_customer(out: str, n: int, rng) -> None:
    _write(
        os.path.join(out, "customer.parquet"),
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n)],
                "c_nationkey": pa.array(rng.integers(0, 25, n), pa.int64()),
                "c_acctbal": np.round(rng.uniform(-1000, 10000, n), 2),
                "c_mktsegment": pa.array(
                    np.array(SEGMENTS)[rng.integers(0, 5, n)]
                ),
            }
        ),
    )


def gen_supplier(out: str, n: int, rng) -> None:
    _write(
        os.path.join(out, "supplier.parquet"),
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n)],
                "s_nationkey": pa.array(rng.integers(0, 25, n), pa.int64()),
                "s_acctbal": np.round(rng.uniform(-1000, 10000, n), 2),
            }
        ),
    )


def gen_part(out: str, n: int, rng) -> None:
    adj = np.array(PADJ)[rng.integers(0, len(PADJ), n)]
    noun = np.array(PNOUN)[rng.integers(0, len(PNOUN), n)]
    _write(
        os.path.join(out, "part.parquet"),
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n), pa.int64()),
                "p_name": pa.array([f"{a} {b}" for a, b in zip(adj, noun)]),
                "p_brand": pa.array(
                    [f"Brand#{i}" for i in rng.integers(1, 26, n)]
                ),
                "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n)]),
                "p_size": pa.array(rng.integers(1, 51, n), pa.int32()),
                "p_retailprice": np.round(900.0 + (np.arange(n) % 1000) / 10.0, 2),
            }
        ),
    )


def gen_orders(out: str, n: int, n_cust: int, rng) -> np.ndarray:
    """Returns per-order date ints for lineitem shipdate generation."""
    dates = T0_ORDERS + rng.integers(0, ORDER_DAYS, n) * DAY_US
    _write(
        os.path.join(out, "orders.parquet"),
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, n), pa.int64()),
                "o_orderstatus": pa.array(
                    np.array(["F", "O", "P"])[rng.integers(0, 3, n)]
                ),
                "o_totalprice": np.round(rng.uniform(1000, 500000, n), 2),
                "o_orderdate": _ts_col(dates),
                "o_orderpriority": pa.array(
                    np.array(PRIORITIES)[rng.integers(0, 5, n)]
                ),
            }
        ),
    )
    return dates


def gen_lineitem(
    out: str, order_dates: np.ndarray, n_part: int, n_supp: int, rng
) -> None:
    n_orders = len(order_dates)
    # 1..17 lines per order, mean ~4.07 (measured): 1 + Poisson(3.075), cap 17
    per = np.minimum(1 + rng.poisson(3.075, n_orders), 17)
    okey = np.repeat(np.arange(n_orders), per)
    n = len(okey)
    linenumber = np.concatenate([np.arange(1, c + 1) for c in per])
    ship = np.repeat(order_dates, per) + rng.integers(1, 95, n) * DAY_US
    _write(
        os.path.join(out, "lineitem.parquet"),
        pa.table(
            {
                "l_orderkey": pa.array(okey, pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, n), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n), pa.int64()),
                "l_linenumber": pa.array(linenumber, pa.int32()),
                "l_quantity": rng.integers(1, 51, n).astype(np.float64),
                "l_extendedprice": np.round(rng.uniform(900, 105000, n), 2),
                "l_discount": np.round(rng.integers(0, 11, n) / 100.0, 2),
                "l_tax": np.round(rng.integers(0, 9, n) / 100.0, 2),
                "l_returnflag": pa.array(
                    np.array(["A", "N", "R"])[rng.integers(0, 3, n)]
                ),
                "l_linestatus": pa.array(
                    np.array(["F", "O"])[rng.integers(0, 2, n)]
                ),
                "l_shipdate": _ts_col(ship),
            }
        ),
    )


def gen_events(out: str, n: int, n_users: int, rng) -> None:
    ts = np.sort(T0_EVENTS + rng.integers(0, 30 * DAY_US, n))
    _write(
        os.path.join(out, "events.parquet"),
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": _ts_col(ts),
                "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
                "event_type": pa.array(
                    np.array(EVENT_TYPES)[rng.integers(0, 5, n)]
                ),
                "value": np.round(
                    np.minimum(rng.exponential(50.0, n), 999.0), 2
                ),
                "props": pa.array(
                    [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n)]
                ),
            }
        ),
    )


def gen_documents(out: str, n: int, rng) -> None:
    vocab = np.array(VOCAB)
    lang = np.array(LANGS)[rng.choice(5, n, p=LANG_P)]
    source = np.array([f"src{i}" for i in range(20)])[rng.integers(0, 20, n)]
    lens = rng.integers(10, 101, n)
    texts: list[str] = []
    for i in range(n):
        r = rng.random()
        if r < 0.0016 and i > 10:  # exact-dup groups at the sf0.1 rate
            texts.append(texts[int(rng.integers(0, i))])
            continue
        words = vocab[rng.integers(0, 31, lens[i])]
        if r < 0.02 and i > 10:  # near-dup: mutate an earlier doc
            base = texts[int(rng.integers(0, i))].split(" ")
            for _ in range(1 + int(rng.integers(0, 2))):
                base[int(rng.integers(0, len(base)))] = str(
                    vocab[int(rng.integers(0, 31))]
                )
            texts.append(" ".join(base))
            continue
        texts.append(" ".join(words))
    _write(
        os.path.join(out, "documents.parquet"),
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(lang),
                "source": pa.array(source),
                "n_chars": pa.array(
                    np.array([len(t) for t in texts]), pa.int64()
                ),
            }
        ),
    )


def gen_embeddings(out: str, n: int, rng) -> None:
    dim, n_labels, beta = 64, 10, 0.071  # beta ⇒ within-label cos ≈ 0.07
    centers = rng.standard_normal((n_labels, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    label = rng.integers(0, n_labels, n)
    x = rng.standard_normal((n, dim))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x + beta * centers[label]
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    _write(
        os.path.join(out, "embeddings.parquet"),
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array(
                    list(x.astype(np.float32)), pa.list_(pa.float32())
                ),
                "label": pa.array(label, pa.int32()),
            }
        ),
    )


def generate(sf: float, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)
    print(f"scalegen sf={sf} -> {out}")
    gen_dims(out)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    gen_customer(out, n_cust, rng)
    gen_supplier(out, n_supp, rng)
    gen_part(out, n_part, rng)
    dates = gen_orders(out, int(1_500_000 * sf), n_cust, rng)
    gen_lineitem(out, dates, n_part, n_supp, rng)
    gen_events(out, int(1_000_000 * sf), int(15_000 * sf), rng)
    gen_documents(out, int(50_000 * sf), rng)
    gen_embeddings(out, int(20_000 * sf), rng)


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    tag = f"{sf:g}"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join("scaledata", f"sf{tag}")
    generate(sf, out)
