"""Deterministic scale-up of the driver testdata for oracle sweeps
beyond the largest driver-provided SF.

The driver generates sf0.001/0.01/0.1; engine-divergence bugs have a
history of hiding at the gate SF and surfacing one decade up (the
events_user_stats half-ulp flip was invisible at sf0.01).  This script
builds sf1.0 as a ×10 replication of sf0.1 with consistent key offsets
— every foreign-key relationship holds within each replica, so every
query exercises the same join/agg structure at 10× the rows:

- region/nation/supplier/part: dimension tables, copied unchanged.
- customer/orders/lineitem: replica r offsets c_custkey by r·10^7 and
  o_orderkey by r·10^9 (both offsets applied consistently on the FK
  side).
- events: event_id + r·10^8, user_id + r·10^6 (10× the user grain).
- documents: doc_id + r·10^6, text unchanged — the corpus_key
  (sum(length(text))) becomes 10× sf0.1's, unique among all SFs, so
  the SF-keyed expected-parquet oracles self-generate correctly.  The
  doc-subset dedup queries (doc_id < N) see the identical corpus.
- embeddings: vec_id + r·10^6, first component += r·10^-3: replicas
  must NOT be bit-identical vectors or cosine top-k develops exact
  cross-replica ties whose order no query promises.
- orders/lineitem prices get the same treatment (+r·0.01 / +r·0.001):
  deterministic tie-breakers for top-k boundaries, identical bytes for
  both engines.

Replication (not re-generation) preserves the driver's value
distributions exactly; both engines read the same parquet, so the
sweep still compares Spark vs DuckDB on identical bytes.

Usage: python scripts/gen_scaled_sf.py [out_dir] [replicas]
       (default dist/testdata/sf1.0, 10)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"

DOC_OFF = 1_000_000
CUST_OFF = 10_000_000
ORDER_OFF = 1_000_000_000
EVENT_OFF = 100_000_000
USER_OFF = 1_000_000
VEC_OFF = 1_000_000


def _write(df: pd.DataFrame, out_dir: str, name: str) -> None:
    df.to_parquet(
        os.path.join(out_dir, f"{name}.parquet"),
        index=False,
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )


def _replicate(df: pd.DataFrame, replicas: int, mutate) -> pd.DataFrame:
    out = []
    for r in range(replicas):
        c = df.copy()
        mutate(c, r)
        out.append(c)
    return pd.concat(out, ignore_index=True)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "dist/testdata/sf1.0"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)

    for dim in ["region", "nation", "supplier", "part"]:
        _write(pd.read_parquet(f"{SRC}/{dim}.parquet"), out_dir, dim)

    cust = pd.read_parquet(f"{SRC}/customer.parquet")
    _write(
        _replicate(cust, replicas, lambda c, r: c.__setitem__("c_custkey", c["c_custkey"] + r * CUST_OFF)),
        out_dir,
        "customer",
    )

    orders = pd.read_parquet(f"{SRC}/orders.parquet")

    def mut_orders(c, r):
        c["o_orderkey"] = c["o_orderkey"] + r * ORDER_OFF
        c["o_custkey"] = c["o_custkey"] + r * CUST_OFF
        c["o_totalprice"] = c["o_totalprice"] + r * 0.01

    _write(_replicate(orders, replicas, mut_orders), out_dir, "orders")

    li = pd.read_parquet(f"{SRC}/lineitem.parquet")

    def mut_li(c, r):
        c["l_orderkey"] = c["l_orderkey"] + r * ORDER_OFF
        c["l_extendedprice"] = c["l_extendedprice"] + r * 0.001

    _write(_replicate(li, replicas, mut_li), out_dir, "lineitem")

    ev = pd.read_parquet(f"{SRC}/events.parquet")

    def mut_ev(c, r):
        c["event_id"] = c["event_id"] + r * EVENT_OFF
        c["user_id"] = c["user_id"] + r * USER_OFF

    _write(_replicate(ev, replicas, mut_ev), out_dir, "events")

    docs = pd.read_parquet(f"{SRC}/documents.parquet")
    _write(
        _replicate(docs, replicas, lambda c, r: c.__setitem__("doc_id", c["doc_id"] + r * DOC_OFF)),
        out_dir,
        "documents",
    )

    emb = pd.read_parquet(f"{SRC}/embeddings.parquet")

    def mut_emb(c, r):
        c["vec_id"] = c["vec_id"] + r * VEC_OFF
        if r:
            c["embedding"] = c["embedding"].map(
                lambda v: np.concatenate(([np.float32(v[0] + r * 1e-3)], v[1:])).astype(np.float32)
            )

    _write(_replicate(emb, replicas, mut_emb), out_dir, "embeddings")

    import pyarrow.parquet as pq

    for t in ["customer", "orders", "lineitem", "events", "documents", "embeddings"]:
        n = pq.ParquetFile(os.path.join(out_dir, f"{t}.parquet")).metadata.num_rows
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
