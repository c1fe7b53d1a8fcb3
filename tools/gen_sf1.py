#!/usr/bin/env python
"""Generate an sf1.0 fixture (10x sf0.1) for the scale-curvature run the r7
verdict asked for (item 4): replicate each sf0.1 table 10x with key offsets
so every copy is internally join-consistent — per-copy value distributions
are exactly sf0.1's, total volume is 10x, and the dim tables (nation,
region) stay shared like real dims would.

Documents/embeddings are replicated with offset ids and UNCHANGED content:
cross-copy exact duplicates are the realistic crawl shape for dedup at
scale (every doc gains 9 twins), which deliberately stresses the LSH
bucket cap and the CC label loop.

Output goes to /tmp/sf1.0 (regenerable, never committed; the driver's
/root/testdata is read-only).  DuckDB does the rewrite — columnar, no JVM.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
COPIES = int(os.environ.get("SG_SF1_COPIES", "10"))

#: per-table (primary-key/foreign-key -> stride source table) offset plan
KEYED = {
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
SHARED = ["nation", "region"]


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    # stride = max(pk) + 1 per key-owning table (copies never collide)
    stride_of = {
        "customer": "c_custkey",
        "orders": "o_orderkey",
        "part": "p_partkey",
        "supplier": "s_suppkey",
        "events": "event_id",
        "events_user": "user_id",
        "documents": "doc_id",
        "embeddings": "vec_id",
    }
    strides: dict[str, int] = {}
    for owner, pk in stride_of.items():
        src_table = "events" if owner == "events_user" else owner
        strides[owner] = (
            con.sql(f"SELECT max({pk}) + 1 FROM '{SRC}/{src_table}.parquet'").fetchone()[0]
        )

    for t in SHARED:
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT parquet)"
        )
        print(f"{t}: shared dim copied")

    for t, keys in KEYED.items():
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        exprs = []
        for c in cols:
            if c in keys:
                exprs.append(f"({c} + i.range * {strides[keys[c]]}) AS {c}")
            else:
                exprs.append(c)
        q = (
            f"COPY (SELECT {', '.join(exprs)} FROM '{SRC}/{t}.parquet', "
            f"range({COPIES}) i) TO '{DST}/{t}.parquet' (FORMAT parquet)"
        )
        con.sql(q)
        n = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
