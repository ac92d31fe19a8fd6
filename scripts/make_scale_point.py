"""One-time sf1 scale-point generator (VERDICT r12 Next #6).

Builds a 10x replica of the driver's sf0.1 parquet tables under
.scale/sf1/ (gitignored) so bench.py --sf 1 can measure every gate on a
~6M-row lineitem. Replication is DETERMINISTIC key-space tiling: replica
r shifts every entity key by r * stride (stride = a power of ten above
the base table's max key), so foreign-key joins stay exactly consistent
and per-key selectivities match the base corpus — the right shape for a
SCALE curve (same plans, 10x the rows). Dimension tables (region,
nation) keep their real cardinality, exactly as TPC-H scaling does.

Usage: python scripts/make_scale_point.py [replicas=10]
"""

import os
import sys

import duckdb

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scale", "sf1")

STRIDE = 100_000_000  # far above every base key; keeps keys int64-safe

# table -> columns to shift by r * STRIDE (entity + foreign keys)
SHIFTS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# dimension tables are written once, not replicated
DIMS = {"region", "nation"}


def main(replicas: int = 10) -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t, keys in SHIFTS.items():
        src = f"{BASE}/{t}.parquet"
        dst = f"{OUT}/{t}.parquet"
        if t in DIMS:
            con.sql(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
            continue
        cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        parts = []
        for r in range(replicas):
            sel = ", ".join(
                f"{c} + {r * STRIDE} AS {c}" if c in keys else c
                for c in cols
            )
            parts.append(f"SELECT {sel} FROM '{src}'")
        con.sql(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(t, n, flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
