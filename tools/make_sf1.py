"""Build sf1 testdata (/root/repo/testdata_sf1) as a 10x key-shifted
replica of /root/testdata/sf0.1 (VERDICT r8 #4).

The driver's generator is not available in this sandbox and
/root/testdata is read-only, so sf1 is synthesized by replication
with SHIFTED keys - the same honest-scale-up recipe
tools/scaling_bench.py has used since round 5, extended to keep every
foreign key consistent across ALL tables:

  documents  doc_id     += i * 100_000 (multiple of every modulus the
             queries use - and BELOW the +10M id range where
             _planted_corpus puts its synthetic twins, which a 10M
             stride collided with); text word-SHUFFLED per replica
             (deterministic, whitespace-preserving - keeps every
             token/char statistic while breaking the 12-char shingle
             similarity that made cross-replica copies of the same doc
             an artificial 10-clique in the near-dup graph)
  embeddings vec_id     += i * 1_000_000, embedding circularly shifted
             by i positions (norm- and within-replica-geometry-
             preserving; kills cross-replica identical vectors that
             would quadratically inflate near-dup outputs)
  customer   c_custkey  += i * 10**7
  supplier   s_suppkey  += i * 10**5
  part       p_partkey  += i * 10**6
  orders     o_orderkey += i * 10**8, o_custkey += i * 10**7
  lineitem   l_orderkey += i * 10**8, l_partkey += i * 10**6,
             l_suppkey  += i * 10**5
  events     event_id   += i * 10**8, user_id  += i * 10**6
  region, nation: dimension constants, copied once.

Written by DuckDB COPY as ONE parquet file per table - the same
layout the driver's sf dirs use, so selfcheck/bench run unchanged
with the sf_dir argument pointed here. Correctness at sf1 is still
engine-DIFFERENTIAL (Spark vs DuckDB on these same files), so the
replication recipe cannot mask a wrong answer.
"""

import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1")
MULT = int(sys.argv[3]) if len(sys.argv) > 3 else 10

SHIFTS = {
    "documents": {"doc_id": 100_000},
    "customer": {"c_custkey": 10**7},
    "supplier": {"s_suppkey": 10**5},
    "part": {"p_partkey": 10**6},
    "orders": {"o_orderkey": 10**8, "o_custkey": 10**7},
    "lineitem": {"l_orderkey": 10**8, "l_partkey": 10**6, "l_suppkey": 10**5},
    "events": {"event_id": 10**8, "user_id": 10**6},
}
COPY = ["region", "nation"]


def _shuffle_words(text: str, seed: int) -> str:
    """Deterministic word shuffle that PRESERVES the whitespace
    pattern (length, n_chars, every token- and char-level statistic)
    while destroying word adjacency - the thing 12-char shingles
    measure. Replica 0 is the identity so sf1 contains sf0.1
    verbatim."""
    import random
    import re

    parts = re.split(r"(\s+)", text)
    words = [p for p in parts if p and not p.isspace()]
    if len(words) < 2:
        return text
    order = list(range(len(words)))
    random.Random(seed).shuffle(order)
    it = iter(order)
    return "".join(
        words[next(it)] if (p and not p.isspace()) else p for p in parts
    )


def _build_documents(con) -> None:
    rows = con.execute(
        f"SELECT * FROM parquet_scan('{SRC}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    cols = [d[0] for d in con.description]
    ti, di = cols.index("text"), cols.index("doc_id")
    out = []
    for i in range(MULT):
        step = SHIFTS["documents"]["doc_id"]
        for r in rows:
            r = list(r)
            if i:
                r[ti] = _shuffle_words(r[ti], seed=i * 1_000_003 + r[di])
            r[di] += i * step
            out.append(tuple(r))
    import pandas as pd

    df = pd.DataFrame(out, columns=cols)
    con.register("docs_sf1", df)
    con.execute(
        f"COPY (SELECT * FROM docs_sf1) TO '{DST}/documents.parquet' "
        "(FORMAT PARQUET)"
    )
    n = con.execute(
        f"SELECT count(*) FROM parquet_scan('{DST}/documents.parquet')"
    ).fetchone()[0]
    print(f"built documents: {n:,} rows (word-shuffled replicas)")


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in COPY:
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
        print(f"copied {t}")
    _build_documents(con)
    for t, shifts in SHIFTS.items():
        if t == "documents":
            continue
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM parquet_scan('{SRC}/{t}.parquet')").fetchall()]
        selects = []
        for i in range(MULT):
            proj = ", ".join(
                f"{c} + {i * shifts[c]} AS {c}" if c in shifts else c
                for c in cols
            )
            selects.append(
                f"SELECT {proj} FROM parquet_scan('{SRC}/{t}.parquet')")
        union = " UNION ALL ".join(selects)
        con.execute(
            f"COPY ({union}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM parquet_scan('{DST}/{t}.parquet')"
        ).fetchone()[0]
        print(f"built {t}: {n:,} rows")
    # embeddings: id shift + per-replica circular rotation of the
    # float[] (list slicing keeps FLOAT exactness - elements move,
    # values don't)
    dim = con.execute(
        "SELECT len(embedding) FROM "
        f"parquet_scan('{SRC}/embeddings.parquet') LIMIT 1").fetchone()[0]
    selects = []
    for i in range(MULT):
        k = i % dim
        if k == 0:
            emb = "embedding"
        else:
            emb = (f"list_concat(embedding[{k + 1}:{dim}], "
                   f"embedding[1:{k}]) ")
        selects.append(
            f"SELECT vec_id + {i * 10**6} AS vec_id, "
            f"CAST({emb} AS FLOAT[]) AS embedding, label "
            f"FROM parquet_scan('{SRC}/embeddings.parquet')")
    union = " UNION ALL ".join(selects)
    con.execute(f"COPY ({union}) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)")
    n, d2 = con.execute(
        f"SELECT count(*), min(len(embedding)) FROM "
        f"parquet_scan('{DST}/embeddings.parquet')").fetchone()
    assert d2 == dim, (d2, dim)
    print(f"built embeddings: {n:,} rows, dim {d2}")


if __name__ == "__main__":
    main()
