#!/usr/bin/env python3
"""Generate an sf1-scale fixture set by replicating the driver's sf0.1
tables x10 with per-replica key shifts (dev harness, like compare.py —
NOT part of the engine; the engine never depends on python).

Usage: python3 dev/make_sf1.py /root/testdata/sf0.1 target/sf1

Design constraints (so every oracle-checked query stays meaningful):
  - Key shifts preserve every FK relationship (orders->customer,
    lineitem->{orders,part,supplier}) by shifting both sides by the same
    replica offset. region/nation are shared dimensions, copied as-is.
  - SHIFT is a multiple of 50 so doc_id modular patterns (the chain-graph
    queries' `% 50` run breaks) replicate instead of merging replicas.
  - documents.text gets a per-replica token suffix so the replicas'
    shingle spaces are DISJOINT: without it every doc would acquire 9
    identical twins, the near-dup graph would gain clusters of size
    10 x base and the exhaustive-jaccard oracle's self-join would blow up
    quadratically. With it, dedup structure = 10 independent copies of the
    sf0.1 structure (cost scales linearly). n_chars is recomputed.
  - embeddings keep their vectors but shift `label` per replica: the
    label-blocked exact-cosine pass stays sf0.1-block-sized (the blocking
    key is the whole point of that operator); identical vectors in
    different replicas still collide in the label-free LSH query, which is
    legal input and linear enough.
  - events.ts is written back with the SOURCE file's physical type
    (timestamp[ns] in early driver rounds -- Spark's nanosAsLong path --
    timestamp[us] since round 6). DuckDB's COPY would downgrade ns to us,
    so events goes through pyarrow with an explicit cast.
  - Every shifted column is CAST back to its source type (BIGINT/INTEGER)
    so dtypes — which dev/compare.py checks strictly — are unchanged.
"""
import os
import sys

import duckdb

SHIFT = int(os.environ.get("MAKE_SF_SHIFT", 100_000_000))  # multiple of 50
K = int(os.environ.get("MAKE_SF_K", 10))


def main(src: str, dst: str) -> None:
    # Chaining runs to reach sf10 (sf0.1 -> sf1 -> sf10) needs a second-pass
    # shift ABOVE the first pass's key ceiling or replicas collide:
    #   MAKE_SF_SHIFT=10000000000 python3 dev/make_sf1.py target/sf1 target/sf10
    # (10^10 is a multiple of 50, so the doc_id % 50 chain breaks replicate.)
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO "
                f"{os.environ.get('MAKE_SF_THREADS', os.cpu_count())}")

    def copy(sql: str, name: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    def t(name: str) -> str:
        return f"'{src}/{name}.parquet'"

    rep = f"CROSS JOIN range({K}) r(i)"

    copy(f"SELECT * FROM {t('region')}", "region")
    copy(f"SELECT * FROM {t('nation')}", "nation")
    copy(f"""SELECT CAST(c_custkey + r.i * {SHIFT} AS BIGINT) AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
             FROM {t('customer')} {rep}""", "customer")
    copy(f"""SELECT CAST(o_orderkey + r.i * {SHIFT} AS BIGINT) AS o_orderkey,
               CAST(o_custkey + r.i * {SHIFT} AS BIGINT) AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
             FROM {t('orders')} {rep}""", "orders")
    copy(f"""SELECT CAST(l_orderkey + r.i * {SHIFT} AS BIGINT) AS l_orderkey,
               CAST(l_partkey + r.i * {SHIFT} AS BIGINT) AS l_partkey,
               CAST(l_suppkey + r.i * {SHIFT} AS BIGINT) AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
             FROM {t('lineitem')} {rep}""", "lineitem")
    copy(f"""SELECT CAST(p_partkey + r.i * {SHIFT} AS BIGINT) AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
             FROM {t('part')} {rep}""", "part")
    copy(f"""SELECT CAST(s_suppkey + r.i * {SHIFT} AS BIGINT) AS s_suppkey,
               s_name, s_nationkey, s_acctbal
             FROM {t('supplier')} {rep}""", "supplier")
    import pyarrow as pa
    import pyarrow.parquet as pq
    ev = con.execute(
        f"""SELECT CAST(event_id + r.i * {SHIFT} AS BIGINT) AS event_id,
              ts,
              CAST(user_id + r.i * {SHIFT} AS BIGINT) AS user_id,
              event_type, value, props
            FROM {t('events')} {rep}""").fetch_arrow_table()
    # Preserve the SOURCE fixture's physical ts type: early driver rounds
    # shipped timestamp[ns] (Spark's nanosAsLong path), current rounds ship
    # timestamp[us] (Spark reads natively). DuckDB's COPY would downgrade
    # ns to us, hence the pyarrow detour.
    src_ts = pq.read_schema(f"{src}/events.parquet").field("ts").type
    i = ev.schema.get_field_index("ts")
    ev = ev.cast(ev.schema.set(i, pa.field("ts", src_ts)))
    pq.write_table(ev, f"{dst}/events.parquet", version="2.6")
    print(f"events: {ev.num_rows} rows (ts as {src_ts})")
    copy(f"""SELECT CAST(doc_id + r.i * {SHIFT} AS BIGINT) AS doc_id,
               regexp_replace(text, '(\\S+)',
                 '\\1r' || CAST(r.i AS VARCHAR), 'g') AS text,
               lang, source,
               CAST(length(regexp_replace(text, '(\\S+)',
                 '\\1r' || CAST(r.i AS VARCHAR), 'g')) AS BIGINT) AS n_chars
             FROM {t('documents')} {rep}""", "documents")
    copy(f"""SELECT CAST(vec_id + r.i * {SHIFT} AS BIGINT) AS vec_id,
               embedding,
               CAST(label + r.i * {SHIFT // 100_000} AS INTEGER) AS label
             FROM {t('embeddings')} {rep}""", "embeddings")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
