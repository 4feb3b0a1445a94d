#!/usr/bin/env python3
"""Local dev harness mimicking the driver's DuckDB-oracle correctness check.

Usage: python3 dev/compare.py <sfDir> <verifyOutDir>

Reads oracle_sql.json from the verify output dir, registers each parquet
table in DuckDB as a view named after the table, runs each oracle SQL, loads
the corresponding Spark parquet result, sorts columns by name, and compares:

  1. column names (sorted) must match
  2. pandas dtypes must match exactly — a Spark Decimal (object) against a
     DuckDB HUGEINT (float64) is a FAIL here, not a warning; this is exactly
     the class of divergence the driver's canonical-string hash catches
     while value comparison does not (round-3 lesson: "73/75 local" vs
     "69/75 driver")
  3. values must match exactly (float: bitwise ==, NaN==NaN)
  4. a canonical-string hash (str() of every cell, columns sorted by name,
     row-major) must match — the driver-style representation check
"""
import sys, json, glob, os, hashlib
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def canonical_hash(df):
    # Vectorized equivalent of the original per-cell iterrows loop
    # (cells row-major, sorted columns, each cell's str() followed by
    # \x01, nulls as \x00null) — iterrows is ~10k rows/s, unusable on
    # the sf10 sweep's multi-million-row outputs. Both sides of every
    # comparison go through THIS implementation, so parity is intrinsic.
    h = hashlib.md5()
    if len(df) == 0:
        return h.hexdigest()
    row = None
    for c in df.columns:
        s = df[c]
        nulls = pd.isna(s)
        if nulls.values.ndim > 1:  # list-typed column: no nulls semantics
            part = s.astype(str)
        else:
            part = s.astype(str).mask(nulls, "\x00null")
        row = part + "\x01" if row is None else row + (part + "\x01")
    for chunk_start in range(0, len(row), 100_000):
        h.update("".join(row.iloc[chunk_start:chunk_start + 100_000])
                 .encode())
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # a runaway (quadratic) oracle must abort with an error, not fill the
    # disk: sim_hard_negatives' exhaustive twin spilled >70 GB at sf10.
    # Override per-run with COMPARE_TEMP_CAP for known-heavy-but-finite
    # oracles (q_feature_gain needs ~40 GB at sf10).
    try:
        # Per-process spill dir: concurrent compares sharing the default
        # cwd-relative .tmp delete each other's temp files, which crashes
        # DuckDB's C++ cleanup with an uncatchable terminate() (seen when
        # the overlapped sweep ran two compares back to back at sf10).
        tmpdir = os.environ.get("COMPARE_TMPDIR",
                                f"/tmp/duckdb_tmp_{os.getpid()}")
        con.execute(f"SET temp_directory='{tmpdir}'")
        cap = os.environ.get("COMPARE_TEMP_CAP", "30GB")
        con.execute(f"SET max_temp_directory_size='{cap}'")
    except Exception:
        pass
    # Cap DuckDB's thread count (default: all cores) so a compare sweep can
    # overlap a running Verify instead of serializing after it — the round-10
    # sweep's DuckDB tail outlived the round precisely because it only
    # started once the multi-hour Spark pass finished.
    threads = os.environ.get("COMPARE_THREADS")
    if threads:
        con.execute(f"SET threads TO {int(threads)}")
    # DuckDB's default memory_limit is 80% of RAM — on a box where a 70 GB
    # Verify JVM is still resident that invites the OOM killer; overlapped
    # sweeps set an explicit budget and let the temp cap absorb the rest.
    mem = os.environ.get("COMPARE_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    only = {q for q in os.environ.get("COMPARE_ONLY", "").split(",") if q}
    skip = {q for q in os.environ.get("COMPARE_SKIP", "").split(",") if q}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if (only and name not in only) or name in skip:
            continue
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
            want = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols got={list(got.columns)} want={list(want.columns)}")
            n_fail += 1; continue
        ok = True
        for c in got.columns:
            if str(got[c].dtype) != str(want[c].dtype):
                print(f"FAIL {name}: DTYPE {c}: spark={got[c].dtype} "
                      f"oracle={want[c].dtype}")
                ok = False
        if len(got) != len(want):
            print(f"FAIL {name}: rows got={len(got)} want={len(want)}")
            n_fail += 1; continue
        for c in got.columns:
            g, w = got[c], want[c]
            if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
                g = g.astype(float); w = w.astype(float)
                both_nan = g.isna() & w.isna()
                eq = (g.values == w.values) | both_nan.values
                if not eq.all():
                    d = np.nanmax(np.abs(g.values - w.values))
                    print(f"FAIL {name}: col {c} maxdiff={d} ({int((~eq).sum())} rows)")
                    ok = False
            else:
                gs, ws = g.astype(str), w.astype(str)
                if not (gs.values == ws.values).all():
                    bad = (gs.values != ws.values)
                    i = int(np.argmax(bad))
                    print(f"FAIL {name}: col {c} {int(bad.sum())} rows differ; "
                          f"first at {i}: got={gs.values[i]!r} want={ws.values[i]!r}")
                    ok = False
        if ok:
            hg, hw = canonical_hash(got), canonical_hash(want)
            if hg != hw:
                print(f"FAIL {name}: canonical hash {hg} != {hw} "
                      f"(representation divergence)")
                ok = False
        if ok:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
