#!/usr/bin/env python3
"""Per-query wrapper around dev/compare.py that PERSISTS every result as it
lands (round-11, VERDICT item #1: the round-10 sf10 sweep's final tally was
never committed because the serial DuckDB tail outlived the round — an
interrupted sweep must still yield an auditable number).

Usage: python3 dev/compare_sweep.py <sfDir> <verifyOutDir> <resultsJsonl>
         [--timeout SECS] [--skip q1,q2] [--only q1,q2]

Each query appends one JSON line to <resultsJsonl>:
  {"query": name, "status": "pass"|"fail"|"timeout"|"error",
   "secs": wall, "detail": "<last FAIL line if any>"}
Queries already present in <resultsJsonl> are not re-run (resumable).
Known-heavy twins can get a bigger DuckDB temp cap via HEAVY_CAPS below.
"""
import sys, json, os, subprocess, time, argparse

# oracles whose DuckDB twin needs more temp space than the 30GB default.
# Round-12 note: the box's ext4 strict-reservation leaves only ~60GB
# grantable even after clearing the sf100 fixtures, so every cap is sized
# to fit that ceiling — a twin that genuinely needs more must tighten its
# probe restriction instead (the VERDICT-r11 feasibility ladder).
HEAVY_CAPS = {
    "q_feature_gain": "50GB",
    # sf10: the materialized BPE round chain spills past the 30GB default
    "text_bpe_merges": "50GB",
    "text_bpe_encode": "50GB",
    # sf10: the MMR greedy unroll's k self-joins spill past 30GB
    "sim_mmr_topk": "50GB",
    # sf10: the composed corpus-manifest twin (dedup chain + splits +
    # packing re-derived in one query) offload-failed at the 30GB default
    "pipeline_corpus": "50GB",
    # sf10: even 1/16-restricted, the LSH pair x dim expansion is large
    "emb_lsh_pairs_probe": "50GB",
    # r12: probe tightened 1/4 -> 1/16 (the 1/4 form needed >70GB temp,
    # more than this box can grant)
    "pipeline_passage_graph_probe": "45GB",
    # sf10: 541M output rows — the BETWEEN join + final sort spill is
    # ~13GB of payload but DuckDB's sort temp peaks well past the default
    "q_range_join": "45GB",
    # sf10 r12: the HITS round chain ALSO offloads past the 30GB default
    # ("failed to offload ... 27.9 GiB/27.9 GiB" = the 30GB temp cap, not
    # memory — the message names the temp budget)
    "q_hits": "55GB",
    # sf10: the (vec x centroid) distance aggregate offload-failed at the
    # r11 sweep's 28GB memory budget with temp already at the default cap
    "sim_semdedup": "55GB",
    "sim_semdedup_inc": "45GB",
    # r13: the 1/4-corpus probe twin — sized from the full twin's >55GB
    # appetite scaled by the corpus cut (pair work is n·cap ≈ linear)
    "sim_semdedup_probe": "45GB",
}

# oracles whose DuckDB twin needs more RAM than the sweep default
# COMPARE_MEM (iterative twins pin whole per-round tables in the buffer
# pool — offload cannot help a pin failure, only memory can)
HEAVY_MEM = {
    # sf10: HITS round chain pinned >18.6GB in r10 and >37GB in the r11
    # sweep (the pin requirement scales with co-tenant buffer pressure)
    "q_hits": "64GB",
    # sf10: 200k vec x 1000 centroid distance hash-agg holds ~200M group
    # states; the r11 sweep OOMed at 27.9GB with offload exhausted
    "sim_semdedup": "60GB",
    "sim_semdedup_inc": "60GB",
    # r13: quarter-corpus probe — centroid hash-agg state scales with the cut
    "sim_semdedup_probe": "40GB",
}

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir"); ap.add_argument("out_dir")
    ap.add_argument("results")
    ap.add_argument("--timeout", type=int, default=1800)
    ap.add_argument("--skip", default="")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    oracle = json.load(open(os.path.join(args.out_dir, "oracle_sql.json")))
    skip = {q for q in args.skip.split(",") if q}
    only = {q for q in args.only.split(",") if q}
    done = set()
    if os.path.exists(args.results):
        for line in open(args.results):
            try: done.add(json.loads(line)["query"])
            except Exception: pass
    names = [n for n in sorted(oracle) if n not in done and n not in skip
             and (not only or n in only)]
    print(f"{len(names)} to compare ({len(done)} already recorded)")
    for i, name in enumerate(names):
        env = dict(os.environ, COMPARE_ONLY=name)
        if name in HEAVY_CAPS:
            env["COMPARE_TEMP_CAP"] = HEAVY_CAPS[name]
        if name in HEAVY_MEM:
            env["COMPARE_MEM"] = HEAVY_MEM[name]
        t0 = time.time()
        rec = {"query": name}
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__),
                                              "compare.py"),
                 args.sf_dir, args.out_dir],
                env=env, capture_output=True, text=True,
                timeout=args.timeout)
            out = p.stdout + p.stderr
            rec["secs"] = round(time.time() - t0, 1)
            if f"PASS {name}" in out:
                rec["status"] = "pass"
            else:
                rec["status"] = "fail"
                fails = [l for l in out.splitlines() if l.startswith("FAIL")]
                rec["detail"] = fails[-1][:500] if fails else out[-500:]
        except subprocess.TimeoutExpired:
            rec.update(status="timeout", secs=round(time.time() - t0, 1))
        except Exception as e:
            rec.update(status="error", secs=round(time.time() - t0, 1),
                       detail=str(e)[:500])
        with open(args.results, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[{i+1}/{len(names)}] {rec['status']:7s} {name} "
              f"({rec['secs']}s)", flush=True)

if __name__ == "__main__":
    main()
