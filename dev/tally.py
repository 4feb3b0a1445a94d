#!/usr/bin/env python3
"""Render the definitive scale-sweep tally from a Verify log + the
per-query compare results jsonl (dev harness; round-11 VERDICT item #1:
an interrupted sweep must still yield an auditable number).

Usage: python3 dev/tally.py <verifyLog> <resultsJsonl> [--md]
Prints counts (and optionally a markdown summary): queries executed /
failed on the Spark side, oracle compares pass / fail / timeout / error /
not-yet-compared, plus the slowest Spark-side entries.
"""
import sys, json, re

def main():
    log, res = sys.argv[1], sys.argv[2]
    md = "--md" in sys.argv
    done, failed = {}, {}
    for line in open(log, errors="replace"):
        m = re.search(r"\[verify\] (\S+) done in ([0-9.]+)s", line)
        if m:
            done[m.group(1)] = float(m.group(2))
        m = re.search(r"\[verify\] (\S+) failed: (.*)", line)
        if m:
            failed[m.group(1)] = m.group(2)[:120]
    results = {}
    try:
        for line in open(res):
            try:
                r = json.loads(line)
                results[r["query"]] = r
            except json.JSONDecodeError:
                pass
    except FileNotFoundError:
        pass
    by = {}
    for r in results.values():
        by.setdefault(r["status"], []).append(r["query"])
    uncompared = sorted(set(done) - set(results))
    print(f"spark executed: {len(done)}  spark failed: {len(failed)}")
    for k in sorted(by):
        print(f"oracle {k}: {len(by[k])}")
    print(f"not yet compared: {len(uncompared)}")
    for q, e in sorted(failed.items()):
        print(f"  SPARK-FAIL {q}: {e}")
    for k in sorted(by):
        if k != "pass":
            for q in sorted(by[k]):
                print(f"  ORACLE-{k.upper()} {q}: "
                      f"{results[q].get('detail','')[:160]}")
    if md:
        slow = sorted(done.items(), key=lambda kv: -kv[1])[:15]
        print("\n| query | spark s | oracle |")
        print("|---|---|---|")
        for q, t in slow:
            st = results.get(q, {}).get("status", "—")
            print(f"| {q} | {t:.1f} | {st} |")

if __name__ == "__main__":
    main()
