#!/usr/bin/env python3
"""Summarize graft.Plans output (optimization round, guide §7.2).

For every <query>_<suffix>.txt in a plans directory, count the operators
that matter for optimization triage — Exchange (shuffles), join strategy
nodes, generators, scans without pushdown — and print one line per query
plus an aggregate histogram, sorted so the worst plan shapes lead.

Usage: python3 tools/plan_summary.py plans/r19 [suffix]
"""
import os
import re
import sys
from collections import Counter


def summarize(path):
    text = open(path, encoding="utf-8").read()
    ops = Counter()
    for m in re.finditer(r"^\s*[*+:\- ]*\((\d+)\)\s+([A-Za-z0-9]+)", text, re.M):
        ops[m.group(2)] += 1
    pushed_empty = len(re.findall(r"PushedFilters: \[\]", text))
    pushed = len(re.findall(r"PushedFilters: \[[^\]]", text))
    scans = ops.get("Scan", 0) + sum(v for k, v in ops.items() if k.startswith("FileScan"))
    return ops, scans, pushed, pushed_empty, text.startswith("PLAN FAILED")


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "plans/r19"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    rows = []
    agg = Counter()
    for f in sorted(os.listdir(d)):
        if not f.endswith(f"_{suffix}.txt"):
            continue
        q = f[: -len(f"_{suffix}.txt")]
        ops, scans, pushed, pushed_empty, failed = summarize(os.path.join(d, f))
        if failed:
            print(f"{q}: PLAN FAILED")
            continue
        agg.update(ops)
        interesting = {
            "xchg": ops.get("Exchange", 0),
            "smj": ops.get("SortMergeJoin", 0),
            "bhj": ops.get("BroadcastHashJoin", 0) + ops.get("BroadcastNestedLoopJoin", 0),
            "shj": ops.get("ShuffledHashJoin", 0),
            "cart": ops.get("CartesianProduct", 0),
            "sort": ops.get("Sort", 0),
            "win": ops.get("Window", 0),
            "gen": ops.get("Generate", 0),
            "agg": ops.get("HashAggregate", 0) + ops.get("SortAggregate", 0) + ops.get("ObjectHashAggregate", 0),
            "sortagg": ops.get("SortAggregate", 0),
            "scan": scans,
            "scan_nopush": pushed_empty,
        }
        rows.append((q, interesting))

    rows.sort(key=lambda r: (-r[1]["xchg"], -r[1]["smj"], r[0]))
    hdr = ["query", "xchg", "smj", "shj", "bhj", "cart", "sort", "sortagg", "win", "gen", "agg", "scan", "scan_nopush"]
    print("\t".join(hdr))
    for q, i in rows:
        print("\t".join([q] + [str(i[k]) for k in hdr[1:]]))
    print("\n# aggregate operator histogram")
    for op, n in agg.most_common(40):
        print(f"{n:6d}  {op}")


if __name__ == "__main__":
    main()
