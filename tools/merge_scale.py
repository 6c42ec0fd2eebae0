#!/usr/bin/env python3
"""Fold the sf1 scale-proof runs into BENCH_SF1.md.

Inputs: the sf0.1 session files (2 DuckDB + 2 graft, the BASELINE grid)
and the sf1 session files (2 duck_time.py + 2 graft.Bench heavy-subset
runs). Publishes, per heavy query: duckdb/graft mins at both SFs, the
per-engine scale-up factor (sf1 time / sf0.1 time — data grew 10x, so a
record-parallel operator should land near 10x or below), and the
graft/duckdb ratio at sf1. DNF rows (DuckDB watchdog) are carried as
text.

Usage:
  python3 tools/merge_scale.py BENCH_SF1.md \
      --duck01 duck1.json duck2.json --graft01 bench1.json bench2.json \
      --duck1 duck_sf1_a.json duck_sf1_b.json \
      --graft1 bench_sf1_a.json bench_sf1_b.json [--note note.md]
"""
import sys, json


def load_json(path):
    for line in open(path).read().splitlines():
        line = line.strip()
        if line.startswith("[info] "):
            line = line[len("[info] "):]
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit(f"no JSON object found in {path}")


def fold_duck(paths):
    out = {}
    for p in paths:
        for k, v in load_json(p)["duckdb"].items():
            if isinstance(v, (int, float)):
                prev = out.get(k)
                out[k] = min(prev, float(v)) if isinstance(prev, float) else float(v)
            else:
                out.setdefault(k, v)  # DNF/err string unless a number exists
    return out


def fold_graft(paths):
    out = {}
    for p in paths:
        for k, v in load_json(p)["queries"].items():
            if isinstance(v, (int, float)):
                out[k] = min(out.get(k, float("inf")), float(v))
            else:
                out.setdefault(k, v)
    return out


def main():
    args = sys.argv[1:]
    out_md = args.pop(0)
    groups, cur = {}, None
    note = ""
    while args:
        a = args.pop(0)
        if a == "--note":
            note = open(args.pop(0)).read()
        elif a.startswith("--"):
            cur = a[2:]
            groups[cur] = []
        else:
            groups[cur].append(a)
    d01, g01 = fold_duck(groups["duck01"]), fold_graft(groups["graft01"])
    d1, g1 = fold_duck(groups["duck1"]), fold_graft(groups["graft1"])

    names = sorted(g1)
    dt = sum(v for k in names for v in [d1.get(k)] if isinstance(v, float))
    gt = sum(v for k in names for v in [g1.get(k)] if isinstance(v, float))

    def f(v, d=3):
        return f"{v:.{d}f}" if isinstance(v, float) else str(v or "")

    def ratio(a, b):
        return f"{a / b:.2f}" if isinstance(a, float) and isinstance(b, float) and b > 0 else ""

    lines = [
        "# BENCH_SF1 — scale proof: the heavy queries at 10× the graded data",
        "",
        "`tools/make_sfN.py` replicates the sf0.1 tables ×10 (shifted ids,",
        "letter-rotated document copies so replication does not manufacture",
        "cross-copy near-duplicates; within-copy dup/cluster structure is",
        "preserved exactly). Same machines, same symmetric grid as BASELINE.md:",
        "each engine min over 2 sessions × min-of-2 passes, sequential chain,",
        "nothing concurrent. DuckDB runs under a 900 s per-query watchdog —",
        "a `DNF>900s` row means the oracle did not finish a single pass.",
        "",
        "`scale×` = (min at sf1) / (min at sf0.1) per engine; the data is 10×,",
        "so ≈10 or below means the operator scales linearly or better in data",
        "size on fixed cores; Spark's fixed per-query overhead makes sub-10",
        "common on the smaller queries.",
        "",
        f"**Heavy-subset totals at sf1 (finished queries only): DuckDB {dt:.1f} s,"
        f" graft {gt:.1f} s → {gt / dt:.2f}×.**",
        "",
        "| query | duck sf0.1 | duck sf1 | duck scale× | graft sf0.1 | graft sf1 | graft scale× | graft/duck @sf1 |",
        "| --- | --- | --- | --- | --- | --- | --- | --- |",
    ]
    for n in names:
        lines.append(
            f"| {n} | {f(d01.get(n))} | {f(d1.get(n))} | {ratio(d1.get(n), d01.get(n))} "
            f"| {f(g01.get(n))} | {f(g1.get(n))} | {ratio(g1.get(n), g01.get(n))} "
            f"| {ratio(g1.get(n), d1.get(n))} |")
    md = "\n".join(lines) + "\n"
    if note:
        md += "\n" + note
    open(out_md, "w").write(md)
    print(f"wrote {out_md}: duck_sf1={dt:.1f}s graft_sf1={gt:.1f}s ratio={gt/dt:.2f}")


if __name__ == "__main__":
    main()
