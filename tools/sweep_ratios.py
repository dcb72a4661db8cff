#!/usr/bin/env python3
"""Compare two graft.Bench records (base vs replicated dir) and print the
per-query growth-ratio table for the SURVEY §6 full-registry scale sweep.

Feed it each run's bench_record.json (written to the run's CWD — run the
two benches from DIFFERENT directories, or copy the file between runs).
The bench's final STDOUT line is the compact summary since round 11 and
carries no per-query map.

Usage: python3 tools/sweep_ratios.py base/bench_record.json sweep/bench_record.json [topN]
"""
import json
import sys


def queries_of(path: str) -> dict:
    rec = json.load(open(path))
    q = rec.get("queries")
    if q is None:
        sys.exit(f"{path} has no 'queries' map - this looks like the compact "
                 "stdout summary; pass the run's bench_record.json instead")
    return q


def main() -> None:
    base_path, sweep_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    base = queries_of(base_path)
    sweep = queries_of(sweep_path)
    rows = []
    for name, b in base.items():
        s = sweep.get(name)
        if b is None or s is None or b < 0 or s < 0:
            rows.append((float("inf"), name, b, s))
            continue
        # floor tiny denominators: a 0.03 s query's ratio is scheduling
        # noise, not a scaling exponent
        rows.append((s / max(b, 0.05), name, b, s))
    rows.sort(key=lambda t: t[0], reverse=True)
    print(f"| query | sf0.1 (s) | 10x (s) | ratio |")
    print("|---|---|---|---|")
    def fmt(v):
        # registry-mismatch / failed rows carry None or -1 — the sentinel
        # must print, not TypeError inside the very case it exists to flag
        return f"{v:.2f}" if isinstance(v, (int, float)) and v >= 0 else "n/a"
    for r, name, b, s in rows[:top_n]:
        rs = f"{r:.1f}x" if r != float("inf") else "n/a"
        print(f"| {name} | {fmt(b)} | {fmt(s)} | {rs} |")
    ratios = [r for r, *_ in rows if r != float("inf")]
    import statistics
    med = f"{statistics.median(ratios):.2f}x" if ratios else "n/a (no comparable rows)"
    print(f"\nmedian ratio {med}, "
          f"queries >12x: {sum(1 for r in ratios if r > 12)}, "
          f"missing/failed rows: {sum(1 for r, *_ in rows if r == float('inf'))}, "
          f"total base {sum(b for _, _, b, _ in rows if b and b > 0):.1f}s "
          f"sweep {sum(s for _, _, _, s in rows if s and s > 0):.1f}s")


if __name__ == "__main__":
    main()
