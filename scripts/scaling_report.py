#!/usr/bin/env python3
"""Compare two Bench JSON outputs (e.g. sf0.1 vs a ScaleGen 10x blow-up) and
emit a per-query scaling table. A query is flagged when its time ratio
exceeds the data ratio (superlinear scaling)."""
import json
import sys

def main():
    base_path, scaled_path, data_ratio = sys.argv[1], sys.argv[2], float(sys.argv[3])
    base = json.load(open(base_path))
    scaled = json.load(open(scaled_path))
    bq, sq = base["queries"], scaled["queries"]
    rows = []
    for name in sorted(bq):
        if name not in sq:
            continue
        b, s = bq[name], sq[name]
        ratio = s / b if b > 0 else float("inf")
        # small absolute times are scheduling noise, not scaling signal
        flag = "SUPERLINEAR" if (ratio > data_ratio and s > 1.0) else ""
        rows.append((name, b, s, ratio, flag))
    print(f"| query | {base['sf'].split('/')[-1]} s | {scaled['sf'].split('/')[-1]} s | ratio | note |")
    print("|---|---|---|---|---|")
    for name, b, s, ratio, flag in sorted(rows, key=lambda r: -r[3]):
        print(f"| {name} | {b:.2f} | {s:.2f} | {ratio:.1f}x | {flag} |")
    total_b = base["value"]
    total_s = scaled["value"]
    flagged = [r[0] for r in rows if r[4]]
    print(f"\ntotal: {total_b:.1f}s -> {total_s:.1f}s ({total_s/total_b:.2f}x for {data_ratio:.0f}x data)")
    print(f"superlinear (ratio > {data_ratio:.0f}x and > 1s): {flagged or 'none'}")

if __name__ == "__main__":
    main()
