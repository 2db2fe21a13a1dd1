#!/usr/bin/env python3
"""Per-family sf0.1 -> sf1 (10x data) scaling ratios for STATUS.md.

Reads the committed BENCH_FULL.json (sf0.1) and BENCH_sf1.json (the
ScaleGen 10x replica) and prints each query family's cost ratio, flagging
anything super-linear (>10x for 10x data, beyond noise).
"""
import json
import statistics
import sys

FAMILIES = {
    "tpch-scan/agg/join": ["q01", "q02", "q03", "q04", "q05", "q06", "q07", "q08", "q09"],
    "knn-brute": ["q10", "q11", "q12", "q13", "q14", "q15"],
    "hnsw-index": ["q16", "q17", "q18", "q19", "q78", "q79", "q80", "q81", "q82"],
    "dedup-pairs (mining)": ["q22", "q23", "q24", "q63", "q64", "q20"],
    "embedding-neardup/lsh": ["q28", "q32", "q65", "q88"],
    "ann-twins (q28/q65 at graph ef)": ["q86", "q87"],
    "text-quality": ["q21", "q25", "q31", "q33", "q37", "q48", "q60"],
    "bm25/text-search": ["q52", "q53", "q54", "q56", "q59"],
    "ann-variants (ivf/pq/sq)": ["q30", "q41", "q43", "q55", "q68", "q69"],
    "filtered/radius/mmr": ["q61", "q62", "q66", "q67", "q70", "q74", "q75"],
    "pipeline/split/pack": ["q38", "q44", "q45", "q46", "q47", "q49", "q50", "q76"],
    "sessionize/asof/zorder": ["q40", "q42", "q51", "q57", "q58", "q71", "q72"],
    "multimodal": ["q26", "q83", "q84", "q85"],
    "misc": ["q27", "q29", "q34", "q35", "q36", "q39", "q73", "q77"],
    "builds": ["build_"],
}


# Flag bars by expected complexity class: query entries are expected
# ~linear in data (bar 10x for 10x data, beyond noise); index BUILDS are
# n log n by construction (an HNSW insert costs O(log n) beam work), so
# their envelope at these n is ~10x * log(10n)/log(n) ~= 12.5x — flagging
# a build at 10.3x would cry wolf on the exact scaling its own
# matched-options measurements predict (round-14 verdict: "the n log n
# envelope (~12x per decade)").
QUERY_BAR = 10.0
BUILD_BAR = 12.5


def bar_for(name):
    return BUILD_BAR if name.startswith("build_") else QUERY_BAR


def main(base_path="BENCH_FULL.json", sf1_path="BENCH_sf1.json"):
    base = json.load(open(base_path))["queries"]
    sf1 = json.load(open(sf1_path))["queries"]
    rows = []
    over_bar = []  # EVERY entry over its flag bar, not just each family's worst
    for fam, prefixes in FAMILIES.items():
        ratios = []
        for name, v1 in sorted(sf1.items()):
            if name.startswith("recall"):
                continue
            if not any(name.startswith(p) for p in prefixes):
                continue
            v0 = base.get(name)
            if v0 and v0 > 0:
                ratios.append((name, v1 / v0, v0, v1))
        if not ratios:
            continue
        med = statistics.median(r[1] for r in ratios)
        worst = max(ratios, key=lambda r: r[1])
        flag = " <-- SUPER-LINEAR" if worst[1] > bar_for(worst[0]) else ""
        rows.append((fam, med, worst, flag))
        over_bar.extend(r for r in ratios if r[1] > bar_for(r[0]))
        print(f"{fam:28s} median {med:5.2f}x  worst {worst[0]} "
              f"{worst[1]:5.2f}x ({worst[2]:.2f}s -> {worst[3]:.2f}s){flag}")
    # complete over-bar accounting: a family's worst must not hide its
    # siblings (round-14 verdict: build_graph_index's 22.4x sat invisible
    # behind build_q86_graph's 23.8x in the same category)
    if over_bar:
        print(f"\nALL entries over the flag bar "
              f"(queries >{QUERY_BAR}x, builds >{BUILD_BAR}x): {len(over_bar)}")
        for name, ratio, v0, v1 in sorted(over_bar, key=lambda r: -r[1]):
            print(f"  {name:28s} {ratio:5.2f}x ({v0:.2f}s -> {v1:.2f}s)")
    else:
        print(f"\nno entries over the flag bar "
              f"(queries >{QUERY_BAR}x, builds >{BUILD_BAR}x)")
    # totals over the records' COMMON keys only: a scale record cut with
    # SPARK_GRAFT_SKIP (by-design-quadratic entries excluded, disclosed in
    # its "skipped" list) must not compare against a baseline total that
    # still includes them
    common = set(base) & set(sf1)
    t0 = sum(v for k, v in base.items()
             if k in common and k.startswith("q") and not k.startswith("recall"))
    t1 = sum(v for k, v in sf1.items()
             if k in common and k.startswith("q") and not k.startswith("recall"))
    print(f"\nsuite query total: {t0:.1f}s -> {t1:.1f}s = {t1 / t0:.2f}x for 10x data"
          f" (common keys only)")
    b0 = sum(v for k, v in base.items() if k in common and k.startswith("build_"))
    b1 = sum(v for k, v in sf1.items() if k in common and k.startswith("build_"))
    print(f"build total:       {b0:.1f}s -> {b1:.1f}s = {b1 / b0:.2f}x for 10x data")


if __name__ == "__main__":
    main(*sys.argv[1:])
