#!/usr/bin/env python3
"""Diff two bench_full JSON records: flag per-query regressions.

Usage: bench_diff.py OLD NEW [ratio=1.2] [abs_s=0.8]
Prints movers (new > ratio*old AND new-old > abs_s), improvements of
the same magnitude, and queries present in only one record.
"""
import json
import sys

old = json.load(open(sys.argv[1]))["queries"]
new = json.load(open(sys.argv[2]))["queries"]
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
abs_s = float(sys.argv[4]) if len(sys.argv) > 4 else 0.8

shared = sorted(set(old) & set(new))
so, sn = sum(old[q] for q in shared), sum(new[q] for q in shared)
print(f"shared {len(shared)}: {so:.1f}s -> {sn:.1f}s ({sn/so:.2f}x)")
print(f"only-old: {sorted(set(old) - set(new))}")
newcomers = sorted(set(new) - set(old))
print(f"only-new: {[(q, round(new[q], 2)) for q in newcomers]}")
regs = [(q, old[q], new[q]) for q in shared
        if new[q] > ratio * old[q] and new[q] - old[q] > abs_s]
imps = [(q, old[q], new[q]) for q in shared
        if old[q] > ratio * new[q] and old[q] - new[q] > abs_s]
for tag, rows in (("REGRESSION", regs), ("improved", imps)):
    for q, o, n in sorted(rows, key=lambda r: r[1] - r[2]):
        print(f"{tag} {q}: {o:.2f}s -> {n:.2f}s")
print(f"{len(regs)} regressions, {len(imps)} improvements")
