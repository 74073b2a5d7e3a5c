#!/usr/bin/env python
"""Render benchmark figures from the JSON lines emitted by the drivers
(`--json` flags) — the analogue of the reference's figures/ pipeline
(plot_bench.py + matplotlib PNGs embedded in its README)."""

import argparse
import collections
import json
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def load_lines(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return rows


def fig_alg_comparison(rows, out):
    data = [r for r in rows if r.get("bench") == "alg_comparison"]
    if not data:
        return
    configs = sorted({(r["size"], r["density"]) for r in data})
    algs = sorted({r["alg"] for r in data})
    fig, ax = plt.subplots(figsize=(8, 4.5))
    width = 0.8 / len(algs)
    for ai, alg in enumerate(algs):
        xs, ys = [], []
        for ci, cfg in enumerate(configs):
            match = [r for r in data
                     if (r["size"], r["density"]) == cfg and r["alg"] == alg]
            if match:
                xs.append(ci + ai * width)
                ys.append(match[0]["median_ms"])
        ax.bar(xs, ys, width=width, label=f"alg{alg}")
    ax.set_xticks(range(len(configs)),
                  [f"n={s}\nρ={d}" for s, d in configs])
    ax.set_ylabel("median ms")
    ax.set_yscale("log")
    ax.legend()
    ax.set_title("SpGEMM strategy comparison")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


def fig_break_even(rows, out):
    data = [r for r in rows if r.get("bench") == "dense_vs_sparse"]
    if not data:
        return
    by_size = collections.defaultdict(list)
    for r in data:
        if r.get("dense_ms") and r.get("sparse_ms"):
            by_size[r["size"]].append((r["density"], r["dense_ms"],
                                       r["sparse_ms"]))
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for size, pts in sorted(by_size.items()):
        pts.sort()
        ds = [p[0] for p in pts]
        ax.plot(ds, [p[1] for p in pts], "--", label=f"dense n={size}")
        ax.plot(ds, [p[2] for p in pts], "-o", label=f"sparse n={size}")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("density")
    ax.set_ylabel("ms")
    ax.legend(fontsize=8)
    ax.set_title("Dense vs sparse GEMM break-even")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results", help="benchmark_results.txt (with JSON lines)")
    p.add_argument("--outdir", default="figures")
    args = p.parse_args()
    import os

    os.makedirs(args.outdir, exist_ok=True)
    rows = load_lines(args.results)
    fig_alg_comparison(rows, f"{args.outdir}/alg_comparison.png")
    fig_break_even(rows, f"{args.outdir}/runtime_vs_density.png")
    if not rows:
        print("no JSON rows found", file=sys.stderr)


if __name__ == "__main__":
    main()
