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
    p.add_argument("results", nargs="?",
                   help="benchmark_results.txt (with JSON lines)")
    p.add_argument("--outdir", default="figures")
    p.add_argument("--grid-json",
                   help="render the alg-comparison grid figure from a "
                        "recorded grid JSON (benchmarks/grid_r03.json)")
    args = p.parse_args()
    import os

    os.makedirs(args.outdir, exist_ok=True)
    if args.grid_json:
        alg_grid_figure(args.grid_json,
                        f"{args.outdir}/alg_comparison_grid.png")
    if args.results:
        rows = load_lines(args.results)
        fig_alg_comparison(rows, f"{args.outdir}/alg_comparison.png")
        fig_break_even(rows, f"{args.outdir}/runtime_vs_density.png")
        if not rows:
            print("no JSON rows found", file=sys.stderr)


def alg_grid_figure(json_path, out_path):
    """Grouped-bar small multiples: spmm_tpu vs reference cuSPARSE per
    (n, density) cell of the alg-comparison grid (benchmarks/
    grid_r03.json).  One linear ms axis per panel (never dual axes);
    two fixed categorical hues (validated default palette, slots 1-2);
    speedup factors direct-labeled above our bars."""
    with open(json_path) as f:
        data = json.load(f)
    cells = data["cells"]
    panels = sorted({(c["n"], c["density"]) for c in cells})
    SURF, INK, INK2 = "#fcfcfb", "#0b0b0b", "#52514e"
    C_OURS, C_REF = "#2a78d6", "#eb6834"   # categorical slots 1, 2

    fig, axes = plt.subplots(1, len(panels), figsize=(3.1 * len(panels), 3.4))
    fig.patch.set_facecolor(SURF)
    for ax, (n, dens) in zip(axes, panels):
        ax.set_facecolor(SURF)
        rows = sorted((c for c in cells
                       if c["n"] == n and c["density"] == dens),
                      key=lambda c: c["alg"])
        x = list(range(len(rows)))
        w = 0.38
        ours = [c["ours_ms"] for c in rows]
        ref = [c["ref_ms"] for c in rows]
        b1 = ax.bar([i - w / 2 - 0.02 for i in x], ours, w,
                    color=C_OURS, zorder=3)
        ax.bar([i + w / 2 + 0.02 for i in x], ref, w,
               color=C_REF, zorder=3)
        for i, c in enumerate(rows):
            ax.annotate(f"{c['ref_ms'] / c['ours_ms']:.1f}×",
                        (i - w / 2 - 0.02, c["ours_ms"]),
                        textcoords="offset points", xytext=(0, 3),
                        ha="center", fontsize=8, color=INK)
        ax.set_xticks(x)
        ax.set_xticklabels([f"ALG{c['alg']}" for c in rows],
                           fontsize=8, color=INK2)
        ax.set_title(f"n={n}  ρ={dens}", fontsize=9, color=INK)
        ax.tick_params(axis="y", labelsize=8, colors=INK2, length=0)
        ax.grid(axis="y", color="#e4e3df", linewidth=0.6, zorder=0)
        for s in ("top", "right", "left"):
            ax.spines[s].set_visible(False)
        ax.spines["bottom"].set_color("#d6d5d0")
        ax.margins(y=0.18)
    axes[0].set_ylabel("device ms / multiply", fontsize=8, color=INK2)
    fig.legend(["spmm_tpu (TPU v5e)", "reference cuSPARSE"],
               loc="upper right", fontsize=8, frameon=False,
               bbox_to_anchor=(0.99, 1.02))
    fig.suptitle("SpGEMM CSR@CSR: spmm_tpu vs reference, per algorithm",
                 fontsize=10, color=INK, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.93))
    fig.savefig(out_path, dpi=160, facecolor=SURF)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
