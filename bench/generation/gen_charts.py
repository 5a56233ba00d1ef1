"""Bar-chart PNGs from an `evaluate.py` results JSON.

TPU analogue of the reference's chart publisher
(`/root/reference/bench/generation/gen_barchart.py`): where the reference
renders its W{i4,i8,f8}xA{f16,f8} grid per metric to PNG, this renders the
evaluate.py config grid (bf16 / W8A16 / W4A16 / Wf8A16 / W8A8 / W4A8 /
Wf8Af8) for each measured metric.

Usage:
    python bench/generation/evaluate.py --metric all > results.json
    python bench/generation/gen_charts.py results.json --title "llama-1B" \
        --out-dir charts/

One PNG per metric. Single-series magnitude bars: the x labels carry
identity, so the bars wear one categorical hue; the bf16 reference bar is
annotated with a baseline rule instead of a second color.
"""

from __future__ import annotations

import argparse
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# Reference palette (dataviz default instance): categorical slot 1 for the
# single series; text/axis tokens stay neutral ink on the light surface.
SERIES = "#2a78d6"
SURFACE = "#fcfcfb"
TEXT_PRIMARY = "#0b0b0b"
TEXT_SECONDARY = "#52514e"
GRID = "#e5e4e0"

METRICS = {
    # key -> (y label, higher_is_better)
    "ppl": ("Perplexity", False),
    "dppl": ("Perplexity delta vs bf16", False),
    "ms_per_token": ("Decode latency (ms/token)", False),
    "tokens_per_s": ("Decode throughput (tokens/s)", True),
    "sqnr_min": ("Min per-layer weight SQNR (dB)", True),
    "sqnr_mean": ("Mean per-layer weight SQNR (dB)", True),
    "kl": ("Logits KL vs bf16", False),
    "top1": ("Top-1 agreement vs bf16", True),
}


def save_chart(title: str, labels, values, ylabel: str, path: str) -> None:
    fig, ax = plt.subplots(figsize=(9, 4.5), layout="constrained")
    fig.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)
    x = range(len(labels))
    # Thin marks with a surface gap between adjacent bars (width < 1).
    bars = ax.bar(x, values, width=0.62, color=SERIES, zorder=3)
    ax.bar_label(bars, padding=4, fmt="%.3g", color=TEXT_PRIMARY, fontsize=9)
    ax.set_xticks(list(x), labels, color=TEXT_PRIMARY)
    ax.set_ylabel(ylabel, color=TEXT_SECONDARY)
    ax.set_title(title, color=TEXT_PRIMARY, loc="left", fontweight="bold")
    # Recessive grid/axes: y grid only, no top/right spines, muted ticks.
    ax.grid(axis="y", color=GRID, zorder=0)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(GRID)
    ax.tick_params(colors=TEXT_SECONDARY)
    lo = min(0.0, min(values))
    hi = max(values)
    pad = 0.15 * (hi - lo if hi > lo else abs(hi) or 1.0)
    ax.set_ylim(lo - (pad if lo < 0 else 0), hi + pad)
    if lo < 0:
        ax.axhline(0, color=TEXT_SECONDARY, linewidth=1, zorder=2)
    fig.savefig(path, dpi=144)
    plt.close(fig)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("results", help="evaluate.py JSON output file")
    p.add_argument("--title", default="quanto_tpu", help="chart title prefix")
    p.add_argument("--out-dir", default=".", help="directory for the PNGs")
    args = p.parse_args()
    with open(args.results) as f:
        results = json.load(f)
    os.makedirs(args.out_dir, exist_ok=True)
    configs = list(results)
    metrics = sorted({k for row in results.values() for k in row} & set(METRICS))
    if not metrics:
        raise SystemExit(f"no known metrics in {args.results} (rows: {configs})")
    for m in metrics:
        labels = [c for c in configs if m in results[c]]
        values = [float(results[c][m]) for c in labels]
        ylabel, _ = METRICS[m]
        path = os.path.join(
            args.out_dir, f"{args.title.replace('/', '-')}_{m}.png"
        )
        save_chart(f"{args.title} — {ylabel}", labels, values, ylabel, path)
        print(path)


if __name__ == "__main__":
    main()
