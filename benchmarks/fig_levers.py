"""Render docs/fig_levers.svg — the run-7 result (RESULTS.md): file-disjoint
speaker-probe accuracy vs pretraining steps at FIXED 2.56 s context, one
line per scale lever (baseline / 4x data / 2x width), on the dynamics
corpus with all_steps negatives.

Data is transcribed from the RESULTS.md run-3 and run-7 tables (mean ± std
over 3 probe-split seeds); re-run after extending an arm. Design follows
the dataviz method: three CATEGORICAL series (arm identity) wear the
reference palette's first three slots in fixed order (blue/orange/aqua —
the all-pairs-validated opening three; node is unavailable in this image so
the documented-passing values are used verbatim), 2px lines, whiskers for
±std, a legend plus direct labels at line ends, recessive grid, one axis,
text in ink tokens (never series color).
"""

import matplotlib

matplotlib.use("svg")
import matplotlib.pyplot as plt  # noqa: E402

# (steps, acc%, std%) per arm — RESULTS.md run 3 (baseline) and run 7
SERIES = [
    ("baseline (0.85 h, d_ar 256)", "#2a78d6",
     [(0, 2.2, 0.4), (4000, 4.2, 0.9), (8000, 5.7, 1.3)]),
    ("4× data (3.4 h)", "#eb6834",
     [(0, 3.5, 0.2), (4000, 2.7, 0.2), (8000, 3.1, 0.7),
      (12000, 10.0, 0.5), (16000, 11.2, 0.9)]),
    ("2× width (d_ar 512)", "#1baf7a",
     [(0, 3.8, 1.2), (4000, 2.6, 1.2), (8000, 6.6, 1.7),
      (12000, 10.2, 1.8)]),
]
CHANCE = 3.125  # 32 speakers
INK, INK2, GRID = "#1a1a19", "#6e6d66", "#e8e7e3"


def main(out="docs/fig_levers.svg"):
    fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=100)
    fig.patch.set_facecolor("white")
    ax.set_facecolor("white")
    for name, color, rows in SERIES:
        xs = [r[0] for r in rows]
        ys = [r[1] for r in rows]
        es = [r[2] for r in rows]
        ax.errorbar(xs, ys, yerr=es, color=color, lw=2, marker="o", ms=4.5,
                    mfc=color, mec="white", mew=1, capsize=2,
                    elinewidth=1, zorder=3, label=name)
        # nudges keep end labels off the 4x-data line, which crosses
        # y~5.7 near x~9.5k (the baseline label's row) and runs just
        # above the width arm's endpoint
        dx, dy, ha = {"baseline (0.85 h, d_ar 256)": (7, -9, "left"),
                      "2× width (d_ar 512)": (7, -11, "left")}.get(
                          name, (7, 4, "left"))
        ax.annotate(name.split(" (")[0], (xs[-1], ys[-1]), xytext=(dx, dy),
                    ha=ha, textcoords="offset points", fontsize=9,
                    color=INK, va="center")
    ax.axhline(CHANCE, color=INK2, lw=1, ls=(0, (4, 3)), zorder=2)
    ax.annotate(f"chance {CHANCE:.1f}%", (16000, CHANCE), xytext=(0, -11),
                textcoords="offset points", fontsize=8.5, color=INK2,
                ha="right")
    ax.set_xlim(-500, 19500)
    ax.set_ylim(0, 14)
    ax.set_xticks([0, 4000, 8000, 12000, 16000])
    ax.set_xticklabels(["0", "4k", "8k", "12k", "16k"])
    ax.set_xlabel("pretraining steps", fontsize=10, color=INK)
    ax.set_ylabel("file-disjoint speaker top-1 (%)", fontsize=10, color=INK)
    ax.set_title("Scale levers at fixed 2.56 s context (dynamics corpus, "
                 "all-steps negatives)", fontsize=11, color=INK, pad=12,
                 loc="left")
    ax.grid(axis="y", color=GRID, lw=0.8, zorder=0)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.tick_params(colors=INK2, labelsize=9)
    leg = ax.legend(loc="upper left", frameon=False, fontsize=9,
                    labelcolor=INK)
    for t in leg.get_texts():
        t.set_color(INK)
    fig.tight_layout()
    fig.savefig(out, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
