"""Render docs/fig_context_scaling.svg — the context-scaling result
(RESULTS.md runs 3-5): file-disjoint speaker-probe accuracy vs pretrain
steps, one line per context length, on the dynamics corpus with all_steps
negatives.

Data is transcribed from the RESULTS.md study tables (mean ± std over 3
probe-split seeds); re-run after extending a study. Design follows the
dataviz method: ordered series (context length) wear an ordinal one-hue
ramp (blue steps 250→700 — the documented light-mode ordinal range of the
validated reference palette; node is unavailable in this image so the
documented-passing steps are used verbatim), 2px lines, 8px markers,
whiskers for ±std, direct labels at line ends, recessive grid, one axis,
text in ink tokens (never series color).
"""

import matplotlib

matplotlib.use("svg")
import matplotlib.pyplot as plt  # noqa: E402

# (steps, acc%, std%) per context length — RESULTS.md runs 3-5
SERIES = [
    ("1.28 s", "#86b6ef", [(0, 2.7, 0.5), (8000, 3.7, 1.2)]),
    ("2.56 s", "#3987e5", [(0, 2.2, 0.4), (4000, 4.2, 0.9),
                           (8000, 5.7, 1.3)]),
    ("5.12 s", "#1c5cab", [(0, 3.5, 0.8), (4000, 3.7, 0.5), (8000, 3.1, 0.4),
                           (16000, 13.6, 0.5), (20000, 11.1, 0.2),
                           (22000, 10.2, 0.6), (24000, 9.8, 0.8),
                           (28000, 14.1, 0.4), (30000, 13.5, 0.6),
                           (32000, 14.3, 1.3)]),
    # 0-16k rows are the r3 run; 24k is the r5 fresh retrain (same corpus
    # seed/config, tuned kernel — RESULTS.md "r5 completion")
    ("10.24 s", "#0d366b", [(0, 2.2, 1.3), (8000, 3.4, 0.7),
                            (12000, 10.6, 0.8), (16000, 12.8, 0.9),
                            (24000, 17.5, 1.4),
                            (25800, 18.2, 2.2)]),
]
# different FAMILY at a fixed context (run 6): categorical accent hue +
# dashes, deliberately outside the blue context-length ramp
TRANSFORMER = ("5.12 s transformer", "#c2410c",
               [(0, 4.1, 0.4), (4000, 2.0, 0.6), (8000, 2.5, 0.6),
                (12000, 4.8, 0.5), (16000, 6.8, 0.5), (20000, 7.1, 1.7)])
CHANCE = 3.125  # 32 speakers
INK, INK2, GRID = "#1a1a19", "#6e6d66", "#e8e7e3"


def main(out="docs/fig_context_scaling.svg"):
    fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=100)
    fig.patch.set_facecolor("white")
    ax.set_facecolor("white")
    for name, color, rows in SERIES:
        xs = [r[0] for r in rows]
        ys = [r[1] for r in rows]
        es = [r[2] for r in rows]
        ax.errorbar(xs, ys, yerr=es, color=color, lw=2, marker="o", ms=4.5,
                    mfc=color, mec="white", mew=1, capsize=2,
                    elinewidth=1, zorder=3)
        # per-series nudges keep direct labels off neighboring lines (the
        # 5.12 s line climbs steeply right of x=8k, so 2.56 s labels to the
        # LEFT of its endpoint)
        dx, dy, ha = {"1.28 s": (7, -7, "left"),
                      "2.56 s": (-8, 5, "right"),
                      "10.24 s": (7, -11, "left")}.get(name, (7, 0, "left"))
        ax.annotate(name, (xs[-1], ys[-1]), xytext=(dx, dy), ha=ha,
                    textcoords="offset points", va="center", fontsize=9,
                    color=INK)
    name, color, rows = TRANSFORMER
    xs, ys, es = ([r[i] for r in rows] for i in range(3))
    ax.errorbar(xs, ys, yerr=es, color=color, lw=2, ls=(0, (5, 2.5)),
                marker="s", ms=4, mfc=color, mec="white", mew=1, capsize=2,
                elinewidth=1, zorder=2)
    ax.annotate(name, (xs[-1], ys[-1]), xytext=(7, 0), ha="left",
                textcoords="offset points", va="center", fontsize=9,
                color=INK)
    ax.axhline(CHANCE, color=INK2, lw=1, ls=(0, (4, 3)), zorder=1)
    ax.annotate("chance (1/32)", (32500, CHANCE), xytext=(0, -11),
                textcoords="offset points", ha="right", fontsize=8,
                color=INK2)

    ax.set_xlim(-600, 36500)
    ax.set_ylim(0, 21)
    ax.set_xticks([0, 8000, 16000, 24000, 32000])
    ax.set_xticklabels(["0", "8k", "16k", "24k", "32k"])
    ax.set_xlabel("pretraining steps", fontsize=9, color=INK2)
    ax.set_ylabel("file-disjoint speaker top-1 (%)", fontsize=9, color=INK2)
    ax.set_title(
        "Context length unlocks cross-utterance speaker structure\n"
        "dynamics corpus, all-steps negatives, mean ± std over 3 probe "
        "splits", fontsize=10, color=INK, loc="left", pad=10)
    ax.grid(axis="y", color=GRID, lw=0.8, zorder=0)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.tick_params(colors=INK2, labelsize=8, length=0)
    fig.tight_layout()
    fig.savefig(out, bbox_inches="tight", facecolor="white")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
