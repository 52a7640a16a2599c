"""Plot a training run's loss curves from a CSVLogger metrics.csv.

    python scripts/plot_run.py --log-dir /tmp/run120k/logs \
        --out docs/results/run120k/loss_curve.png

Restart-aware like summarize_run.py: a resume appends re-logged steps,
so each metric is deduped by step keeping the last occurrence.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import pandas as pd


@click.command()
@click.option("--log-dir", required=True, help="CSVLogger directory (metrics.csv)")
@click.option("--out", required=True, help="Output PNG path")
@click.option("--window", default=10, help="Train-loss smoothing window (log rows)")
def main(log_dir, out, window):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    df = pd.read_csv(os.path.join(log_dir, "metrics.csv"))
    train = (
        df.dropna(subset=["train/loss"])
        .drop_duplicates("step", keep="last")
        .sort_values("step")
    )
    val = (
        df.dropna(subset=["val/loss"])
        .drop_duplicates("step", keep="last")
        .sort_values("step")
    )

    # palette: first two categorical slots of the validated default set
    # (documented adjacent-pair CVD deltaE 9.1, normal 19.6 on light)
    SURFACE, TEXT, MUTED = "#fcfcfb", "#0b0b0b", "#52514e"
    TRAIN_C, VAL_C = "#2a78d6", "#eb6834"

    fig, ax = plt.subplots(figsize=(8, 4.5), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    smoothed = train["train/loss"].rolling(window, min_periods=1).mean()
    ax.plot(train["step"], smoothed, color=TRAIN_C, lw=1.4,
            label=f"train loss ({window}-window mean)")
    ax.plot(val["step"], val["val/loss"], color=VAL_C, lw=1.4,
            label="val loss")

    ax.set_xlabel("step", color=MUTED)
    ax.set_ylabel("multi-resolution STFT loss", color=MUTED)
    ax.tick_params(colors=MUTED, labelsize=8)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(MUTED)
    ax.grid(True, axis="y", color="#e6e5e2", lw=0.6)
    ax.set_axisbelow(True)
    leg = ax.legend(frameon=False, fontsize=9)
    for t in leg.get_texts():
        t.set_color(TEXT)

    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    fig.tight_layout()
    fig.savefig(out, facecolor=SURFACE)
    print(f"[plot_run] wrote {out}")


if __name__ == "__main__":
    main()
