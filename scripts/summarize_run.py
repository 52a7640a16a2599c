"""Summarize a training run's CSV logs into a markdown report.

    python scripts/summarize_run.py --log-dir logs --out docs/results/run120k

Copies metrics.csv next to the report and writes run_summary.md with
throughput, the loss trajectory (windowed), best/final validation, and
an LR-staircase check against the configured schedule.
"""
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import click
import numpy as np
import pandas as pd


@click.command()
@click.option("--log-dir", required=True, help="CSVLogger directory (metrics.csv)")
@click.option("--out", required=True, help="Output directory for the report")
@click.option("--lr-decay", default=0.9)
@click.option("--lr-decay-interval", default=10000)
def main(log_dir, out, lr_decay, lr_decay_interval):
    df = pd.read_csv(os.path.join(log_dir, "metrics.csv"))
    os.makedirs(out, exist_ok=True)
    shutil.copy(os.path.join(log_dir, "metrics.csv"),
                os.path.join(out, "metrics.csv"))

    # A resumed run APPENDS to metrics.csv, re-logging steps after the
    # restored checkpoint. Each step-decrease marks a restart boundary;
    # within each metric, later rows supersede earlier ones (they belong
    # to the lineage that survived to the end of the file).
    segment = (df["step"].diff() < 0).cumsum()
    n_restarts = int(segment.iloc[-1]) if len(df) else 0

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

    lines = ["# Training run summary", ""]
    last = int(df["step"].max())
    lines.append(f"- steps logged: up to **{last}**")
    if n_restarts:
        lines.append(
            f"- restarts (checkpoint resumes detected in the log): "
            f"**{n_restarts}**"
        )

    if len(train):
        rate = train["train/steps_per_sec"].dropna()
        lines.append(
            f"- throughput: mean **{rate.mean():.2f} steps/s** "
            f"(p10 {rate.quantile(0.1):.2f}, p90 {rate.quantile(0.9):.2f})"
        )
        # wall-clock excludes dead time between restarts: sum each
        # contiguous segment's span rather than max-min over the file
        span = df.groupby(segment)["time"].agg(lambda s: s.max() - s.min()).sum()
        lines.append(f"- wall-clock over logged span: **{span / 3600:.2f} h**")
        w = max(1, len(train) // 10)
        lines.append("")
        lines.append("| step | train/loss (window mean) |")
        lines.append("|---|---|")
        for i in range(0, len(train), w):
            rows = train.iloc[i : i + w]
            lines.append(
                f"| {int(rows['step'].iloc[-1])} | "
                f"{rows['train/loss'].mean():.4f} |"
            )

    if len(val):
        best = val.loc[val["val/loss"].idxmin()]
        lines.append("")
        lines.append(
            f"- best val/loss: **{best['val/loss']:.4f}** at step "
            f"{int(best['step'])}"
        )
        lines.append(
            f"- final val/loss: **{val['val/loss'].iloc[-1]:.4f}** at step "
            f"{int(val['step'].iloc[-1])}"
        )

    # LR staircase check: logged lr must equal lr0 * decay^(step // interval)
    lr = train.dropna(subset=["train/lr"])
    if len(lr):
        # the trainer logs schedule(step) at the END of each window:
        # lr0 * decay^(step // interval), staircase
        lr0 = lr["train/lr"].iloc[0] / (
            lr_decay ** (int(lr["step"].iloc[0]) // lr_decay_interval)
        )
        expected = lr0 * lr_decay ** (
            (lr["step"] // lr_decay_interval).astype(int)
        )
        ok = bool(np.allclose(lr["train/lr"], expected, rtol=1e-4))
        lines.append(
            f"- LR staircase (x{lr_decay} every {lr_decay_interval}): "
            f"{'**verified**' if ok else '**MISMATCH**'}"
        )

    report = "\n".join(lines) + "\n"
    path = os.path.join(out, "run_summary.md")
    with open(path, "w") as fh:
        fh.write(report)
    print(report)
    print(f"[summarize_run] wrote {path}")


if __name__ == "__main__":
    main()
