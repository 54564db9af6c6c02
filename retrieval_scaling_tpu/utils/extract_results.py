"""Result extraction + scaling-curve analysis.

Parses the append-only results log into pandas tables and produces the
datastore-scaling plots (reference: utils/extract_results.py:83-224).
The reference regex-parses ``key = value`` pairs from the tab-separated
``PplEvalOutput.log_message`` lines; same parser here, plus the harness's
json records.
"""

from __future__ import annotations

import json
import re
from typing import List, Optional

_KV_RE = re.compile(r"(\w[\w #]*?) = ([^\t\n]+)")


def parse_results_log(path: str) -> "pandas.DataFrame":  # noqa: F821
    import pandas as pd

    rows: List[dict] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith("{"):
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                for task, metrics in rec.get("results", {}).items():
                    rows.append({"task": task, **metrics})
                continue
            kvs = {}
            for key, val in _KV_RE.findall(line):
                key = key.strip()
                try:
                    kvs[key] = float(val)
                except ValueError:
                    kvs[key] = val.strip()
            if kvs:
                rows.append(kvs)
    return pd.DataFrame(rows)


def scaling_table(
    df: "pandas.DataFrame",  # noqa: F821
    x: str = "sampled shards",
    y: str = "perplexity",
    group: Optional[str] = "concate_k",
) -> "pandas.DataFrame":  # noqa: F821
    cols = [c for c in (x, y, group) if c is not None and c in df.columns]
    sub = df[cols].dropna()
    if group and group in sub.columns:
        return sub.groupby([group, x])[y].mean().reset_index().sort_values([group, x])
    return sub.groupby(x)[y].mean().reset_index()


def plot_scaling_curve(
    df: "pandas.DataFrame",  # noqa: F821
    out_path: str,
    x: str = "sampled shards",
    y: str = "perplexity",
    group: Optional[str] = "concate_k",
) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    table = scaling_table(df, x, y, group)
    fig, ax = plt.subplots(figsize=(6, 4))
    if group and group in table.columns:
        for key, sub in table.groupby(group):
            ax.plot(sub[x], sub[y], marker="o", label=f"{group}={key}")
        ax.legend()
    else:
        ax.plot(table[x], table[y], marker="o")
    ax.set_xlabel(f"{x} (datastore scale)")
    ax.set_ylabel(y)
    ax.set_xscale("log")
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


# ---------------------------------------------------------------- calibration
def load_calibration(path: str) -> dict:
    """{example -> [(lm_loss, retrieval_score or None), ...]} written by
    evals/perplexity.evaluate_calibration (reference pkl:
    out_calibration/..._samples.pkl)."""
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)


def calibration_matrices(by_example: dict, k: int | None = None):
    """(lm_losses [N, k], retrieval_scores [N, k]) over examples with >= k
    scored docs (reference: utils/extract_results.py:262-283)."""
    import numpy as np

    rows = [
        pairs for pairs in by_example.values()
        if pairs and all(s is not None for _, s in pairs)
    ]
    if not rows:
        raise ValueError("no calibration rows with retrieval scores")
    k = k or min(len(r) for r in rows)
    rows = [r[:k] for r in rows if len(r) >= k]
    losses = np.asarray([[l for l, _ in r] for r in rows], float)
    scores = np.asarray([[s for _, s in r] for r in rows], float)
    return losses, scores


def calibration_summary(by_example: dict) -> dict:
    """Top-1-doc PPL vs best ('gold') doc PPL from the scored candidates
    (reference: utils/extract_results.py:264-274)."""
    import math

    import numpy as np

    top1 = [pairs[0][0] for pairs in by_example.values() if pairs]
    best = [min(l for l, _ in pairs) for pairs in by_example.values() if pairs]
    return {
        "ppl_top1": math.exp(float(np.mean(top1))),
        "ppl_gold": math.exp(float(np.mean(best))),
        "n_examples": len(best),
    }


def plot_calibration(
    by_example: dict,
    out_path: str,
    mode: str = "ci",        # "ci" | "mean" | "all"
    title: str = "Calibration",
) -> None:
    """LM loss vs retrieval score, per candidate rank
    (reference: utils/extract_results.py:277-331)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    losses, scores = calibration_matrices(by_example)
    fig, ax = plt.subplots(figsize=(8, 5))
    if mode == "all":
        ax.plot(losses.flatten(), scores.flatten(), "o", alpha=0.3, markersize=3)
    elif mode == "ci":
        n = losses.shape[0]
        z = 1.96
        l_mean, s_mean = losses.mean(0), scores.mean(0)
        l_ci = z * losses.std(0, ddof=1) / np.sqrt(n)
        s_ci = z * scores.std(0, ddof=1) / np.sqrt(n)
        ax.errorbar(
            l_mean, s_mean, xerr=l_ci, yerr=s_ci,
            fmt="o", ecolor="lightgray", alpha=0.7, capsize=4,
        )
    else:
        ax.plot(losses.mean(0), scores.mean(0), "o")
    ax.set_xlabel("LM loss")
    ax.set_ylabel("retrieval score")
    ax.set_title(title)
    ax.grid(True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def plot_top1_vs_gold(
    calibration_paths: dict,
    out_path: str,
    closed_book_ppl: float | None = None,
) -> "pandas.DataFrame":  # noqa: F821
    """PPL of the top-1 doc vs the per-sample best doc as the datastore
    grows ({n_shards: calibration pkl path};
    reference: utils/extract_results.py:331-361)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    rows = []
    for n_shards in sorted(calibration_paths):
        summary = calibration_summary(load_calibration(calibration_paths[n_shards]))
        rows.append({"n_shards": n_shards, **summary})
    df = pd.DataFrame(rows)

    fig, ax = plt.subplots(figsize=(7, 4.5))
    if closed_book_ppl is not None:
        ax.axhline(y=closed_book_ppl, color="r", linestyle="-", label="Closed-book")
    ax.plot(df["n_shards"], df["ppl_top1"], marker="o", label="Top-1 doc")
    ax.plot(df["n_shards"], df["ppl_gold"], marker="o", label="Gold doc")
    ax.set_xlabel("number of shards")
    ax.set_ylabel("perplexity")
    ax.legend()
    ax.grid(True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return df


def plot_per_sample_losses(by_example: dict, out_path: str, show_top_k: int = 10) -> None:
    """Per-sample losses of the k highest-retrieval-score docs
    (reference: utils/extract_results.py:362-384)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    losses, scores = calibration_matrices(by_example)
    order = np.argsort(-scores, axis=1)
    sorted_losses = np.take_along_axis(losses, order, axis=1)
    k = min(show_top_k, sorted_losses.shape[1])
    fig, ax = plt.subplots(figsize=(14, 5))
    x = np.arange(sorted_losses.shape[0])
    for i in range(k - 1, -1, -1):
        ax.plot(x, sorted_losses[:, i], "o", markersize=3, label=f"top-{i+1} doc")
    ax.set_xlabel("evaluation sample")
    ax.set_ylabel("loss")
    ax.legend(loc="upper left", bbox_to_anchor=(1, 1))
    ax.grid(True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


# ---------------------------------------------------------------- variance
def per_shard_variance(
    df: "pandas.DataFrame",  # noqa: F821
    y: str = "perplexity",
    shard_col: str = "all shards",
    group: tuple = (),
) -> "pandas.DataFrame":  # noqa: F821
    """Variance of a metric across different shard subsets of equal size —
    the sampling-noise analysis for datastore-scaling curves
    (reference: utils/extract_results.py:386-425 computes the spread of
    lm-eval values across shard subdirectories)."""
    import pandas as pd

    sub = df.dropna(subset=[y]).copy()
    if shard_col in sub.columns:
        sub["n_shards"] = sub[shard_col].astype(str).map(
            lambda s: len([p for p in re.split(r"[^0-9]+", s) if p])
        )
    elif "sampled shards" in sub.columns:
        sub["n_shards"] = sub["sampled shards"]
    else:
        raise KeyError("no shard column found")
    keys = ["n_shards", *[g for g in group if g in sub.columns]]
    agg = sub.groupby(keys)[y].agg(["mean", "std", "var", "count"]).reset_index()
    return agg


def plot_per_shard_variance(
    df: "pandas.DataFrame",  # noqa: F821
    out_path: str,
    y: str = "perplexity",
    **kwargs,
) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    table = per_shard_variance(df, y=y, **kwargs)
    fig, ax = plt.subplots(figsize=(7, 4.5))
    ax.errorbar(table["n_shards"], table["mean"], yerr=table["std"].fillna(0.0), marker="o", capsize=4)
    ax.set_xlabel("number of shards")
    ax.set_ylabel(f"{y} (mean ± std over shard subsets)")
    ax.grid(True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


# ---------------------------------------------------------------- lm-eval
def lm_eval_results_table(result_dir: str, task_filter: str | None = None):
    """Collect rag_eval --output_path jsons under a directory into one
    table with (file, task, n-doc, metric columns) rows — the reference's
    ``extract_lm_eval_results`` walker (utils/extract_results.py:160-224)
    over its results tree."""
    import glob as _glob
    import os as _os

    import pandas as pd

    rows = []
    for path in sorted(_glob.glob(_os.path.join(result_dir, "**", "*.json"), recursive=True)):
        try:
            with open(path) as f:
                rec = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        if not isinstance(rec, dict) or "results" not in rec:
            continue
        for task, metrics in rec["results"].items():
            if task_filter and task_filter not in task:
                continue
            rows.append({"file": _os.path.relpath(path, result_dir), "task": task, **metrics})
        for group, metrics in rec.get("groups", {}).items():
            if task_filter and task_filter not in group:
                continue
            rows.append(
                {"file": _os.path.relpath(path, result_dir), "task": f"group:{group}", **metrics}
            )
    return pd.DataFrame(rows)
