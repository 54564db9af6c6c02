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
