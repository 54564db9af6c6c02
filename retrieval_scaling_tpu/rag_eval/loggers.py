"""Result loggers: wandb / zeno / jsonl sinks.

The reference harness ships wandb and zeno loggers
(reference: rag-evaluation-harness/lm_eval/loggers/). Same surface here:
``log_results(results, samples=None)`` after an eval run. The wandb/zeno
backends degrade gracefully when their packages are absent (they are not
in this image); the jsonl sink always works and is what CI uses.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)


class JsonlLogger:
    """Append one record per run to a results jsonl (always available)."""

    def __init__(self, path: str):
        self.path = path

    def log_results(self, results: dict, samples: Optional[List[dict]] = None) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps({"time": time.strftime("%Y-%m-%dT%H:%M:%S"), **results}) + "\n")
        if samples:
            base, ext = os.path.splitext(self.path)
            with open(f"{base}_samples{ext or '.jsonl'}", "a") as f:
                for s in samples:
                    f.write(json.dumps(s) + "\n")


class WandbLogger:
    """W&B run logger (reference: lm_eval/loggers/wandb_logger.py)."""

    def __init__(self, project: str = "rag-eval", run_name: Optional[str] = None, **init_kwargs):
        try:
            import wandb  # noqa: F401

            self._wandb = wandb
            self.run = wandb.init(project=project, name=run_name, **init_kwargs)
        except ImportError:
            logger.warning("wandb is not installed; WandbLogger is a no-op")
            self._wandb = None
            self.run = None

    def log_results(self, results: dict, samples: Optional[List[dict]] = None) -> None:
        if self._wandb is None:
            return
        flat: Dict[str, float] = {}
        for task, metrics in results.get("results", {}).items():
            for name, val in metrics.items():
                if isinstance(val, (int, float)):
                    flat[f"{task}/{name}"] = val
        for group, metrics in results.get("groups", {}).items():
            for name, val in metrics.items():
                if isinstance(val, (int, float)):
                    flat[f"group/{group}/{name}"] = val
        self.run.log(flat)
        if samples:
            table = self._wandb.Table(
                columns=sorted({k for s in samples for k in s}),
            )
            for s in samples:
                table.add_data(*[s.get(c) for c in table.columns])
            self.run.log({"samples": table})

    def finish(self) -> None:
        if self.run is not None:
            self.run.finish()


class ZenoLogger:
    """Zeno ML upload (reference: lm_eval/loggers/ — zeno visualizer)."""

    def __init__(self, project: str = "rag-eval", api_key: Optional[str] = None):
        try:
            from zeno_client import ZenoClient  # noqa: F401

            self._client = ZenoClient(api_key or os.environ.get("ZENO_API_KEY", ""))
            self.project = project
        except ImportError:
            logger.warning("zeno_client is not installed; ZenoLogger is a no-op")
            self._client = None

    def log_results(self, results: dict, samples: Optional[List[dict]] = None) -> None:
        if self._client is None:
            return
        import pandas as pd

        proj = self._client.create_project(name=self.project, view="text-classification")
        if samples:
            proj.upload_dataset(
                pd.DataFrame(samples), id_column="id", data_column="context"
            )


def build_loggers(spec: Optional[str]) -> List[object]:
    """'jsonl:path,wandb:project,zeno:project' -> logger instances."""
    out: List[object] = []
    if not spec:
        return out
    for part in spec.split(","):
        kind, _, arg = part.partition(":")
        kind = kind.strip()
        if kind == "jsonl":
            out.append(JsonlLogger(arg or "eval_results.jsonl"))
        elif kind == "wandb":
            out.append(WandbLogger(project=arg or "rag-eval"))
        elif kind == "zeno":
            out.append(ZenoLogger(project=arg or "rag-eval"))
        else:
            raise ValueError(f"unknown logger kind {kind!r}")
    return out
