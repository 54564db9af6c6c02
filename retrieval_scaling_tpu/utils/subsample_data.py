"""Raw-data subsampling + eval-data dedup.

``subsample_jsonl`` reproduces the reference's two-pass line subsampler
(reference: utils/subsample_data_new.py:9-42): per-line Bernoulli(p) keep
with a fixed seed, streaming (no full-file load). ``dedup_eval_data`` is
the exact-record dedup (reference: utils/dedup_eval_data.py).
"""

from __future__ import annotations

import json
import random
from typing import Optional


def subsample_jsonl(input_path: str, output_path: str, ratio: float, seed: int = 310) -> int:
    rng = random.Random(seed)
    kept = 0
    with open(input_path) as fin, open(output_path, "w") as fout:
        for line in fin:
            if line.strip() and rng.random() < ratio:
                fout.write(line if line.endswith("\n") else line + "\n")
                kept += 1
    return kept


def dedup_eval_data(input_path: str, output_path: str, key: Optional[str] = None) -> int:
    seen = set()
    kept = 0
    with open(input_path) as fin, open(output_path, "w") as fout:
        for line in fin:
            if not line.strip():
                continue
            record = json.loads(line)
            sig = record.get(key) if key else json.dumps(record, sort_keys=True)
            if sig in seen:
                continue
            seen.add(sig)
            fout.write(json.dumps(record) + "\n")
            kept += 1
    return kept
