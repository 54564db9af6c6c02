"""Exact-duplicate removal for eval jsonl files.

Reimplements the reference's ``utils/dedup_eval_data.py`` (exact-dict dedup
of evaluation rows, keeping first occurrence):

    python -m retrieval_scaling_tpu.utils.dedup_eval_data in.jsonl out.jsonl
"""

from __future__ import annotations

import argparse
import json
from typing import Iterable, List


def dedup_rows(rows: Iterable[dict]) -> List[dict]:
    """Keep the first occurrence of each exact row (order-insensitive keys)."""
    seen = set()
    out = []
    for row in rows:
        key = json.dumps(row, sort_keys=True)
        if key not in seen:
            seen.add(key)
            out.append(row)
    return out


def dedup_file(in_path: str, out_path: str) -> int:
    with open(in_path) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    kept = dedup_rows(rows)
    with open(out_path, "w") as f:
        for row in kept:
            f.write(json.dumps(row) + "\n")
    return len(rows) - len(kept)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input")
    parser.add_argument("output")
    args = parser.parse_args(argv)
    removed = dedup_file(args.input, args.output)
    print(f"removed {removed} duplicate rows -> {args.output}")


if __name__ == "__main__":
    main()
