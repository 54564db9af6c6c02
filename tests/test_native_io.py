import json
import os

import numpy as np
import pytest

from retrieval_scaling_tpu.data import native_io
from retrieval_scaling_tpu.data.passages import PassageStore, scan_jsonl_offsets


def _write_jsonl(path, n=200):
    with open(path, "w") as f:
        for i in range(n):
            f.write(json.dumps({"i": i, "pad": "x" * (i % 37)}) + "\n")


def test_native_scan_matches_python(tmp_path):
    path = str(tmp_path / "data.jsonl")
    _write_jsonl(path)
    # python reference
    offsets, pos = [], 0
    with open(path, "rb") as f:
        for line in f:
            offsets.append(pos)
            pos += len(line)
    native = native_io.scan_offsets_native(path)
    if native is None:
        pytest.skip("no compiler available")
    np.testing.assert_array_equal(native, np.asarray(offsets))


def test_native_pread_matches_lines(tmp_path):
    path = str(tmp_path / "data.jsonl")
    _write_jsonl(path, 100)
    offs = scan_jsonl_offsets(path)
    size = os.path.getsize(path)
    idxs = [0, 13, 99, 42]
    spans = [
        (int(offs[i]), int((offs[i + 1] if i + 1 < len(offs) else size) - offs[i]))
        for i in idxs
    ]
    blobs = native_io.pread_lines_native(path, spans)
    if blobs is None:
        pytest.skip("no native lib")
    assert [json.loads(b)["i"] for b in blobs] == idxs


def test_passage_store_uses_batched_fetch(tmp_path):
    path = str(tmp_path / "raw_passages-0-of-1.jsonl")
    with open(path, "w") as f:
        for i in range(50):
            f.write(json.dumps({"text": f"t{i}", "id": i}) + "\n")
    store = PassageStore.from_passages_dir(str(tmp_path))
    got = store.fetch_many([(0, 5), (0, 49), (0, 0), (0, 5)])
    assert [g["id"] for g in got] == [5, 49, 0, 5]
