import os

import pytest

from retrieval_scaling_tpu.config import (
    Config,
    MissingMandatoryValue,
    config_from_dict,
    load_config,
)


def test_basic_access_and_interpolation():
    cfg = config_from_dict(
        {
            "a": {"b": 3, "c": "${a.b}", "d": "x-${a.b}-y"},
            "lst": [1, 2, "${a.b}"],
        }
    )
    assert cfg.a.b == 3
    assert cfg.a.c == 3  # full-string interpolation preserves type
    assert cfg.a.d == "x-3-y"
    assert cfg.lst[2] == 3


def test_missing_value_raises_on_access_only():
    cfg = config_from_dict({"x": "???", "y": 1})
    assert cfg.y == 1
    with pytest.raises(MissingMandatoryValue):
        _ = cfg.x
    assert cfg.get("x", "fallback") == "fallback"


def test_dotlist_overrides_parse_yaml_values():
    cfg = config_from_dict({"a": {"b": 1}, "ids": [0]})
    cfg.merge_overrides(["a.b=7", "ids=[[0],[1,2]]", "a.new=null", "a.s=hello"])
    assert cfg.a.b == 7
    assert cfg.ids == [[0], [1, 2]]
    assert cfg.a.new is None
    assert cfg.a.s == "hello"


def test_override_propagates_into_interpolation():
    cfg = config_from_dict({"root": "base", "path": "${root}/out"})
    cfg.merge_overrides(["root=/tmp/x"])
    assert cfg.path == "/tmp/x/out"


def test_load_default_and_example_configs():
    cfg = load_config("default", overrides=["datastore.domain=wiki", "evaluation.domain=c4"])
    assert cfg.datastore.embedding.chunk_size == 256
    assert "wiki" in cfg.datastore.embedding.passages_dir
    # eval_output_dir interpolates across sections
    assert "top_1000" in cfg.evaluation.eval_output_dir

    ex = load_config("example_config")
    assert ex.tasks.datastore.embedding is True
    assert ex.datastore.domain == "fineweb_edu_1m"
    assert ex.evaluation.concate_k == 3
    # inherited from default via base:
    assert ex.datastore.index.index_type == "Flat"


def test_multiply_resolver():
    cfg = config_from_dict({"n": 4, "m": "${multiply:n,2}"})
    assert cfg.m == 8.0


def test_env_overrides(monkeypatch):
    from retrieval_scaling_tpu.config import config_from_env

    cfg = config_from_dict({"a": {"b": 1}})
    monkeypatch.setenv("RST_OVERRIDE_A__B", "9")
    config_from_env(cfg)
    assert cfg.a.b == 9


def test_to_dict_resolve():
    cfg = config_from_dict({"a": 2, "b": "${a}"})
    d = cfg.to_dict(resolve=True)
    assert d == {"a": 2, "b": 2}


def test_per_gpu_batch_size_interop(tmp_path):
    """Reference configs/overrides spell batch sizes per-GPU
    (ric/conf/default.yaml per_gpu_batch_size); both the YAML key and the
    dotlist override map to per_device_batch_size here."""
    from retrieval_scaling_tpu.config import load_config

    p = tmp_path / "ref_style.yaml"
    p.write_text(
        "datastore:\n  embedding:\n    per_gpu_batch_size: 123\n"
    )
    cfg = load_config(str(p))
    assert cfg.datastore.embedding.per_device_batch_size == 123

    cfg.merge_overrides(["evaluation.search.per_gpu_batch_size=77"])
    assert cfg.evaluation.search.per_device_batch_size == 77


def test_per_gpu_batch_size_does_not_clobber_canonical(tmp_path):
    from retrieval_scaling_tpu.config import load_config

    p = tmp_path / "both.yaml"
    p.write_text(
        "datastore:\n  embedding:\n"
        "    per_device_batch_size: 64\n"
        "    per_gpu_batch_size: 8\n"
    )
    cfg = load_config(str(p))
    assert cfg.datastore.embedding.per_device_batch_size == 64
