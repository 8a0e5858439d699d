"""Config-system tests (reference: tests/train/test_config.py:39-127)."""

from dataclasses import dataclass
from typing import Any

import pytest

from tfimm_tpu.train.config import (
    deep_to_flat,
    dump_config,
    flat_to_deep,
    parse_args,
    to_dict_format,
)
from tfimm_tpu.train.registry import cfg_serializable


@dataclass
class InnerConfig:
    units: int = 4
    name: str = "inner"


@cfg_serializable
class Inner:
    cfg_class = InnerConfig

    def __init__(self, cfg):
        self.cfg = cfg


@dataclass
class OuterConfig:
    inner: Any = None
    inner_class: str = ""
    lr: float = 0.1
    flag: bool = False
    shape: tuple = (1, 2)


def test_flat_deep_roundtrip():
    cfg = {"a": {"b": 1, "c": 2}, "d": 3}
    flat = deep_to_flat(cfg)
    assert flat == {"a.b": 1, "a.c": 2, "d": 3}
    assert flat_to_deep(flat) == cfg


def test_parse_nested_class_from_cli():
    cfg = parse_args({}, cfg_class=OuterConfig,
                     args=["--inner_class=Inner", "--inner.units=7",
                           "--lr=0.5"])
    assert isinstance(cfg, OuterConfig)
    assert cfg.inner_class == "Inner"
    assert cfg.inner.units == 7
    assert cfg.inner.name == "inner"  # default preserved
    assert cfg.lr == 0.5


def test_parse_empty_nesting():
    cfg = parse_args({}, cfg_class=OuterConfig, args=["--lr=0.2"])
    assert cfg.inner is None
    assert cfg.inner_class == ""


def test_bool_and_tuple_parsing():
    cfg = parse_args({}, cfg_class=OuterConfig,
                     args=["--flag=true", "--shape=(3,4)"])
    assert cfg.flag is True
    assert cfg.shape == (3, 4)


def test_unknown_arg_raises():
    with pytest.raises(ValueError):
        parse_args({}, cfg_class=OuterConfig, args=["--bogus=1"])


def test_yaml_roundtrip(tmp_path):
    @dataclass
    class FileConfig:
        inner: Any = None
        inner_class: str = ""
        lr: float = 0.1
        cfg_file: str = ""

    cfg = FileConfig(inner=InnerConfig(units=9), inner_class="Inner", lr=0.3)
    path = tmp_path / "cfg.yaml"
    dump_config(cfg, str(path))

    loaded = parse_args({}, cfg_class=FileConfig,
                        args=[f"--cfg_file={path}"])
    assert loaded.inner.units == 9
    assert loaded.lr == 0.3
    # CLI overrides YAML
    loaded = parse_args({}, cfg_class=FileConfig,
                        args=[f"--cfg_file={path}", "--inner.units=11"])
    assert loaded.inner.units == 11


def test_to_dict_format():
    cfg = OuterConfig(inner=InnerConfig(), inner_class="Inner")
    d = to_dict_format(cfg)
    assert d["inner"]["units"] == 4
    assert isinstance(d["inner"], dict)


def test_grain_dataset():
    import numpy as np

    from tfimm_tpu.train.datasets import GrainDataset, GrainDatasetConfig

    rng = np.random.default_rng(0)
    source = [(rng.uniform(size=(8, 8, 3)).astype("float32"), i % 3)
              for i in range(20)]
    ds = GrainDataset(GrainDatasetConfig(batch_size=4), source=source)
    batches = list(ds)
    assert len(batches) == 5
    assert batches[0][0].shape == (4, 8, 8, 3)
    assert batches[0][1].shape == (4,)
