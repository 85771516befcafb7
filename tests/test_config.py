"""Config engine: composition, group reselect, overrides, interpolation,
run-dir templating, snapshots."""

import os

import pytest
import yaml

import e3d_tpu  # noqa: F401
from e3d_tpu.core import config as cfglib

CONFIG_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")


def test_compose_defaults():
    cfg = cfglib.compose(CONFIG_ROOT, "default", [])
    assert cfg.dataset.ds_type == "simcol"
    assert cfg.model.encoder == "vits"  # model: small
    assert cfg.trainer.max_epochs == 30
    assert cfg.trainer.accumulate_grad_batches == 4


def test_group_reselect_and_value_override():
    cfg = cfglib.compose(CONFIG_ROOT, "default", [
        "model=large", "dataset=c3vd", "model.encoder_lr=1e-5",
        "dataset.batch_size=6",
    ])
    assert cfg.model.encoder == "vitl"
    assert cfg.dataset.ds_type == "c3vd"
    assert cfg.model.encoder_lr == 1e-5
    assert cfg.dataset.batch_size == 6


def test_forced_add_and_unknown_key():
    cfg = cfglib.compose(CONFIG_ROOT, "default", ["++trainer.max_steps=5"])
    assert cfg.trainer.max_steps == 5
    with pytest.raises(KeyError):
        cfglib.compose(CONFIG_ROOT, "default", ["trainer.nonexistent=1"])


def test_run_dir_template_interpolation():
    cfg = cfglib.compose(CONFIG_ROOT, "default",
                         ["model=large", "dataset.batch_size=6"])
    run_dir = cfglib.run_dir(cfg, cfg.run_dir_template)
    assert "mvitl" in run_dir
    assert "b6" in run_dir
    assert "dsimcol" in run_dir


def test_interpolation_forward_reference():
    """A key interpolating one defined LATER in dict order must resolve
    through the chain (dict-order resolution handed out the raw
    '${...}' template); cycles raise instead of recursing forever."""
    import pytest

    cfg = {"run_dir": "${paths.out}",
           "paths": {"root": "/tmp/x", "out": "${paths.root}/exp"},
           "msg": "in ${paths.out} now"}
    cfglib._resolve_interpolations(cfg)
    assert cfg["run_dir"] == "/tmp/x/exp"
    assert cfg["paths"]["out"] == "/tmp/x/exp"
    assert cfg["msg"] == "in /tmp/x/exp now"

    cyc = {"a": "${b}", "b": "${a}"}
    with pytest.raises(ValueError, match="cycle"):
        cfglib._resolve_interpolations(cyc)


def test_snapshot_roundtrip(tmp_path):
    cfg = cfglib.compose(CONFIG_ROOT, "default", ["model=base"])
    cfglib.snapshot(cfg, str(tmp_path))
    loaded = yaml.safe_load((tmp_path / "config.yaml").read_text())
    assert loaded["model"]["encoder"] == "vitb"
    overrides = yaml.safe_load((tmp_path / "overrides.yaml").read_text())
    assert overrides == ["model=base"]


def test_yaml_typed_values():
    cfg = cfglib.compose(CONFIG_ROOT, "default", [
        "model.cycle_momentum=true", "model.div_factor=1e9",
        "trainer.devices=[0,1]",
    ])
    assert cfg.model.cycle_momentum is True
    assert cfg.model.div_factor == 1e9
    assert cfg.trainer.devices == [0, 1]


def test_pose_config_composes():
    cfg = cfglib.compose(CONFIG_ROOT, "pose_estimation/pose_estimation", [])
    assert cfg.model.in_channels == 8
    assert cfg.trainer.precision == "32-true"
    assert cfg.model.zeta == 15
