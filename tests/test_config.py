import os
import textwrap

import pytest

from instant_nvr_tpu.config import Config, default_config, load_yaml_config, make_cfg


def test_attribute_access_and_nesting():
    cfg = Config({"a": 1, "b": {"c": [1, 2], "d": "x"}})
    assert cfg.a == 1
    assert cfg.b.c == [1, 2]
    assert cfg.b.d == "x"
    assert "a" in cfg and "z" not in cfg


def test_immutability():
    cfg = Config({"a": 1})
    with pytest.raises(AttributeError):
        cfg.a = 2
    with pytest.raises(TypeError):
        cfg["a"] = 2


def test_replace_and_merge():
    cfg = Config({"a": 1, "b": {"c": 2}})
    cfg2 = cfg.replace(a=5)
    assert cfg2.a == 5 and cfg.a == 1
    cfg3 = cfg.merged({"b": {"c": 9, "new": 1}, "unknown_key": True})
    assert cfg3.b.c == 9 and cfg3.b.new == 1 and cfg3.unknown_key is True
    assert cfg.b.c == 2  # original untouched


def test_cli_overrides():
    cfg = Config({"train": {"lr": 1e-4}, "gpus": [0]})
    cfg2 = cfg.with_overrides(["train.lr", "5e-4", "gpus", "[0,1]", "exp_name", "foo"])
    assert cfg2.train.lr == 5e-4
    assert cfg2.gpus == [0, 1]
    assert cfg2.exp_name == "foo"


def test_yaml_parent_inheritance(tmp_path):
    parent = tmp_path / "parent.yaml"
    parent.write_text(textwrap.dedent("""
        task: inb
        ratio: 0.5
        train:
          lr: 5e-4
    """))
    child = tmp_path / "child.yaml"
    child.write_text(textwrap.dedent(f"""
        parent_cfg: {parent}
        ratio: 1.0
        exp_name: child
    """))
    cfg = load_yaml_config(str(child))
    assert cfg.ratio == 1.0          # child overrides parent
    assert cfg.train.lr == 5e-4      # inherited
    assert cfg.exp_name == "child"


def test_make_cfg_finalizes(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text("task: inb\nexp_name: t1\nnum_train_frame: 100\nratio: 0.5\n")
    cfg = make_cfg(str(f))
    assert cfg.num_latent_code == 100
    assert cfg.eval_ratio == 0.5
    assert cfg.result_dir.endswith(os.path.join("inb", "t1"))
    # defaults came through
    assert cfg.N_samples == 64
    assert cfg.ps == [1, 19349663, 83492791]


def test_reference_yaml_ports(tmp_path):
    """The ported inb_377-style YAML should load against our defaults."""
    repo_cfg = os.path.join(os.path.dirname(__file__), "..", "configs", "inb", "inb_377.yaml")
    if not os.path.exists(repo_cfg):
        pytest.skip("configs/inb/inb_377.yaml not yet written")
    cfg = make_cfg(repo_cfg)
    assert cfg.N_rand == 1024
    assert cfg.partnet.body.embedder.kwargs.n_levels == 16
