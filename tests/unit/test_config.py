"""Config system: TOML loading, overrides, acceptance configs parse."""
import glob
import os

import pytest

from oc_nbody_tpu.config import SimConfig, apply_overrides, load_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "configs")


def test_all_acceptance_configs_parse():
    paths = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.toml")))
    assert len(paths) >= 5  # the five BASELINE.json:6-12 configs
    for p in paths:
        cfg = load_config(p)
        assert cfg.ic.n >= 2
        assert cfg.output.t_end > 0


def test_overrides():
    cfg = SimConfig()
    apply_overrides(cfg, ["integrator.eta=0.05", "ic.n=777",
                          "output.out_dir=/tmp/x", "integrator.quantize=true"])
    assert cfg.integrator.eta == 0.05
    assert cfg.ic.n == 777
    assert cfg.output.out_dir == "/tmp/x"
    assert cfg.integrator.quantize is True


def test_unknown_key_rejected():
    cfg = SimConfig()
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["integrator.nope=1"])
    with pytest.raises(KeyError):
        SimConfig.from_dict({"integrator": {"nope": 1}})


def test_json_round_trip():
    import json
    cfg = load_config(os.path.join(CONFIG_DIR, "c1_plummer_1k.toml"))
    cfg2 = SimConfig.from_dict(json.loads(cfg.to_json()))
    assert cfg2.to_json() == cfg.to_json()


def test_type_coercion():
    cfg = SimConfig.from_dict({"ic": {"n": "2048"}, "integrator": {"dt": "0.01"}})
    assert cfg.ic.n == 2048 and isinstance(cfg.ic.n, int)
    assert cfg.integrator.dt == 0.01


def test_include_presets(tmp_path):
    """Top-level ``include`` layers base presets under the including file
    (deep merge, includer wins; relative to the including file)."""
    base = tmp_path / "base.toml"
    base.write_text('[ic]\nn = 4096\nkind = "king"\nw0 = 5.0\n'
                    '[integrator]\neta = 0.03\n')
    run = tmp_path / "run.toml"
    run.write_text('include = "base.toml"\n[ic]\nn = 128\n')
    cfg = load_config(str(run))
    assert cfg.ic.n == 128            # includer wins
    assert cfg.ic.kind == "king"      # inherited
    assert cfg.ic.w0 == 5.0
    assert cfg.integrator.eta == 0.03


def test_include_chain_and_cycle(tmp_path):
    a = tmp_path / "a.toml"
    b = tmp_path / "b.toml"
    c = tmp_path / "c.toml"
    a.write_text('include = "b.toml"\n[ic]\nn = 1\n')
    b.write_text('include = "c.toml"\n[ic]\nkind = "king"\n')
    c.write_text('[integrator]\ndt = 0.5\n')
    cfg = load_config(str(a))
    assert cfg.ic.n == 1 and cfg.ic.kind == "king"
    assert cfg.integrator.dt == 0.5
    # cycle
    c.write_text('include = "a.toml"\n')
    with pytest.raises(ValueError, match="cycle"):
        load_config(str(a))
