import os.path as osp

import pytest

from ieee_tpu.config import (
    engine_run_kwargs,
    get_default_config,
    imagedata_kwargs,
    lr_scheduler_kwargs,
    optimizer_kwargs,
)

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def test_defaults():
    cfg = get_default_config()
    assert cfg.model.name == "resnet50"
    assert cfg.train.batch_size == 32
    assert cfg.loss.softmax.label_smooth is True
    assert cfg.tpu.mesh_axes == ["data"]


def test_yaml_overlay_reference_config():
    cfg = get_default_config()
    cfg.merge_from_file(osp.join(REPO, "configs", "rgbnt_ieee_part_margin.yaml"))
    assert cfg.model.name == "ieee3modalPart"
    assert cfg.loss.name == "margin"
    assert cfg.loss.ieee_margin == 1
    assert cfg.train.batch_size == 8
    assert cfg.train.stepsize == [20, 40]
    assert cfg.sampler.train_sampler == "RandomIdentitySampler"
    assert cfg.test.eval_freq == 6


def test_dotlist_merge():
    cfg = get_default_config()
    cfg.merge_from_list(["train.lr", "0.01", "model.name", "resnet50_fc512"])
    assert cfg.train.lr == 0.01
    assert cfg.model.name == "resnet50_fc512"


def test_unknown_key_rejected():
    cfg = get_default_config()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["train.nonexistent", "1"])


def test_type_checking():
    cfg = get_default_config()
    with pytest.raises(TypeError):
        cfg.merge_from_list(["train.batch_size", "notanint"])


def test_kwargs_adapters():
    cfg = get_default_config()
    ik = imagedata_kwargs(cfg)
    assert ik["batch_size_train"] == 32
    ok = optimizer_kwargs(cfg)
    assert ok["optim"] == "adam"
    lk = lr_scheduler_kwargs(cfg)
    assert lk["lr_scheduler"] == "single_step"
    ek = engine_run_kwargs(cfg)
    assert ek["eval_freq"] == -1


def test_all_shipped_configs_load():
    import glob

    for path in glob.glob(osp.join(REPO, "configs", "*.yaml")):
        cfg = get_default_config()
        cfg.merge_from_file(path)
        assert cfg.model.name


def test_ieee_ablation_flags_in_config():
    cfg = get_default_config()
    cfg.merge_from_file(osp.join(REPO, "configs", "rgbnt_base_softmax.yaml"))
    assert cfg.model.interaction is False
    assert cfg.model.using_REM is False
    cfg2 = get_default_config()
    cfg2.merge_from_file(osp.join(REPO, "configs", "rgbnt_cim_softmax.yaml"))
    assert cfg2.model.interaction is True
    assert cfg2.model.using_REM is False


def test_cli_scientific_notation_floats():
    """'train.lr 3e-4'-style overrides must work: PyYAML leaves such
    strings unparsed and yacs accepted them via literal_eval."""
    from ieee_tpu.config import get_default_config

    cfg = get_default_config()
    cfg.merge_from_list(["train.lr", "3e-4", "train.weight_decay", "1E-5"])
    assert cfg.train.lr == 3e-4
    assert cfg.train.weight_decay == 1e-5


def test_bool_knobs_accept_strings():
    """bool-defaulted knobs take truthy/falsey words, and anything else
    stays a string — the bool|str union data.decode_cache documents
    (False | True | cache directory path)."""
    from ieee_tpu.config import get_default_config

    cfg = get_default_config()
    cfg.merge_from_list(["data.decode_cache", "/data/cache"])
    assert cfg.data.decode_cache == "/data/cache"
    cfg.merge_from_list(["data.decode_cache", "true"])
    assert cfg.data.decode_cache is True
    cfg.merge_from_list(["data.decode_cache", "false"])
    assert cfg.data.decode_cache is False
    # the union is DECLARED per-knob: every other bool knob still rejects
    # arbitrary strings (a YAML typo like donate: "ture" must not silently
    # become truthy), and str knobs reject YAML bools at merge time
    import pytest

    with pytest.raises(TypeError):
        cfg.merge_from_list(["tpu.donate", "ture"])
    with pytest.raises(TypeError):
        cfg.merge_from_list(["model.name", "true"])


def test_kwargs_adapters_carry_seed():
    """cfg.train.seed rides into the datamanager kwargs (multi-host needs
    every process to share it; random_patch and samplers consume it)."""
    from ieee_tpu.config import (get_default_config, imagedata_kwargs,
                                 videodata_kwargs)

    cfg = get_default_config()
    cfg.train.seed = 7
    assert imagedata_kwargs(cfg)["seed"] == 7
    assert videodata_kwargs(cfg)["seed"] == 7
