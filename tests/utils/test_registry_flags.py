"""Tests for the registry + flag system (parity behaviors from
/root/reference/neurst/utils/{registry,flags_core,configurable}.py)."""

import os

import pytest
import yaml

from neurst_tpu.utils import flags_core
from neurst_tpu.utils.configurable import (ModelConfigs, deep_merge_dict,
                                           load_from_config_path)
from neurst_tpu.utils.flags_core import Flag, ModuleFlag, parse_flags
from neurst_tpu.utils.registry import camel_to_snake, setup_registry


class _Base:
    def __init__(self, args):
        self.args = args


def test_register_and_alias():
    build, register = setup_registry("toy_registry", base_class=_Base)

    @register
    class MyToyComponent(_Base):
        @staticmethod
        def class_or_method_args():
            return [Flag("alpha", dtype=Flag.TYPE.FLOAT, default=0.5)]

    # class name, snake alias, case-insensitive
    obj = build("MyToyComponent")
    assert isinstance(obj, MyToyComponent)
    obj = build("my_toy_component")
    assert isinstance(obj, MyToyComponent)
    # defaults filled from class flags
    assert obj.args["alpha"] == 0.5

    obj = build({"toy_registry.class": "my_toy_component",
                 "toy_registry.params": {"alpha": 1.25}})
    assert obj.args["alpha"] == 1.25


def test_register_with_explicit_alias_and_conflict():
    build, register = setup_registry("toy_registry2", base_class=_Base)

    @register("nice_name")
    class Comp(_Base):
        pass

    assert isinstance(build("nice_name"), Comp)

    with pytest.raises(LookupError):
        @register("nice_name")
        class Other(_Base):
            pass


def test_camel_to_snake():
    assert camel_to_snake("TransformerEncoder") == "transformer_encoder"
    assert camel_to_snake("BLEUMetric") == "bleu_metric"
    assert camel_to_snake("GPT2") == "gpt2"


def test_flag_parse_types_and_yaml_values():
    flags = [
        Flag("steps", dtype=Flag.TYPE.INTEGER, default=100),
        Flag("rate", dtype=Flag.TYPE.FLOAT, default=0.1),
        Flag("use_x", dtype=Flag.TYPE.BOOLEAN, default=False),
        Flag("name", dtype=Flag.TYPE.STRING, default=None),
        Flag("dims", dtype=Flag.TYPE.INTEGER, default=None, multiple=True),
    ]
    args = parse_flags(flags, ["--steps", "200", "--rate=0.5", "--use_x",
                               "--name", "hello", "--dims", "[1,2,3]"])
    assert args["steps"] == 200
    assert args["rate"] == 0.5
    assert args["use_x"] is True
    assert args["name"] == "hello"
    assert args["dims"] == [1, 2, 3]


def test_module_flag_recursive_parse():
    build, register = setup_registry("widget", base_class=_Base)

    @register
    class BlueWidget(_Base):
        @staticmethod
        def class_or_method_args():
            return [Flag("size", dtype=Flag.TYPE.INTEGER, default=3),
                    Flag("color", dtype=Flag.TYPE.STRING, default="blue")]

    flags = [ModuleFlag("widget", help="the widget")]
    args = parse_flags(flags, ["--widget", "blue_widget", "--size", "7"])
    assert args["widget.class"] == "blue_widget"
    assert args["widget.params"]["size"] == 7
    assert args["widget.params"]["color"] == "blue"
    # and building works end-to-end
    obj = build(args)
    assert isinstance(obj, BlueWidget)
    assert obj.args["size"] == 7


def test_module_flag_cli_overrides_config():
    _, register = setup_registry("gadget", base_class=_Base)

    @register
    class G(_Base):
        @staticmethod
        def class_or_method_args():
            return [Flag("n", dtype=Flag.TYPE.INTEGER, default=1)]

    flags = [ModuleFlag("gadget")]
    existing = {"gadget.class": "g", "gadget.params": {"n": 5}}
    args = parse_flags(flags, ["--n", "9"], existing=existing)
    assert args["gadget.params"]["n"] == 9
    args = parse_flags(flags, [], existing=existing)
    assert args["gadget.params"]["n"] == 5


def test_deep_merge_and_config_files(tmp_path):
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    update = {"a": {"b": 10}, "e": 4}
    merged = deep_merge_dict(base, update, local_overwrite=False)
    assert merged == {"a": {"b": 10, "c": 2}, "d": 3, "e": 4}
    assert base["a"]["b"] == 1  # no mutation

    p1 = tmp_path / "c1.yml"
    p2 = tmp_path / "c2.yml"
    p1.write_text(yaml.safe_dump({"model": {"dim": 8}, "entry": "train"}))
    p2.write_text(yaml.safe_dump({"model": {"layers": 2}}))
    cfg = load_from_config_path([str(p1), str(p2)])
    assert cfg == {"model": {"dim": 8, "layers": 2}, "entry": "train"}


def test_model_configs_roundtrip(tmp_path):
    cfg = {"model.class": "transformer", "model.params": {"d": 8},
           "task.class": "seq2seq"}
    ModelConfigs.dump(cfg, str(tmp_path))
    assert ModelConfigs.exists(str(tmp_path))
    loaded = ModelConfigs.load(str(tmp_path))
    assert loaded == cfg
