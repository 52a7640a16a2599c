"""Tests for the minigin config subsystem (L5)."""
import pytest

from neural_waveshaping_synthesis_tpu import minigin


@pytest.fixture(autouse=True)
def clean_config():
    minigin.clear_config()
    yield
    minigin.clear_config()


def test_basic_binding():
    @minigin.configurable
    def fn(a=1, b=2):
        return a + b

    minigin.parse_config("fn.a = 10")
    assert fn() == 12
    assert fn(a=1) == 3  # call site wins


def test_macros_and_arithmetic():
    @minigin.configurable(name="g")
    def g(x=0):
        return x

    minigin.parse_config("rate = 16000\ng.x = %rate")
    assert g() == 16000
    minigin.parse_config("g.x = 2 * %rate")
    assert g() == 32000


def test_reference_injection():
    @minigin.configurable
    def target():
        return "hi"

    @minigin.configurable
    def user(fn=None):
        return fn

    minigin.parse_config("user.fn = @target")
    assert user()() == "hi"


def test_scoped_bindings():
    @minigin.configurable
    def scoped_fn(v=0):
        return v

    minigin.parse_config("scoped_fn.v = 1\nmyscope/scoped_fn.v = 2")
    assert scoped_fn() == 1
    with minigin.config_scope("myscope"):
        assert scoped_fn() == 2


def test_dataclass_configurable():
    from neural_waveshaping_synthesis_tpu.models import NEWT

    minigin.parse_config("NEWT.shaping_fn_size = 16")
    assert NEWT().shaping_fn_size == 16
    assert NEWT(shaping_fn_size=8).shaping_fn_size == 8


def test_parse_shipped_model_gin():
    """The shipped gin files parse and configure a full model matching
    the reference hyperparameters."""
    from neural_waveshaping_synthesis_tpu.models import NeuralWaveshaping

    minigin.parse_config_file("gin/models/newt.gin")
    model = NeuralWaveshaping()
    assert model.n_waveshapers == 64
    assert model.control_hop == 128
    assert model.osc.n_harmonics == 101
    assert model.newt.shaping_fn_size == 8
    assert model.noise_mlp.out_size == 129
    assert model.noise_mlp.depth == 4
    assert model.noise_synth.ir_length == 256
    assert model.reverb.length_in_seconds == 2


def test_parse_train_gin_includes_model():
    minigin.parse_config_file("gin/train/train_newt.gin")
    assert minigin.query_parameter("NEWT.n_waveshapers") == 64
    assert minigin.query_parameter("TrainConfig.max_steps") == 120000


def test_operative_config_str():
    minigin.parse_config("a = 1\nFoo.bar = 2")
    dump = minigin.operative_config_str()
    assert "a = 1" in dump and "Foo.bar = 2" in dump


def test_validate_config_flags_unknown_configurable():
    minigin.clear_config()
    minigin.parse_config("definitely_not_registered.param = 1")
    problems = minigin.validate_config()
    assert len(problems) == 1 and "definitely_not_registered" in problems[0]
    with pytest.raises(minigin.ConfigError):
        minigin.validate_config(strict=True)
    minigin.clear_config()


def test_validate_config_flags_unknown_parameter():
    minigin.clear_config()
    minigin.parse_config("NeuralWaveshaping.not_a_field = 3")
    problems = minigin.validate_config()
    assert len(problems) == 1 and "not_a_field" in problems[0]
    minigin.clear_config()


def test_validate_config_accepts_shipped_gin_files():
    """Every binding in the shipped config files must resolve — the
    validator guards users' configs, not ours."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # importing registers every configurable the gin files reference
    import neural_waveshaping_synthesis_tpu.data.preprocess  # noqa: F401
    import neural_waveshaping_synthesis_tpu.training  # noqa: F401

    for f in ("gin/models/newt.gin", "gin/train/train_newt.gin",
              "gin/data/urmp_4second_crepe.gin"):
        minigin.clear_config()
        minigin.parse_config_file(os.path.join(repo, f))
        problems = [
            p for p in minigin.validate_config()
            # train.gin wires the model class into scripts/train.py's
            # get_model, which only registers when that CLI runs
            if "get_model" not in p
        ]
        assert problems == [], (f, problems)
    minigin.clear_config()
