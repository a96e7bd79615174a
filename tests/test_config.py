"""Core config-system tests: Lazy resolution, REQUIRED, suffix override,
YAML round-trip — the HDict capability set (reference hyperdict.py)."""
import pytest

from tgt_tpu.core.config import (Config, ConfigError, Lazy, REQUIRED,
                                 load_yaml, parse_cli_overrides, save_yaml)


class TestConfig:
    def test_lazy_cross_key_defaults(self):
        c = Config(model_name="m", path=Lazy(lambda c: f"models/{c.model_name}"))
        assert c.path == "models/m"
        c.model_name = "other"
        assert c.path == "models/other"   # lazy re-evaluates

    def test_required_raises_until_set(self):
        c = Config(x=REQUIRED)
        with pytest.raises(ConfigError):
            _ = c.x
        c.x = 5
        assert c.x == 5

    def test_strict_override_unknown_key(self):
        c = Config(a=1)
        with pytest.raises(ConfigError):
            c.override({"nope": 2})

    def test_dotted_suffix_matching(self):
        c = Config(**{"opt.lr": 1e-3, "model.opt.lr": 2e-3})
        c.override({"opt.lr": 5e-4})     # exact key wins
        assert c["opt.lr"] == 5e-4
        assert c["model.opt.lr"] == 2e-3
        c2 = Config(**{"model.opt.lr": 2e-3})
        c2.override({"opt.lr": 9e-4})    # suffix match
        assert c2["model.opt.lr"] == 9e-4

    def test_resolve_snapshot(self):
        c = Config(a=1, b=Lazy(lambda c: c.a + 1))
        ns = c.resolve()
        assert ns.b == 2

    def test_yaml_roundtrip(self, tmp_path):
        p = tmp_path / "c.yaml"
        save_yaml({"a": 1, "s": "multi\nline"}, str(p))
        back = load_yaml(str(p))
        assert back == {"a": 1, "s": "multi\nline"}

    def test_cli_override_parsing(self):
        d = parse_cli_overrides(["batch_size: 8", 'predict_on: ["val"]'])
        assert d == {"batch_size": 8, "predict_on": ["val"]}
        with pytest.raises(ValueError):
            parse_cli_overrides(["not a mapping"])
