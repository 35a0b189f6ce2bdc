"""Scanner registry (scanner/scanner.go:13-17 analog) + Viper-style
config (main.go:23-38 analog)."""

import json

import pyarrow as pa
import pytest

from don_crawler_ray.config import ConfigError, load_config
from don_crawler_ray.registry import (
    HtmlScanner,
    Scanner,
    get_scanner,
    register_scanner,
    registered_scanners,
    scanner_for_host,
)


class UpperScanner:
    """Toy platform plug-in: claims *.upper.example and uppercases."""

    name = "upper"

    def matches_host(self, host: str) -> bool:
        return host.endswith(".upper.example")

    def extract(self, batch: pa.Table) -> pa.Table:
        texts = [h.decode("utf-8").upper() for h in batch.column("html").to_pylist()]
        out = batch.drop_columns(["html"])
        out = out.append_column("text", pa.array(texts, pa.string()))
        out = out.append_column("description", pa.array(texts, pa.string()))
        out = out.append_column("text_len", pa.array([len(t) for t in texts], pa.int64()))
        return out


class TestRegistry:
    def test_default_registered(self):
        assert "html" in registered_scanners()
        assert isinstance(get_scanner("html"), HtmlScanner)
        assert isinstance(get_scanner("html"), Scanner)  # protocol check

    def test_unknown_name(self):
        with pytest.raises(KeyError, match="no scanner named"):
            get_scanner("nope")

    def test_register_and_dispatch(self):
        register_scanner("upper", UpperScanner)
        try:
            assert isinstance(UpperScanner(), Scanner)
            s = scanner_for_host("x.upper.example")
            assert s.name == "upper"
            assert scanner_for_host("other.example").name == "html"
        finally:
            from don_crawler_ray import registry

            registry._REGISTRY.pop("upper", None)

    def test_extract_actor_uses_registered_scanner(self, ray_session):
        from don_crawler_ray.stages.fetch import ExtractActor

        register_scanner("upper", UpperScanner)
        try:
            actor = ExtractActor(scanner="upper")
            batch = pa.table({"html": pa.array([b"abc"], pa.binary())})
            out = actor(batch)
            assert out.column("text").to_pylist() == ["ABC"]
        finally:
            from don_crawler_ray import registry

            registry._REGISTRY.pop("upper", None)


class TestConfig:
    def test_defaults(self, tmp_path):
        cfg = load_config(str(tmp_path), env={})
        assert cfg["DATADIR"] == "./data"
        assert cfg["ACTIVITY_DAYS"] == 60

    def test_config_file_overrides_default(self, tmp_path):
        (tmp_path / "config.json").write_text(json.dumps({"datadir": "/from/file"}))
        cfg = load_config(str(tmp_path), env={})
        assert cfg["DATADIR"] == "/from/file"

    def test_env_overrides_file(self, tmp_path):
        (tmp_path / "config.json").write_text(json.dumps({"DATADIR": "/from/file"}))
        cfg = load_config(str(tmp_path), env={"DATADIR": "/from/env", "ACTIVITY_DAYS": "90"})
        assert cfg["DATADIR"] == "/from/env"
        assert cfg["ACTIVITY_DAYS"] == 90  # coerced to int

    def test_yaml_config(self, tmp_path):
        (tmp_path / "config.yaml").write_text("activity_days: 14\n")
        cfg = load_config(str(tmp_path), env={})
        assert cfg["ACTIVITY_DAYS"] == 14

    def test_malformed_file_raises(self, tmp_path):
        (tmp_path / "config.json").write_text("{not json")
        with pytest.raises(ConfigError):
            load_config(str(tmp_path), env={})

    def test_bad_int_raises(self, tmp_path):
        with pytest.raises(ConfigError, match="ACTIVITY_DAYS"):
            load_config(str(tmp_path), env={"ACTIVITY_DAYS": "soon"})
