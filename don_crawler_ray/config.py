"""Engine configuration — the Viper analog (``main.go:23-38``).

Precedence, matching ``viper.AutomaticEnv`` over ``config`` file over
``SetDefault``: environment variable > ``config.yaml``/``config.json``
in the working directory (missing file is fine, a malformed one is an
error — ``main.go:34-38``) > built-in default.

Reference defaults carried over: ``DATADIR`` (``/app/data`` there; a
writable ``./data`` here) and ``ACTIVITY_DAYS`` (60).
"""

from __future__ import annotations

import json
import os

DEFAULTS: dict[str, object] = {
    "DATADIR": "./data",
    "ACTIVITY_DAYS": 60,
    "LOG_FILE": "",
}


class ConfigError(ValueError):
    pass


def _load_config_file(config_dir: str) -> dict:
    for name in ("config.yaml", "config.yml"):
        path = os.path.join(config_dir, name)
        if os.path.exists(path):
            # import outside the try: a missing PyYAML surfaces as the
            # dependency error it is, not as a malformed-file error
            import yaml

            try:
                with open(path) as f:
                    loaded = yaml.safe_load(f) or {}
            except Exception as ex:
                raise ConfigError(f"error reading config file {path}: {ex}") from ex
            if not isinstance(loaded, dict):
                raise ConfigError(f"config file {path} must be a mapping")
            return {str(k).upper(): v for k, v in loaded.items()}
    path = os.path.join(config_dir, "config.json")
    if os.path.exists(path):
        try:
            with open(path) as f:
                loaded = json.load(f)
        except Exception as ex:
            raise ConfigError(f"error reading config file {path}: {ex}") from ex
        if not isinstance(loaded, dict):
            raise ConfigError(f"config file {path} must be a mapping")
        return {str(k).upper(): v for k, v in loaded.items()}
    return {}


def load_config(config_dir: str = ".", env: dict | None = None) -> dict:
    """Resolved configuration: env > config file > defaults. Integer
    defaults coerce their overrides (``ACTIVITY_DAYS=90`` from the
    environment arrives as ``int``)."""
    env = os.environ if env is None else env
    merged: dict[str, object] = dict(DEFAULTS)
    merged.update(_load_config_file(config_dir))
    for key in list(merged):
        if key in env:
            merged[key] = env[key]
    for key, default in DEFAULTS.items():
        if isinstance(default, int) and not isinstance(merged[key], int):
            try:
                merged[key] = int(merged[key])  # type: ignore[arg-type]
            except (TypeError, ValueError) as ex:
                raise ConfigError(f"{key} must be an integer, got {merged[key]!r}") from ex
    return merged


def get(key: str, config_dir: str = ".") -> object:
    return load_config(config_dir)[key]
