from .connector import ConnectorConfig, ConfigError, interpolate_env
from .registry import Registry
from .turtle_loader import load_turtle_config

__all__ = [
    "ConnectorConfig",
    "ConfigError",
    "interpolate_env",
    "Registry",
    "load_turtle_config",
]
