from .connector import ConnectorConfig, ConfigError, interpolate_env
from .registry import Registry

__all__ = ["ConnectorConfig", "ConfigError", "interpolate_env", "Registry"]
