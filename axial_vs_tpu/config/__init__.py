from .node import ConfigNode
from .defaults import get_default_config

__all__ = ["ConfigNode", "get_default_config"]
