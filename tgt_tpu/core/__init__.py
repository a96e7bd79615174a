from tgt_tpu.core.graph import Graph, additive_mask_from_node_mask, MASK_VALUE
from tgt_tpu.core.config import Config, Lazy, REQUIRED, ConfigError, load_yaml, save_yaml

__all__ = [
    "Graph", "additive_mask_from_node_mask", "MASK_VALUE",
    "Config", "Lazy", "REQUIRED", "ConfigError", "load_yaml", "save_yaml",
]
