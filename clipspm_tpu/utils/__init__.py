"""Config, logging, and metric utilities."""

from .config import (ConfigNode, apply_opts, finalize_config, load_config,
                     load_yaml, merge_into_base, SPM_DEFAULT_PARAMS)

__all__ = [
    "ConfigNode", "load_config", "load_yaml", "merge_into_base",
    "apply_opts", "finalize_config", "SPM_DEFAULT_PARAMS",
]
