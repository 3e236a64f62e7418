from .config import Config, dump_cfg, load_yaml_config, finalize
from .defaults import default_config

__all__ = ["Config", "dump_cfg", "load_yaml_config", "finalize",
           "default_config", "make_cfg"]


def make_cfg(cfg_file: str, opts=None):
    """Load defaults → parent chain → cfg_file → CLI opts, then finalize."""
    cfg = load_yaml_config(cfg_file, defaults=default_config(), opts=list(opts or []))
    return finalize(cfg)
