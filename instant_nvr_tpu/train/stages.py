"""Training-stage schedule as derived config views.

The reference mutates the global cfg per epoch (``train_net.py:64-75``:
``cfg.ratio``, ``cfg.sample_focus``, ``cfg.reg_dist_weight`` from
``training_stages`` entries with ``_start`` epochs).  Here the same YAML
surface produces an immutable per-epoch view via ``Config.replace``.
"""
from __future__ import annotations

from ..config import Config


def stage_for_epoch(cfg: Config, epoch: int) -> Config:
    """Return the config view active at ``epoch``."""
    stages = cfg.get("training_stages", []) or []
    active = {}
    for stage in stages:
        d = stage.to_dict() if isinstance(stage, Config) else dict(stage)
        if epoch >= d.get("_start", 0):
            active.update({k: v for k, v in d.items() if k != "_start"})
    return cfg.replace(**active) if active else cfg
