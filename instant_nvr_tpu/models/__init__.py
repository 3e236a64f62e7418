from . import nn, embedders, deformer, inb  # noqa: F401
from .inb import ModelSpec, build_model_spec, init_params, forward, resd_fn  # noqa: F401
