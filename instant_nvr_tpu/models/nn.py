"""Minimal functional NN primitives (pytree params, explicit apply).

No framework classes on the hot path: parameters are plain dicts of arrays so
they stack/vmap naturally across the part ("expert") axis and shard cleanly
under pjit.  Initialization matches torch ``nn.Linear`` defaults
(U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for both weight and bias) so our nets
start from the same distribution as the reference's MLPs
(``lib/networks/bw_deform/part_base_network.py:11-27``).
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def linear_init(key: jax.Array, d_in: int, d_out: int, dtype=jnp.float32) -> dict:
    kw, kb = jax.random.split(key)
    bound = 1.0 / (d_in ** 0.5)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (d_out,), dtype, -bound, bound),
    }


def linear_apply(p: dict, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    w, b = p["w"], p["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y + b.astype(y.dtype)


def mlp_init(key: jax.Array, d_in: int, d_out: int, d_hidden: int = 64,
             n_layers: int = 2, dtype=jnp.float32) -> List[dict]:
    """Layer list [in->h] + (n_layers-1) x [h->h] + [h->out].

    Mirrors the reference MLP constructor (part_base_network.py:16):
    n_layers counts hidden layers, softplus between all but the last.
    """
    dims = [d_in] + [d_hidden] * n_layers + [d_out]
    keys = jax.random.split(key, len(dims) - 1)
    return [linear_init(k, a, b, dtype) for k, a, b in zip(keys, dims[:-1], dims[1:])]


def mlp_apply(layers: Sequence[dict], x: jnp.ndarray,
              compute_dtype=None) -> jnp.ndarray:
    """Softplus between layers, linear output (part_base_network.py:19-24)."""
    for layer in layers[:-1]:
        x = jax.nn.softplus(linear_apply(layer, x, compute_dtype))
    return linear_apply(layers[-1], x, compute_dtype)


def linear_apply_stacked(p: dict, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """Batched linear over a stacked expert axis: x (P, N, Din) with
    w (P, Din, Dout) / b (P, Dout) -> (P, N, Dout).  One einsum replaces P
    separate matmuls (the per-part unroll was op-count-bound on TPU)."""
    w, b = p["w"], p["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.einsum("pnd,pdh->pnh", x, w,
                   preferred_element_type=jnp.float32)
    return y + b[:, None, :].astype(y.dtype)


def mlp_apply_stacked(layers: Sequence[dict], x: jnp.ndarray,
                      compute_dtype=None) -> jnp.ndarray:
    """Stacked-expert mlp_apply: softplus between layers, linear output."""
    for layer in layers[:-1]:
        x = jax.nn.softplus(linear_apply_stacked(layer, x, compute_dtype))
    return linear_apply_stacked(layers[-1], x, compute_dtype)


def kaiming_normal(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """torch ``nn.init.kaiming_normal_`` (fan_in, leaky_relu gain sqrt(2))."""
    fan_in = 1
    for d in shape[1:]:
        fan_in *= d
    std = (2.0 / fan_in) ** 0.5
    return std * jax.random.normal(key, shape, dtype)
