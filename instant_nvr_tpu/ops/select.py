"""Fixed-budget selection: the static-shape replacement for ``nonzero``.

The reference culls ray samples with data-dependent gathers
(``inb_part_network_multiassign.py:137``: ``nonzero`` + gather, a forced
GPU<->CPU sync) and routes points to part networks the same way
(``TPoseHuman.forward:204-234``, five more syncs).  Under XLA everything must
be shape-static, so instead we:

  1. score every candidate (e.g. SMPL distance),
  2. ``top_k`` a *fixed budget* of the best candidates,
  3. compute densely on the budget, carrying a validity mask,
  4. scatter results back to the full set (invalid slots contribute zero).

When the true survivor count exceeds the budget the extra points are dropped
(farthest first) — benign here because dropped points are far from the body
surface and would composite to ~zero density anyway.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def topk_select(score: jnp.ndarray, budget: int, thresh: float
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of the ``budget`` smallest-score entries + validity mask.

    score: (N,).  Returns (idx (budget,), valid (budget,) bool) where
    ``valid[i] = score[idx[i]] < thresh``.
    """
    neg, idx = jax.lax.top_k(-score, budget)
    return idx, (-neg) < thresh


def _fixed_perm(n: int) -> jnp.ndarray:
    """Deterministic host-side permutation (compile-time constant)."""
    return jnp.asarray(np.random.default_rng(0).permutation(n), jnp.int32)


def partition_select(score: jnp.ndarray, budget: int, thresh: float
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sort-free :func:`topk_select`: cumsum-compaction instead of the
    bitonic sort ``lax.top_k`` lowers to.  NOTE measured end-to-end SLOWER
    than topk on the flagship step (78.3 vs 75.4 ms, round 3): the scatter
    that materializes the compaction outweighs the sort it avoids.  Kept as
    ``select_mode: partition`` for future devices where sorts dominate.

    Selects qualifying entries (``score < thresh``) in a FIXED random order,
    so when the qualifying count exceeds the budget the dropped points are a
    uniform random thinning — input-order compaction would drop whole
    trailing regions (whole rays go unsupervised; measured as a training
    stall on the overfit test), and topk's farthest-first needs the sort
    this op exists to avoid.  Identical selected SET to topk_select whenever
    the count fits the budget.
    """
    N = score.shape[0]
    perm = _fixed_perm(N)
    valid = (score < thresh)[perm]
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
    slot = jnp.where(valid & (pos < budget), pos, budget)
    idx = jnp.zeros((budget + 1,), jnp.int32).at[slot].set(perm,
                                                           mode="drop")[:budget]
    count = jnp.minimum(pos[-1] + 1, budget)
    return idx, jnp.arange(budget, dtype=jnp.int32) < count


def gather(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x (N, ...) -> (budget, ...)."""
    return x[idx]


def scatter_back(full_shape_like: jnp.ndarray, idx: jnp.ndarray,
                 values: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Scatter budget-sized ``values`` into a zeros-like of ``full_shape_like``.

    Invalid slots are zeroed before the scatter so duplicate/padded indices
    cannot pollute the output.
    """
    mask = valid.reshape(valid.shape + (1,) * (values.ndim - valid.ndim))
    vals = jnp.where(mask, values, 0.0)
    out = jnp.zeros_like(full_shape_like)
    return out.at[idx].set(vals, mode="drop")
