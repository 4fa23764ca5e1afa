"""Adam with per-leaf step counts (torch-faithful lazy state).

PyTorch's Adam keeps a *per-parameter* step count that starts at the
parameter's first real gradient; the reference relies on this when it adds
newly-grown heads to the optimizer mid-run (reference ``train.py:262-272``)
and when unreached generator blocks receive ``grad=None``.  ``optax.adam``
instead keeps one global count, so a parameter that was inactive for N
steps would get a ~1/sqrt(1-b2) = 3.16x oversized first update from the
stale second-moment bias correction.

This transform counts a step for a leaf only when its gradient is nonzero
anywhere — which, with the statically-staged models here, is exactly when
the leaf is active.  (An active leaf whose true gradient is identically
zero would miss a count; with float gradients that is a measure-zero
event.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["adam_per_leaf"]


class PerLeafAdamState(NamedTuple):
    count: optax.Params  # int32 scalar per leaf
    mu: optax.Updates
    nu: optax.Updates


def adam_per_leaf(
    learning_rate: float, b1: float, b2: float, eps: float = 1e-8
) -> optax.GradientTransformation:
    def init_fn(params):
        zeros_like = lambda p: jnp.zeros_like(p)  # noqa: E731
        return PerLeafAdamState(
            count=jax.tree_util.tree_map(
                lambda _: jnp.zeros((), jnp.int32), params
            ),
            mu=jax.tree_util.tree_map(zeros_like, params),
            nu=jax.tree_util.tree_map(zeros_like, params),
        )

    def update_fn(grads, state, params=None):
        del params
        active = jax.tree_util.tree_map(
            lambda g: jnp.any(g != 0).astype(jnp.int32), grads
        )
        count = jax.tree_util.tree_map(
            lambda c, a: c + a, state.count, active
        )
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(g), state.nu, grads
        )

        def leaf_update(m, v, c):
            c_f = jnp.maximum(c, 1).astype(jnp.float32)
            m_hat = m / (1 - b1**c_f)
            v_hat = v / (1 - b2**c_f)
            upd = -learning_rate * m_hat / (jnp.sqrt(v_hat) + eps)
            # inactive-so-far leaves (c == 0) get exactly zero update
            return jnp.where(c > 0, upd, jnp.zeros_like(upd))

        updates = jax.tree_util.tree_map(leaf_update, mu, nu, count)
        return updates, PerLeafAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
