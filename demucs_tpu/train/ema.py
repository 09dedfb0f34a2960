"""Exponential moving average of parameter pytrees.

Behavioral reference: ``demucs/ema.py:15-67`` (ModelEMA) — unbiased-by-count
EMA over fp32 leaves, with a ``swap`` context to evaluate with averaged
weights. The update is a pure jitted pytree op.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp


def _is_f32(x) -> bool:
    return hasattr(x, "dtype") and x.dtype == jnp.float32


@jax.jit
def _ema_update(state, params, w):
    # non-f32 leaves track the LIVE params (the reference's swap only
    # touches fp32 keys, leaving the rest at their current values) — keeping
    # the stale state leaf would silently revert e.g. an int buffer to its
    # value at EMA construction when the EMA state is installed/saved
    return jax.tree.map(
        lambda s, p: (1 - w) * s + w * p if _is_f32(p) else p, state, params
    )


class ModelEMA:
    """EMA over a params pytree. ``update(params)`` after each step/epoch."""

    def __init__(self, params, decay: float = 0.9999, unbias: bool = True):
        self.decay = decay
        self.unbias = unbias
        self.count = 0.0
        self.state = jax.tree.map(lambda p: p, params)

    def update(self, params) -> None:
        if self.unbias:
            self.count = self.count * self.decay + 1
            w = 1.0 / self.count
        else:
            w = 1.0 - self.decay
        self.state = _ema_update(self.state, params, w)

    def state_dict(self) -> dict:
        return {"state": self.state, "count": self.count}

    def load_state_dict(self, state: dict) -> None:
        self.count = state["count"]
        self.state = state["state"]


@contextmanager
def swap(holder, ema: ModelEMA):
    """Temporarily point ``holder.params`` at the EMA weights (ema.py:55-58).

    ``holder`` is any object with a ``params`` attribute (e.g. a registry
    Model or the Solver).
    """
    old = holder.params
    holder.params = ema.state
    try:
        yield
    finally:
        holder.params = old
