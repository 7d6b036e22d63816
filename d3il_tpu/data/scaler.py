"""Data scaler: per-dim z-score + bounds (reference agents/utils/scaler.py:10-128).

Pure-array version: a Scaler is a small pytree of statistics usable inside
jitted train/predict functions.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

_EPS = 1e-12


class Scaler(NamedTuple):
    x_mean: jax.Array
    x_std: jax.Array
    y_mean: jax.Array
    y_std: jax.Array
    y_bounds: jax.Array   # [2, Da] scaled bounds (scaler.py:44-50)
    x_bounds: jax.Array
    scale_data: bool = True

    @staticmethod
    def fit(x: np.ndarray, y: np.ndarray, scale_data: bool = True) -> "Scaler":
        x = np.asarray(x, np.float64).reshape(-1, x.shape[-1])
        y = np.asarray(y, np.float64).reshape(-1, y.shape[-1])
        xm, xs = x.mean(0), x.std(0)
        ym, ys = y.mean(0), y.std(0)
        if scale_data:
            yb = np.stack([(y.min(0) - ym) / (ys + _EPS), (y.max(0) - ym) / (ys + _EPS)])
            xb = np.stack([(x.min(0) - xm) / (xs + _EPS), (x.max(0) - xm) / (xs + _EPS)])
        else:
            yb = np.stack([y.min(0), y.max(0)])
            xb = np.stack([x.min(0), x.max(0)])
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        return Scaler(f32(xm), f32(xs), f32(ym), f32(ys), f32(yb), f32(xb),
                      scale_data)

    def scale_input(self, x):
        if not self.scale_data:
            return x
        return (x - self.x_mean) / (self.x_std + _EPS)

    def scale_output(self, y):
        if not self.scale_data:
            return y
        return (y - self.y_mean) / (self.y_std + _EPS)

    def inverse_scale_output(self, y):
        if not self.scale_data:
            return y
        return y * (self.y_std + _EPS) + self.y_mean

    def clip_action(self, y):
        """Clamp to 1.1x the scaled data bounds (scaler.py:125-127).

        NaN-safe: jnp.clip propagates NaN, and a NaN action from a diverged
        policy walks through env state into the contact path, where it can
        hard-fault the TPU runtime (observed: one unstable training run
        poisoned every subsequent eval in the sweep process). Diverged
        policies produce (bounded) garbage actions instead."""
        y = jnp.nan_to_num(y, nan=0.0, posinf=0.0, neginf=0.0)
        return jnp.clip(y, self.y_bounds[0] * 1.1, self.y_bounds[1] * 1.1)
