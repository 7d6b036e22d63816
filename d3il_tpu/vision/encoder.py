"""Vision obs encoder: ResNet18 (GroupNorm) + SpatialSoftmax, Flax.

Equivalent of the reference's MultiImageObsEncoder
(agents/models/vision/multi_image_obs_encoder.py:11): per-camera
robomimic VisualCore = ResNet18Conv backbone + SpatialSoftmax keypoints
(model_getter.py:7-33), with BatchNorm swapped for GroupNorm
(multi_image_obs_encoder.py:62-69); camera features concat with the low-dim
robot state.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ResNetBlock(nn.Module):
    filters: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.filters, (3, 3), (self.stride, self.stride),
                    use_bias=False)(x)
        y = nn.GroupNorm(num_groups=min(16, self.filters))(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), use_bias=False)(y)
        y = nn.GroupNorm(num_groups=min(16, self.filters))(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1),
                               (self.stride, self.stride), use_bias=False)(residual)
            residual = nn.GroupNorm(num_groups=min(16, self.filters))(residual)
        return nn.relu(y + residual)


class ResNet18(nn.Module):
    """ResNet18 trunk (conv feature map output, robomimic ResNet18Conv)."""
    width: int = 64

    @nn.compact
    def __call__(self, x):
        w = self.width
        x = nn.Conv(w, (7, 7), (2, 2), use_bias=False)(x)
        x = nn.GroupNorm(num_groups=16)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding="SAME")
        for filters, stride in ((w, 1), (w, 1), (2 * w, 2), (2 * w, 1),
                                (4 * w, 2), (4 * w, 1), (8 * w, 2), (8 * w, 1)):
            x = ResNetBlock(filters, stride)(x)
        return x  # [B, H/32, W/32, 8w]


class SpatialSoftmax(nn.Module):
    """Keypoint expectation over feature maps (robomimic SpatialSoftmax)."""
    num_kp: int = 32
    temperature: float = 1.0

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        feat = nn.Conv(self.num_kp, (1, 1))(x)          # [B,H,W,K]
        feat = feat.reshape(B, H * W, self.num_kp)
        attn = jax.nn.softmax(feat / self.temperature, axis=1)
        ys = jnp.linspace(-1, 1, H)
        xs = jnp.linspace(-1, 1, W)
        grid_y = jnp.repeat(ys, W)
        grid_x = jnp.tile(xs, H)
        ky = jnp.einsum("bpk,p->bk", attn, grid_y)
        kx = jnp.einsum("bpk,p->bk", attn, grid_x)
        return jnp.concatenate([kx, ky], axis=-1)        # [B, 2K]


class CameraEncoder(nn.Module):
    num_kp: int = 32
    out_dim: int = 64
    width: int = 32   # slimmer than torchvision's 64: 96x96 inputs

    @nn.compact
    def __call__(self, img):
        """img [B, H, W, 3] float in [0,1] -> [B, out_dim]."""
        x = ResNet18(self.width)(img)
        kp = SpatialSoftmax(self.num_kp)(x)
        return nn.Dense(self.out_dim)(kp)


class MultiImageObsEncoder(nn.Module):
    """(bp_img, inhand_img, low_dim) -> flat features
    (multi_image_obs_encoder.py semantics: per-camera encoders + concat)."""
    num_kp: int = 32
    out_dim: int = 64
    share_encoder: bool = False

    @nn.compact
    def __call__(self, bp_img, inhand_img, low_dim):
        enc1 = CameraEncoder(self.num_kp, self.out_dim)
        enc2 = enc1 if self.share_encoder else CameraEncoder(self.num_kp,
                                                             self.out_dim)
        f1 = enc1(bp_img)
        f2 = enc2(inhand_img)
        return jnp.concatenate([f1, f2, low_dim], axis=-1)
