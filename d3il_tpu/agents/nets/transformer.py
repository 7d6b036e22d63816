"""Minimal causal GPT backbone (Flax).

Equivalent of the vendored minGPT the reference's BeT / GPT-BC policies build
on (agents/models/bet/libraries/mingpt/model.py, gpt_policy.py): learned
positional embeddings, pre-LN blocks, causal self-attention.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class CausalSelfAttention(nn.Module):
    n_embd: int
    n_head: int

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        qkv = nn.Dense(3 * C)(x).reshape(B, T, 3, self.n_head, C // self.n_head)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        att = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(C // self.n_head)
        mask = jnp.tril(jnp.ones((T, T), bool))
        att = jnp.where(mask[None, None], att, -1e9)
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum("bhts,bshd->bthd", att, v).reshape(B, T, C)
        return nn.Dense(C)(y)


class Block(nn.Module):
    n_embd: int
    n_head: int

    @nn.compact
    def __call__(self, x):
        x = x + CausalSelfAttention(self.n_embd, self.n_head)(nn.LayerNorm()(x))
        h = nn.LayerNorm()(x)
        h = nn.Dense(4 * self.n_embd)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.n_embd)(h)
        return x + h


class GPT(nn.Module):
    """Token-level causal transformer over embedded inputs."""
    n_embd: int = 120
    n_head: int = 4
    n_layer: int = 4
    block_size: int = 16
    output_dim: int = 2

    @nn.compact
    def __call__(self, x):
        """x: [B, T, D_in] continuous tokens. Returns [B, T, output_dim]."""
        B, T, _ = x.shape
        h = nn.Dense(self.n_embd)(x)
        pos = self.param("pos_emb", nn.initializers.zeros,
                         (1, self.block_size, self.n_embd))
        h = h + pos[:, :T]
        for _ in range(self.n_layer):
            h = Block(self.n_embd, self.n_head)(h)
        h = nn.LayerNorm()(h)
        return nn.Dense(self.output_dim)(h)
