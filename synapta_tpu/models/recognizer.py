"""CTC text-line recognizer (flax linen).

The on-TPU replacement for PaddleOCR's recognition stage (ref
pdf_image_segmentation.py:1092-1165): a conv stack collapses a
height-normalized line image into a frame sequence, a small self-attention
encoder (MXU matmuls, bfloat16-friendly) contextualizes it, and a CTC head
emits per-frame class logits. PP-OCRv3's SVTR-style "conv + attention + CTC"
recipe (PAPERS.md) at a scale trainable on synthetic data in minutes.

Input:  (B, 32, W, 1) float32 in [0, 1]   (W = cfg.line_max_width)
Output: (B, W // 4, NUM_CLASSES) logits
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from synapta_tpu.models.charset import NUM_CLASSES


class EncoderBlock(nn.Module):
    dim: int
    heads: int = 4
    mlp_ratio: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, D)
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, qkv_features=self.dim
        )(h, h)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h


class Recognizer(nn.Module):
    num_classes: int = NUM_CLASSES
    dim: int = 192
    blocks: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (B, 32, W, 1)
        conv = lambda f, s: nn.Conv(  # noqa: E731
            f, (3, 3), strides=s, padding="SAME", dtype=self.dtype
        )
        x = x.astype(self.dtype)
        x = nn.relu(conv(32, (1, 1))(x))
        x = nn.relu(conv(64, (2, 2))(x))      # 16 x W/2
        x = nn.relu(conv(128, (2, 2))(x))     # 8 x W/4
        x = nn.relu(conv(self.dim, (2, 1))(x))  # 4 x W/4
        x = nn.relu(conv(self.dim, (2, 1))(x))  # 2 x W/4
        x = jnp.mean(x, axis=1)               # (B, W/4, dim) collapse height
        T = x.shape[1]
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, T, self.dim)
        )
        x = x + pos.astype(self.dtype)
        for _ in range(self.blocks):
            x = EncoderBlock(dim=self.dim, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32)(x)
        return logits
