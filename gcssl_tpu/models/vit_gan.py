"""ViT-based calibrator generator/critic (the reference's abandoned variant).

The reference deleted `cgan/model_trans.py`; only bytecode survives
(`cgan/__pycache__/model_trans.cpython-313.pyc` — SURVEY.md §0).  The
architectural contract recovered from that bytecode (code-object names,
arg lists, and constants — no source exists to copy):

* `Generator_ViT(img_size, patch_size, in_chans, embed_dim, depth,
  num_heads, mlp_ratio, delta_scale)`: Conv2d patch embed (kernel=stride=
  patch), learnable zero-init pos-embed, dropout, `depth` pre-LN blocks
  (MHSA + GELU MLP, qkv_bias), LayerNorm, MEAN-pool over tokens, head =
  Linear -> Tanh, output scaled by `delta_scale` -> 4-D box delta.
* `Discriminator_ViT(...)`: channel-concat of (pred_patch, other_patch)
  -> 6-ch patch embed, a prepended CLS token, pos-embed, blocks with
  LeakyReLU MLP activation, LayerNorm, Linear head on the CLS token —
  an unbounded critic score (WGAN, no sigmoid), mirroring PatchCritic's
  contract.
* trunc_normal(std 0.02) init on pos-embed/cls-token (the pyc's
  `trunc_normal_` constant 0.02).

Hyperparameter defaults are NOT recoverable from the bytecode (the class
bodies' default tuples don't survive disassembly); the defaults here are
chosen TPU-first: patch 16 on 128px patches -> 64 tokens, embed 256 /
depth 6 / heads 4 keeps every matmul MXU-shaped (dims multiples of 128
after head split at bf16).  Selected via CalibratorModelConfig
generator_type="vit" / discriminator_type="vit".

Second-order-safe: no custom_vjp anywhere, so WGAN-GP's grad-of-grad
through the critic works unchanged (cf. discriminators.py NOTE).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

_trunc02 = nn.initializers.truncated_normal(stddev=0.02)


class ViTBlock(nn.Module):
    """Pre-LN transformer block: x + MHSA(LN x); x + MLP(LN x)."""

    num_heads: int
    mlp_ratio: float = 4.0
    act: str = "gelu"          # "gelu" (generator) | "leaky" (critic)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        d = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=d, dtype=self.dtype,
            deterministic=deterministic,
        )(h, h)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype,
                     kernel_init=_trunc02)(h)
        h = (nn.gelu(h) if self.act == "gelu" else nn.leaky_relu(h, 0.2))
        h = nn.Dense(d, dtype=self.dtype, kernel_init=_trunc02)(h)
        return x + h


class _PatchEmbed(nn.Module):
    embed_dim: int
    patch_size: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, kernel_init=_trunc02)(x)
        b, h, w, d = x.shape
        return x.reshape(b, h * w, d)


class GeneratorViT(nn.Module):
    """Patch-conditioned 4-D box-delta regressor (Generator_ViT twin)."""

    delta_scale: float = 0.3
    patch_size: int = 16
    embed_dim: int = 256
    depth: int = 6
    num_heads: int = 4
    mlp_ratio: float = 4.0
    pos_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        x = x.astype(self.dtype)
        tok = _PatchEmbed(self.embed_dim, self.patch_size, self.dtype)(x)
        n = tok.shape[1]
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, n, self.embed_dim))
        tok = tok + pos.astype(self.dtype)
        tok = nn.Dropout(self.pos_drop, deterministic=deterministic)(tok)
        for _ in range(self.depth):
            tok = ViTBlock(self.num_heads, self.mlp_ratio, "gelu",
                           self.dtype)(tok, deterministic=deterministic)
        tok = nn.LayerNorm(dtype=self.dtype)(tok)
        pooled = jnp.mean(tok.astype(jnp.float32), axis=1)   # mean over tokens
        delta = nn.Dense(4, kernel_init=_trunc02)(pooled)
        return jnp.tanh(delta) * self.delta_scale


class CriticViT(nn.Module):
    """(pred, other)-pair WGAN critic with a CLS-token head
    (Discriminator_ViT twin; PatchCritic-compatible call signature)."""

    patch_size: int = 16
    embed_dim: int = 256
    depth: int = 6
    num_heads: int = 4
    mlp_ratio: float = 4.0
    pos_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        pred_patch: jax.Array,
        other_patch: jax.Array,
        *,
        update_stats: bool = False,   # interface parity with PatchCritic
        deterministic: bool = True,
    ) -> jax.Array:
        x = jnp.concatenate([pred_patch, other_patch], axis=-1)
        tok = _PatchEmbed(self.embed_dim, self.patch_size, self.dtype)(
            x.astype(self.dtype))
        b, n, d = tok.shape
        cls = self.param("cls_token", _trunc02, (1, 1, self.embed_dim))
        tok = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, d)), tok], axis=1)
        pos = self.param("pos_embed", _trunc02, (1, n + 1, self.embed_dim))
        tok = tok + pos.astype(self.dtype)
        tok = nn.Dropout(self.pos_drop, deterministic=deterministic)(tok)
        for _ in range(self.depth):
            tok = ViTBlock(self.num_heads, self.mlp_ratio, "leaky",
                           self.dtype)(tok, deterministic=deterministic)
        tok = nn.LayerNorm(dtype=self.dtype)(tok)
        score = nn.Dense(1, kernel_init=_trunc02)(
            tok[:, 0].astype(jnp.float32))
        return score  # (B, 1): unbounded critic score, no sigmoid
