"""CALM auxiliary modules: audio projector, DiT flow heads, predictors.

Re-designs of the reference components (models/modeling_calm.py):
  - AudioInputProjector (33-95): causal convs + residual MLPs + post-LN
  - TransformerFlowHead (174-309): AdaLN-DiT velocity field with gated
    cross-attention and sinusoidal position/time embeddings
  - len/dur predictor MLPs (594-598, 611-615)

All sequence tensors [B, T, C]; masks are True = valid unless noted
(key-padding masks follow the torch convention True = PAD, as in the
reference call sites).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audio_calm_tpu.models.layers import gelu
from audio_calm_tpu.ops.attention import MultiheadAttention


class CausalConv1d(nn.Module):
    """Left-padded conv (streaming-safe; reference modeling_calm.py:22-31).
    Optional compute dtype (params stay fp32)."""

    features: int
    kernel_size: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (self.kernel_size - 1, 0), (0, 0)))
        return nn.Conv(
            self.features, (self.kernel_size,), padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


class AudioInputProjector(nn.Module):
    """VAE latent [B,T,latent] -> LLM space [B,T,llm_dim].

    2x CausalConv(k=3) with GELU between, 2 residual MLP blocks, post-LN.
    RoPE optional and disabled in the model (reference sets use_rope=False at
    modeling_calm.py:565 to avoid double-RoPE with the LLM).
    """

    llm_dim: int
    use_rope: bool = False
    rope_base: float = 10000.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = CausalConv1d(self.llm_dim, 3, dtype=self.dtype, name="conv1")(x)
        x = gelu(x)
        x = CausalConv1d(self.llm_dim, 3, dtype=self.dtype, name="conv2")(x)
        for i in range(2):
            h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"block{i}_ln")(x)
            h = nn.Dense(self.llm_dim * 2, dtype=self.dtype,
                         name=f"block{i}_fc1")(h)
            h = gelu(h)
            h = nn.Dense(self.llm_dim, dtype=self.dtype,
                         name=f"block{i}_fc2")(h)
            x = x + h
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="post_norm")(x)
        if self.use_rope:
            x = _interleaved_rope(x, self.rope_base)
        return x


def _interleaved_rope(x: jnp.ndarray, base: float) -> jnp.ndarray:
    """Interleaved-pair RoPE over the full hidden dim
    (reference _apply_rope, modeling_calm.py:63-82)."""
    B, T, D = x.shape
    inv_freq = 1.0 / (base ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D))
    t = jnp.arange(T, dtype=jnp.float32)
    freqs = t[:, None] * inv_freq[None, :]  # [T, D/2]
    sin, cos = jnp.sin(freqs), jnp.cos(freqs)
    xp = x.reshape(B, T, D // 2, 2)
    x1, x2 = xp[..., 0], xp[..., 1]
    out = jnp.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.reshape(B, T, D).astype(x.dtype)


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Continuous-time sinusoidal embedding, t in [0,1], -> [B, dim].

    Matches FlowMatchingHead.SinusoidalPosEmb (modeling_calm.py:101-111):
    freqs = exp(arange(half) * -ln(10000)/(half-1)); cat(sin, cos).
    """
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1))
    )
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def sinusoidal_position_table(max_len: int, dim: int) -> np.ndarray:
    """Sequence position table (modeling_calm.py:273-280): interleaved
    sin/cos with div = exp(arange(0,dim,2) * -ln(10000)/dim). [max_len, dim]."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float64) * (-math.log(10000.0) / dim))
    pe = np.zeros((max_len, dim), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe.astype(np.float32)


class TimeMLP(nn.Module):
    """SinusoidalPosEmb -> Linear -> SiLU -> Linear (time_dim=256)."""

    time_dim: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, t):  # [B] in [0,1]
        e = timestep_embedding(t, self.time_dim)
        e = nn.Dense(self.time_dim, dtype=self.dtype, name="fc1")(e)
        e = jax.nn.silu(e)
        return nn.Dense(self.time_dim, dtype=self.dtype, name="fc2")(e)


class AdaLN(nn.Module):
    """Adaptive LayerNorm: norm(x) * (1 + scale(t)) + shift(t)."""

    dim: int
    time_dim: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t_emb):
        h = jax.nn.silu(t_emb)
        ss = nn.Dense(self.dim * 2, dtype=self.dtype, name="emb")(h)  # [B, 2*dim]
        scale, shift = jnp.split(ss, 2, axis=-1)
        x = nn.LayerNorm(epsilon=1e-6, use_scale=False, use_bias=False,
                         dtype=self.dtype, name="norm")(x)
        return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class DiTBlock(nn.Module):
    dim: int
    num_heads: int
    time_dim: int = 256
    mlp_ratio: float = 4.0
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x,
        t_emb,
        context: Optional[jnp.ndarray] = None,
        context_mask: Optional[jnp.ndarray] = None,  # True = PAD
        x_mask: Optional[jnp.ndarray] = None,  # True = PAD
        train: bool = False,
    ):
        h = AdaLN(self.dim, self.time_dim, dtype=self.dtype, name="adaLN1")(x, t_emb)
        attn = MultiheadAttention(self.dim, self.num_heads, self.dropout,
                                  dtype=self.dtype, name="attn")
        x = x + attn(h, h, h, key_padding_mask=x_mask, train=train)

        if context is not None:
            h = AdaLN(self.dim, self.time_dim, dtype=self.dtype,
                      name="adaLN_ctx")(x, t_emb)
            ctx_attn = MultiheadAttention(
                self.dim, self.num_heads, self.dropout, dtype=self.dtype,
                name="ctx_attn"
            )
            out = ctx_attn(h, context, context,
                           key_padding_mask=context_mask, train=train)
            gate = self.param("ctx_gate", nn.initializers.zeros, (1,))
            x = x + jax.nn.sigmoid(gate.astype(x.dtype)) * out

        h = AdaLN(self.dim, self.time_dim, dtype=self.dtype, name="adaLN2")(x, t_emb)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(h)
        h = gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class TransformerFlowHead(nn.Module):
    """DiT velocity field v(x_t, t | condition, context).

    condition: per-frame conditioning, concatenated with the noisy state and
    linearly projected; context: optional cross-attended sequence (projected
    from context_dim). Zero-init out_proj so v(.)=0 at init (reference
    modeling_calm.py:269-270).
    """

    input_dim: int  # condition dim
    output_dim: int  # state dim
    hidden_dim: int = 1024
    num_layers: int = 6
    num_heads: int = 16
    context_dim: Optional[int] = None
    time_dim: int = 256
    max_seq_len: int = 2048
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        condition: jnp.ndarray,  # [B, T, input_dim]
        noisy_x: jnp.ndarray,  # [B, T, output_dim]
        t: jnp.ndarray,  # [B] in [0,1]
        context: Optional[jnp.ndarray] = None,  # [B, S, context_dim]
        context_mask: Optional[jnp.ndarray] = None,  # [B, S] True = PAD
        x_mask: Optional[jnp.ndarray] = None,  # [B, T] True = PAD
        train: bool = False,
    ) -> jnp.ndarray:
        T = noisy_x.shape[1]
        t_emb = TimeMLP(self.time_dim, dtype=self.dtype, name="time_mlp")(t)

        x = jnp.concatenate([condition, noisy_x], axis=-1)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="in_proj")(x)
        pos = jnp.asarray(
            sinusoidal_position_table(self.max_seq_len, self.hidden_dim)
        )
        x = x + pos[None, :T, :].astype(x.dtype)

        proj_context = None
        if context is not None and self.context_dim is not None:
            proj_context = nn.Dense(self.hidden_dim, dtype=self.dtype,
                                    name="context_proj")(context)

        for i in range(self.num_layers):
            x = DiTBlock(
                self.hidden_dim, self.num_heads, self.time_dim,
                dropout=self.dropout, dtype=self.dtype, name=f"blocks_{i}",
            )(x, t_emb, proj_context, context_mask, x_mask, train)

        x = AdaLN(self.hidden_dim, self.time_dim, dtype=self.dtype,
                  name="final_adaLN")(x, t_emb)
        out = nn.Dense(
            self.output_dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="out_proj",
        )(x)
        return out


class FlowMatchingHead(nn.Module):
    """Legacy dilated-ResNet flow head (reference modeling_calm.py:100-168).

    Kept for checkpoint compatibility with pre-DiT runs; the DiT
    TransformerFlowHead supersedes it. Per-position time embedding
    (t broadcast over frames), Conv1d in_proj over [condition | noisy_x |
    t_emb], N dilated residual blocks, GroupNorm + SiLU + zero-init out conv.
    """

    input_dim: int
    output_dim: int
    hidden_dim: int = 1024
    num_layers: int = 6
    time_dim: int = 256

    @nn.compact
    def __call__(self, condition, noisy_x, t, condition_mask=None,
                 context=None, context_mask=None, x_mask=None,
                 train: bool = False):
        B, T, _ = condition.shape
        if t.ndim == 1:
            t = jnp.broadcast_to(t[:, None], (B, T))
        e = timestep_embedding(t.reshape(-1), self.time_dim)
        e = nn.Dense(self.time_dim, name="time_fc1")(e)
        e = jax.nn.silu(e)
        e = nn.Dense(self.time_dim, name="time_fc2")(e)
        t_emb = e.reshape(B, T, self.time_dim)

        x = jnp.concatenate([condition, noisy_x, t_emb.astype(condition.dtype)],
                            axis=-1)
        if condition_mask is not None:
            x = x * condition_mask.reshape(-1, 1, 1).astype(x.dtype)
        x = nn.Conv(self.hidden_dim, (3,), padding=[(1, 1)], name="in_proj")(x)
        for i in range(self.num_layers):
            d = 2**i
            h = jax.nn.silu(x)
            h = nn.Conv(self.hidden_dim, (3,), padding=[(d, d)],
                        kernel_dilation=(d,), name=f"res{i}_conv1")(h)
            h = jax.nn.silu(h)
            h = nn.Conv(self.hidden_dim, (1,), name=f"res{i}_conv2")(h)
            x = x + h
        x = nn.GroupNorm(num_groups=8, epsilon=1e-5, name="out_norm")(x)
        x = jax.nn.silu(x)
        return nn.Conv(
            self.output_dim, (3,), padding=[(1, 1)],
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="out_proj",
        )(x)


class PredictorMLP(nn.Module):
    """Linear(d -> d/2) -> GELU -> Linear(d/2 -> 1); used for length and
    duration prediction (reference modeling_calm.py:594-598, 611-615)."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, name="fc1")(x)
        h = gelu(h)
        return nn.Dense(1, name="fc2")(h)[..., 0]
