"""Multi-head attention with torch.nn.MultiheadAttention semantics.

Used by the DiT flow heads and the ASR positional-query cross-attention
(reference modeling_calm.py:199,202,575). Parameters are stored as separate
q/k/v/out projections in flax layout; convert.convert_torch_mha unpacks the
torch packed in_proj into this layout.

Math matches torch: scale 1/sqrt(head_dim), key_padding_mask (True = PAD)
masks keys, dropout applied to attention probabilities at train time,
fp32 softmax.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class MultiheadAttention(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Tq, E]
        key: jnp.ndarray,  # [B, Tk, E]
        value: jnp.ndarray,  # [B, Tk, E]
        key_padding_mask: Optional[jnp.ndarray] = None,  # [B, Tk] True = PAD
        train: bool = False,
    ) -> jnp.ndarray:
        E, H = self.embed_dim, self.num_heads
        hd = E // H
        q = nn.Dense(E, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(E, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(E, dtype=self.dtype, name="v_proj")(value)

        B, Tq, _ = q.shape
        Tk = k.shape[1]
        q = q.reshape(B, Tq, H, hd)
        k = k.reshape(B, Tk, H, hd)
        v = v.reshape(B, Tk, H, hd)

        # fused Pallas path at inference (dropout inactive) on TPU
        dropout_active = self.dropout > 0 and train
        if not dropout_active:
            import os as _os

            import jax as _jax

            from audio_calm_tpu.ops.pallas_attention import (
                attention_available, fused_attention,
            )

            # XLA default per measurement; AUDIO_CALM_ATTN=pallas opts in
            # (see models/qwen2._use_pallas_attention)
            if (
                _os.environ.get("AUDIO_CALM_ATTN", "xla") == "pallas"
                and _jax.default_backend() == "tpu"
                and attention_available(q.shape, k.shape)
            ):
                key_valid = (
                    (~key_padding_mask).astype(jnp.int32)
                    if key_padding_mask is not None
                    else None
                )
                out = fused_attention(q, k, v, key_valid=key_valid)
                out = out.reshape(B, Tq, E)
                return nn.Dense(E, dtype=self.dtype, name="out_proj")(out)

        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(hd, jnp.float32))
        if key_padding_mask is not None:
            bad = key_padding_mask[:, None, None, :]
            scores = jnp.where(bad, jnp.finfo(jnp.float32).min, scores)
        probs = jax.nn.softmax(scores, axis=-1)
        if self.dropout > 0:
            probs = nn.Dropout(rate=self.dropout, deterministic=not train)(probs)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(query.dtype)
        out = out.reshape(B, Tq, E)
        return nn.Dense(E, dtype=self.dtype, name="out_proj")(out)
