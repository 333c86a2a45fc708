"""Torch-semantics primitive layers in flax.linen, channels-last.

All sequence tensors are [B, T, C] (channels map to TPU lanes). These wrappers
pin down exact PyTorch numerical semantics (padding conventions, transposed
conv arithmetic, exact-erf GELU) so reference checkpoints convert losslessly.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def gelu(x):
    """Exact-erf GELU (torch nn.GELU default), not the tanh approximation."""
    return jax.nn.gelu(x, approximate=False)


def silu(x):
    return jax.nn.silu(x)


class Conv1d(nn.Module):
    """torch.nn.Conv1d equivalent on [B, T, C_in] -> [B, T_out, C_out].

    kernel param shape [k, C_in, C_out]  (torch weight is [C_out, C_in, k];
    convert with w.transpose(2, 1, 0)).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        conv = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            kernel_dilation=(self.dilation,),
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )
        return conv(x)


class ConvTranspose1d(nn.Module):
    """torch.nn.ConvTranspose1d equivalent: out_len = (T-1)*s - 2p + k.

    kernel param shape [k, C_in, C_out] (torch weight is [C_in, C_out, k];
    convert with w.transpose(2, 0, 1)).

    Implemented as an input-dilated convolution with the spatially-flipped
    kernel — the exact adjoint of Conv1d, matching torch in fp32.

    MEASURED NEGATIVE RESULT (round 2, v5e): a subpixel/depth-to-time
    reformulation (dense VALID conv with k/s taps to s*C_out channels +
    interleave, `subpixel=True`) avoids the zero-stuffed multiplies but LOST
    to this lowering at the HiFi-GAN geometry — 116 ms vs 91 ms for the full
    generator at [1,1536,80] fp32 — because the materialized depth-to-time
    intermediate + slice nearly doubles HBM traffic (45.5 vs 25.4 GB, XLA
    cost analysis) and the op is bandwidth-bound. XLA's native lhs_dilation
    lowering does not pay for the inserted zeros on TPU. The subpixel path is
    kept (flag, off) as the torch-verified reference of that reformulation.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    subpixel: bool = False  # measured slower on TPU; see class docstring

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (self.kernel_size, in_ch, self.features),
        )
        k, s, p = self.kernel_size, self.stride, self.padding
        dt = self.dtype or x.dtype
        if self.subpixel and s > 1 and k % s == 0 and 2 * p == k - s:
            y = self._subpixel(x.astype(dt), kernel.astype(dt), k, s, p)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(dt),
                jnp.flip(kernel, axis=0).astype(dt),
                window_strides=(1,),
                padding=[(k - 1 - p, k - 1 - p)],
                lhs_dilation=(s,),
                dimension_numbers=("NHC", "HIO", "NHC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y

    def _subpixel(self, x, kernel, k, s, p):
        # out[m] = sum_j x[(m+p)//s - j] * w[(m+p)%s + j*s]  (torch semantics:
        # out[t*s - p + kappa] += x[t] * w[kappa]).  Split kappa = j*s + phi:
        # a taps j in [0, a), s phases phi.  z[q, phi] = sum_j x[q-j] w[phi+j*s]
        # is a causal a-tap conv to s*C_out channels; flatten (q, phi) -> time
        # and slice off the p-sample left edge.
        B, T, C_in = x.shape
        a = k // s
        # [k, C_in, C_out] -> [a(j), s(phi), C_in, C_out] -> [a, C_in, s, C_out]
        # (j flipped: lax conv correlates forward while z sums over x[q - j])
        w = jnp.flip(
            kernel.reshape(a, s, C_in, self.features), axis=0
        ).transpose(0, 2, 1, 3)
        w = w.reshape(a, C_in, s * self.features)
        xp = jnp.pad(x, ((0, 0), (a - 1, 1), (0, 0)))
        z = jax.lax.conv_general_dilated(
            xp, w, window_strides=(1,), padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
        )  # [B, T+1, s*C_out]
        z = z.reshape(B, (T + 1) * s, self.features)
        return jax.lax.dynamic_slice_in_dim(z, p, T * s, axis=1)


class GroupNorm(nn.Module):
    """torch.nn.GroupNorm equivalent (normalizes over spatial dims + group).

    Optional `mask` [B, T, 1] restricts the mean/var statistics to valid
    time positions, so a padded batch row normalizes exactly like the
    unpadded tensor would (used by the serving ASR frontend's bucketed
    batched VAE encode)."""

    num_groups: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, mask=None):
        if mask is not None:
            mask = jnp.broadcast_to(mask.astype(bool), x.shape)
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.eps, name="gn"
        )(x, mask=mask)


class LayerNorm(nn.Module):
    eps: float = 1e-6
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(
            epsilon=self.eps, use_scale=self.use_scale, use_bias=self.use_bias,
            name="ln",
        )(x)


class MLP(nn.Module):
    """Linear -> act -> Linear (torch nn.Sequential style)."""

    hidden: int
    out: int
    act: Callable = gelu

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = self.act(x)
        return nn.Dense(self.out, name="fc2")(x)
