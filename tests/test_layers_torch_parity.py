"""Exact-semantics parity of conv/norm primitives vs torch (fp32)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_calm_tpu.models.layers import Conv1d, ConvTranspose1d, GroupNorm, gelu

torch = pytest.importorskip("torch")


def _np(x):
    return np.asarray(x)


def test_conv1d_matches_torch():
    rng = np.random.default_rng(0)
    B, T, Cin, Cout, k, s, p = 2, 32, 8, 16, 4, 2, 1
    x = rng.standard_normal((B, T, Cin)).astype(np.float32)

    m = Conv1d(Cout, k, stride=s, padding=p)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = _np(params["params"]["conv"]["kernel"])  # [k, Cin, Cout]
    b = _np(params["params"]["conv"]["bias"])
    ours = _np(m.apply(params, jnp.asarray(x)))

    tm = torch.nn.Conv1d(Cin, Cout, k, stride=s, padding=p)
    tm.weight.data = torch.from_numpy(w.transpose(2, 1, 0).copy())
    tm.bias.data = torch.from_numpy(b.copy())
    ref = tm(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
    assert ours.shape == ref.shape
    assert np.max(np.abs(ours - ref)) < 1e-4


@pytest.mark.parametrize("subpixel", [False, True])
@pytest.mark.parametrize(
    "k,s,p",
    [
        (4, 2, 1),    # VAE decoder / HiFi-GAN tail
        (16, 8, 4),   # HiFi-GAN head stages, 8x upsample
        (6, 3, 1),    # 2p != k-s -> always exact-adjoint lhs_dilation
        (5, 3, 1),    # k % s != 0 -> always lhs_dilation
    ],
)
def test_conv_transpose1d_matches_torch(k, s, p, subpixel):
    rng = np.random.default_rng(1)
    B, T, C = 2, 16, 8
    x = rng.standard_normal((B, T, C)).astype(np.float32)

    m = ConvTranspose1d(C, k, stride=s, padding=p, subpixel=subpixel)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = _np(params["params"]["kernel"])  # [k, Cin, Cout]
    b = _np(params["params"]["bias"])
    ours = _np(m.apply(params, jnp.asarray(x)))

    tm = torch.nn.ConvTranspose1d(C, C, k, stride=s, padding=p)
    tm.weight.data = torch.from_numpy(w.transpose(1, 2, 0).copy())  # [Cin, Cout, k]
    tm.bias.data = torch.from_numpy(b.copy())
    ref = tm(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_groupnorm_matches_torch():
    rng = np.random.default_rng(2)
    B, T, C, G = 2, 20, 32, 8
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    m = GroupNorm(G, eps=1e-6)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = _np(m.apply(params, jnp.asarray(x)))
    tm = torch.nn.GroupNorm(G, C, eps=1e-6)
    ref = tm(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_gelu_is_exact_erf():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    ours = _np(gelu(jnp.asarray(x)))
    ref = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()  # default: exact
    assert np.max(np.abs(ours - ref)) < 1e-6
