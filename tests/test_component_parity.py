"""End-to-end component parity vs independent torch implementations of the
published architectures, through the checkpoint converters. This is the
evidence that reference component .bins load losslessly."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from audio_calm_tpu.config import VAEModelConfig  # noqa: E402
from audio_calm_tpu.models.calm_heads import (  # noqa: E402
    AudioInputProjector,
    TransformerFlowHead,
)
from audio_calm_tpu.models.convert import (  # noqa: E402
    convert_flow_head,
    convert_input_projector,
    convert_predictor,
    convert_vae_params,
)
from audio_calm_tpu.models.vae import AcousticVAE  # noqa: E402


# --------------------------------------------------------------------------
# independent torch DiT flow head (published architecture)
# --------------------------------------------------------------------------
class TSinPos(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dim = dim

    def forward(self, x):
        half = self.dim // 2
        emb = math.log(10000) / (half - 1)
        emb = torch.exp(torch.arange(half) * -emb)
        emb = x[:, None] * emb[None, :]
        return torch.cat((emb.sin(), emb.cos()), dim=-1)


class TAdaLN(tnn.Module):
    def __init__(self, dim, tdim):
        super().__init__()
        self.emb = tnn.Sequential(tnn.SiLU(), tnn.Linear(tdim, dim * 2))
        self.norm = tnn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

    def forward(self, x, t):
        scale, shift = self.emb(t).chunk(2, dim=1)
        return self.norm(x) * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)


class TDiTBlock(tnn.Module):
    def __init__(self, dim, heads, tdim):
        super().__init__()
        self.adaLN1 = TAdaLN(dim, tdim)
        self.attn = tnn.MultiheadAttention(dim, heads, batch_first=True, dropout=0.0)
        self.adaLN_ctx = TAdaLN(dim, tdim)
        self.ctx_attn = tnn.MultiheadAttention(dim, heads, batch_first=True, dropout=0.0)
        self.ctx_gate = tnn.Parameter(torch.zeros(1) + 0.3)
        self.adaLN2 = TAdaLN(dim, tdim)
        self.mlp = tnn.Sequential(
            tnn.Linear(dim, dim * 4), tnn.GELU(), tnn.Linear(dim * 4, dim)
        )

    def forward(self, x, t, context, context_mask, x_mask):
        h = self.adaLN1(x, t)
        a, _ = self.attn(h, h, h, key_padding_mask=x_mask)
        x = x + a
        h = self.adaLN_ctx(x, t)
        c, _ = self.ctx_attn(h, context, context, key_padding_mask=context_mask)
        x = x + torch.sigmoid(self.ctx_gate) * c
        h = self.adaLN2(x, t)
        return x + self.mlp(h)


class TFlowHead(tnn.Module):
    def __init__(self, in_dim, out_dim, hidden, layers, heads, ctx_dim):
        super().__init__()
        self.time_mlp = tnn.Sequential(
            TSinPos(256), tnn.Linear(256, 256), tnn.SiLU(), tnn.Linear(256, 256)
        )
        self.in_proj = tnn.Linear(in_dim + out_dim, hidden)
        self.context_proj = tnn.Linear(ctx_dim, hidden)
        pos = torch.arange(2048).unsqueeze(1).float()
        div = torch.exp(torch.arange(0, hidden, 2).float() * (-math.log(10000.0) / hidden))
        pe = torch.zeros(2048, hidden)
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pos_emb", pe.unsqueeze(0))
        self.blocks = tnn.ModuleList(
            [TDiTBlock(hidden, heads, 256) for _ in range(layers)]
        )
        self.final_adaLN = TAdaLN(hidden, 256)
        self.out_proj = tnn.Linear(hidden, out_dim)

    def forward(self, cond, noisy, t, context, context_mask, x_mask):
        T = noisy.shape[1]
        temb = self.time_mlp(t)
        x = self.in_proj(torch.cat([cond, noisy], dim=-1))
        x = x + self.pos_emb[:, :T]
        ctx = self.context_proj(context)
        for b in self.blocks:
            x = b(x, temb, ctx, context_mask, x_mask)
        return self.out_proj(self.final_adaLN(x, temb))


def test_flow_head_parity():
    torch.manual_seed(0)
    in_dim, out_dim, hidden, layers, heads, ctx = 24, 12, 64, 2, 4, 24
    tm = TFlowHead(in_dim, out_dim, hidden, layers, heads, ctx).eval()
    # nonzero out_proj so the comparison is meaningful
    tnn.init.normal_(tm.out_proj.weight, std=0.1)

    rng = np.random.default_rng(0)
    B, T, S = 2, 10, 7
    cond = rng.standard_normal((B, T, in_dim)).astype(np.float32)
    noisy = rng.standard_normal((B, T, out_dim)).astype(np.float32)
    t = np.array([0.3, 0.8], np.float32)
    context = rng.standard_normal((B, S, ctx)).astype(np.float32)
    cmask = np.zeros((B, S), bool)
    cmask[:, -2:] = True
    xmask = np.zeros((B, T), bool)
    xmask[0, -3:] = True

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(cond), torch.from_numpy(noisy), torch.from_numpy(t),
            torch.from_numpy(context), torch.from_numpy(cmask),
            torch.from_numpy(xmask),
        ).numpy()

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = {"params": convert_flow_head(sd, layers, has_context=True)}
    m = TransformerFlowHead(
        input_dim=in_dim, output_dim=out_dim, hidden_dim=hidden,
        num_layers=layers, num_heads=heads, context_dim=ctx, dropout=0.0,
    )
    ours = np.asarray(
        m.apply(params, jnp.asarray(cond), jnp.asarray(noisy), jnp.asarray(t),
                context=jnp.asarray(context), context_mask=jnp.asarray(cmask),
                x_mask=jnp.asarray(xmask))
    )
    valid = ~xmask
    diff = np.max(np.abs(ours[valid] - ref[valid]))
    assert diff < 5e-4, diff


def test_legacy_flow_head_parity(tmp_path):
    """Pre-DiT dilated-ResNet FlowMatchingHead (modeling_calm.py:100-168):
    independent torch impl -> convert_legacy_flow_head -> parity; also checks
    load_torch_component auto-detects the legacy .bin layout."""
    from audio_calm_tpu.models.calm_heads import FlowMatchingHead
    from audio_calm_tpu.train.checkpoint import load_torch_component

    td, hidden, n_layers, in_dim, out_dim = 16, 32, 3, 12, 8

    class TRes(tnn.Module):
        def __init__(self, dim, dilation, k=3):
            super().__init__()
            self.conv = tnn.Sequential(
                tnn.SiLU(),
                tnn.Conv1d(dim, dim, k, padding=dilation, dilation=dilation),
                tnn.SiLU(),
                tnn.Conv1d(dim, dim, 1),
            )

        def forward(self, x):
            return x + self.conv(x)

    class TLegacy(tnn.Module):
        def __init__(self):
            super().__init__()
            self.time_mlp = tnn.Sequential(
                TSinPos(td), tnn.Linear(td, td), tnn.SiLU(), tnn.Linear(td, td)
            )
            self.in_proj = tnn.Conv1d(in_dim + out_dim + td, hidden, 3, padding=1)
            self.layers = tnn.ModuleList(
                [TRes(hidden, 2**i) for i in range(n_layers)]
            )
            self.out_proj = tnn.Sequential(
                tnn.GroupNorm(8, hidden), tnn.SiLU(),
                tnn.Conv1d(hidden, out_dim, 3, padding=1),
            )

        def forward(self, condition, noisy_x, t):
            if t.dim() == 1:
                t = t.unsqueeze(1).expand(-1, condition.size(1))
            t_emb = self.time_mlp(t.reshape(-1)).view(
                condition.shape[0], condition.shape[1], -1
            )
            x = torch.cat([condition, noisy_x, t_emb], dim=-1).transpose(1, 2)
            x = self.in_proj(x)
            for layer in self.layers:
                x = layer(x)
            return self.out_proj(x).transpose(1, 2)

    torch.manual_seed(0)
    tm = TLegacy().eval()
    tnn.init.normal_(tm.out_proj[-1].weight, std=0.1)  # nonzero out

    rng = np.random.default_rng(3)
    B, T = 2, 9
    cond = rng.standard_normal((B, T, in_dim)).astype(np.float32)
    noisy = rng.standard_normal((B, T, out_dim)).astype(np.float32)
    t = np.array([0.25, 0.7], np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(cond), torch.from_numpy(noisy),
                 torch.from_numpy(t)).numpy()

    bin_path = tmp_path / "tts_flow_head.bin"
    torch.save(tm.state_dict(), str(bin_path))
    params = {"params": load_torch_component(str(bin_path), "tts_flow_head")}

    m = FlowMatchingHead(input_dim=in_dim, output_dim=out_dim,
                         hidden_dim=hidden, num_layers=n_layers, time_dim=td)
    ours = np.asarray(
        m.apply(params, jnp.asarray(cond), jnp.asarray(noisy), jnp.asarray(t))
    )
    diff = np.max(np.abs(ours - ref))
    assert diff < 1e-4, diff


def test_input_projector_parity():
    class TCausal(tnn.Module):
        def __init__(self, cin, cout, k=3):
            super().__init__()
            self.conv = tnn.Conv1d(cin, cout, k)
            self.pad = k - 1

        def forward(self, x):
            return self.conv(F.pad(x, (self.pad, 0)))

    class TProj(tnn.Module):
        def __init__(self, latent, dim):
            super().__init__()
            self.conv_block = tnn.Sequential(
                TCausal(latent, dim), tnn.GELU(), TCausal(dim, dim)
            )
            self.blocks = tnn.ModuleList([
                tnn.Sequential(
                    tnn.LayerNorm(dim, eps=1e-6), tnn.Linear(dim, dim * 2),
                    tnn.GELU(), tnn.Linear(dim * 2, dim),
                ) for _ in range(2)
            ])
            self.post_norm = tnn.LayerNorm(dim, eps=1e-6)

        def forward(self, x):
            x = self.conv_block(x.transpose(1, 2)).transpose(1, 2)
            for b in self.blocks:
                x = x + b(x)
            return self.post_norm(x)

    torch.manual_seed(1)
    tm = TProj(8, 16).eval()
    x = np.random.default_rng(1).standard_normal((2, 12, 8)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = {"params": convert_input_projector(sd)}
    ours = np.asarray(AudioInputProjector(16).apply(params, jnp.asarray(x)))
    assert np.max(np.abs(ours - ref)) < 1e-4


def test_predictor_converter():
    tm = tnn.Sequential(tnn.Linear(16, 8), tnn.GELU(), tnn.Linear(8, 1))
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    from audio_calm_tpu.models.calm_heads import PredictorMLP

    x = np.random.default_rng(2).standard_normal((3, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))[:, 0].numpy()
    params = {"params": convert_predictor(sd)}
    ours = np.asarray(PredictorMLP(8).apply(params, jnp.asarray(x)))
    assert np.max(np.abs(ours - ref)) < 1e-5


def test_vae_converter_parity():
    """Independent torch VAE encoder/decoder (published layer recipe) vs our
    flax VAE through convert_vae_params."""

    class TRes(tnn.Module):
        def __init__(self, ch, g):
            super().__init__()
            self.conv = tnn.Sequential(
                tnn.GroupNorm(g, ch, eps=1e-6), tnn.GELU(),
                tnn.Conv1d(ch, ch, 3, 1, 1),
                tnn.GroupNorm(g, ch, eps=1e-6), tnn.GELU(),
                tnn.Conv1d(ch, ch, 3, 1, 1),
            )

        def forward(self, x):
            return x + self.conv(x)

    class TVAE(tnn.Module):
        def __init__(self, cin=80, h=32, lat=8, strides=(2, 2), g=4):
            super().__init__()
            enc = [tnn.Conv1d(cin, h, 3, 1, 1)]
            for s in strides:
                enc.append(tnn.Sequential(
                    tnn.Conv1d(h, h, 2 * s, s, s // 2), TRes(h, g)))
            self.encoder = tnn.Sequential(
                *enc, tnn.GroupNorm(g, h, eps=1e-6), tnn.GELU(),
                tnn.Conv1d(h, lat * 2, 3, 1, 1))
            dec = [tnn.Sequential(tnn.Conv1d(lat, h, 3, 1, 1), TRes(h, g))]
            for s in reversed(strides):
                dec.append(tnn.Sequential(
                    tnn.ConvTranspose1d(h, h, 2 * s, s, s // 2), TRes(h, g)))
            self.decoder_net = tnn.Sequential(*dec)
            self.final_proj = tnn.Conv1d(h, cin, 3, 1, 1)

    torch.manual_seed(2)
    tm = TVAE().eval()
    x = np.random.default_rng(3).standard_normal((2, 16, 80)).astype(np.float32)
    with torch.no_grad():
        h = tm.encoder(torch.from_numpy(x.transpose(0, 2, 1)))
        mu_t, logvar_t = torch.chunk(h, 2, dim=1)
        recon_t = tm.final_proj(tm.decoder_net(mu_t))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}

    cfg = VAEModelConfig(in_channels=80, hidden_channels=32, latent_channels=8,
                         norm_num_groups=4)
    params = {"params": convert_vae_params(sd)}
    vae = AcousticVAE(cfg)
    mu, logvar = vae.apply(params, jnp.asarray(x), method=AcousticVAE.encode)
    recon = vae.apply(params, mu, method=AcousticVAE.decode)
    assert np.max(np.abs(np.asarray(mu) - mu_t.numpy().transpose(0, 2, 1))) < 2e-4
    assert np.max(np.abs(np.asarray(recon) - recon_t.numpy().transpose(0, 2, 1))) < 2e-4
