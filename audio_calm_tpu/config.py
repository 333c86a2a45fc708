"""Typed configuration system.

Mirrors the reference's Hydra YAML roots (config/{vae,calm,tts,asr}_config.yaml,
each with model/data/training/evaluation sections) but with strict dataclasses:
every YAML field must map onto a declared field, and unknown keys raise,
fixing the reference bug where train_vae.py:165-173 silently dropped
`ssim_weight`/`use_l1_loss` from vae_config.yaml.

Supports dotted CLI overrides ("training.learning_rate=1e-4") like Hydra.
No Hydra dependency: plain PyYAML + dataclasses.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields
from typing import Any, Dict, List, Optional

import yaml


def _coerce(value: Any, typ: Any) -> Any:
    """Coerce a YAML value to a dataclass field type."""
    origin = getattr(typ, "__origin__", None)
    if typ is Any:
        return value
    if origin is not None:
        args = typ.__args__
        # Optional[T]
        if origin is type(None) or (origin is getattr(__import__("typing"), "Union", None)):
            if value is None:
                return None
            non_none = [a for a in args if a is not type(None)]
            return _coerce(value, non_none[0])
        if origin in (list, List):
            return [_coerce(v, args[0]) for v in value]
        if origin in (dict, Dict):
            return {k: _coerce(v, args[1]) for k, v in value.items()}
        return value
    try:
        import types

        if isinstance(typ, types.UnionType):  # py3.10 `X | None`
            if value is None:
                return None
            non_none = [a for a in typ.__args__ if a is not type(None)]
            return _coerce(value, non_none[0])
    except Exception:
        pass
    if dataclasses.is_dataclass(typ):
        return from_dict(typ, value)
    # a null for a non-Optional scalar would smuggle None into an int/float
    # field and surface as a TypeError deep inside training — reject it here
    if value is None and typ in (bool, int, float, str):
        raise ValueError(
            f"null is not allowed for this non-Optional {typ.__name__} field"
        )
    if typ is bool:
        if isinstance(value, bool):
            return value
        if isinstance(value, str):
            return value.lower() in ("1", "true", "yes", "on")
        return bool(value)
    if typ is float and value is not None:
        return float(value)
    if typ is int and value is not None:
        if isinstance(value, float) and value != int(value):
            raise ValueError(f"cannot coerce {value!r} to int")
        return int(value)
    if typ is str and value is not None:
        return str(value)
    return value


def from_dict(cls, data: Optional[Dict[str, Any]]):
    """Build dataclass `cls` from a dict, raising on unknown keys."""
    if data is None:
        return cls()
    if not isinstance(data, dict):
        raise TypeError(f"expected mapping for {cls.__name__}, got {type(data)}")
    known = {f.name: f for f in fields(cls)}
    unknown = set(data) - set(known)
    if unknown:
        raise KeyError(
            f"unknown config keys for {cls.__name__}: {sorted(unknown)}; "
            f"known: {sorted(known)}"
        )
    kwargs = {}
    for name, value in data.items():
        try:
            kwargs[name] = _coerce(value, _resolve_type(cls, name))
        except ValueError as e:
            raise ValueError(f"{cls.__name__}.{name}: {e}") from None
    return cls(**kwargs)


def _resolve_type(cls, name: str):
    import typing

    hints = typing.get_type_hints(cls)
    return hints[name]


def to_dict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


# ---------------------------------------------------------------------------
# Audio frontend (reference: preprocess/core.py:33-61)
# ---------------------------------------------------------------------------
@dataclass
class MelConfig:
    sample_rate: int = 16000
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 80
    f_min: float = 0.0
    f_max: float = 8000.0
    power: float = 2.0
    log_clamp: float = 1e-5  # ln(clamp(mel, 1e-5)); floor ~= -11.5
    center: bool = True
    pad_mode: str = "reflect"


# ---------------------------------------------------------------------------
# Acoustic VAE (reference: models/modeling_vae.py:90-123, config/vae_config.yaml)
# ---------------------------------------------------------------------------
@dataclass
class VAEModelConfig:
    in_channels: int = 80
    hidden_channels: int = 512
    latent_channels: int = 128
    strides: List[int] = field(default_factory=lambda: [2, 2])
    kl_weight: float = 5e-5
    kl_clamp: float = 2.0
    latent_dropout: float = 0.05
    norm_num_groups: int = 32
    use_l1_loss: bool = True
    ssim_weight: float = 1.0
    stft_loss_weight: float = 0.25
    mel_mean: float = -6.589515
    mel_std: float = 3.860679

    @property
    def total_stride(self) -> int:
        t = 1
        for s in self.strides:
            t *= s
        return t


# ---------------------------------------------------------------------------
# Qwen2 backbone (HF Qwen2-1.5B-Instruct geometry)
# ---------------------------------------------------------------------------
@dataclass
class Qwen2Config:
    vocab_size: int = 151936
    hidden_size: int = 1536
    intermediate_size: int = 8960
    num_hidden_layers: int = 28
    num_attention_heads: int = 12
    num_key_value_heads: int = 2
    head_dim: int = 128
    max_position_embeddings: int = 32768
    rope_theta: float = 1_000_000.0
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = True
    attention_dropout: float = 0.0

    @staticmethod
    def tiny(vocab_size: int = 512) -> "Qwen2Config":
        """A miniature geometry for tests (structure-identical)."""
        return Qwen2Config(
            vocab_size=vocab_size,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            rope_theta=10000.0,
        )


@dataclass
class LoRAConfig:
    enabled: bool = True
    rank: int = 64
    alpha: float = 128.0
    dropout: float = 0.05
    # reference targets q/k/v/o + gate/up/down proj (train_calm.py:463)
    target_modules: List[str] = field(
        default_factory=lambda: [
            "q_proj", "k_proj", "v_proj", "o_proj",
            "gate_proj", "up_proj", "down_proj",
        ]
    )


# ---------------------------------------------------------------------------
# CALM model (reference: models/modeling_calm.py:500-532 QwenCALMConfig)
# ---------------------------------------------------------------------------
@dataclass
class CALMModelConfig:
    qwen_path: Optional[str] = None
    # offline Qwen2 BPE: path to a tiktoken rank file (the reference ships
    # models/qwen.tiktoken); takes priority over the HF AutoTokenizer at
    # qwen_path (data/tokenizer.load_tokenizer)
    tokenizer_path: Optional[str] = None
    vae_path: Optional[str] = None
    use_precomputed_latents: bool = True
    latent_dim: int = 128
    tts_loss_weight: float = 1.0
    asr_loss_weight: float = 1.0
    len_pred_loss_weight: float = 0.1
    dur_pred_loss_weight: float = 0.1
    downsample_rate: int = 1
    max_audio_len: int = 384
    max_text_len: int = 96
    tts_flow_hidden_dim: int = 1024
    tts_flow_num_layers: int = 4
    asr_flow_hidden_dim: int = 1024
    asr_flow_num_layers: int = 4
    flow_num_heads: int = 16
    cfg_dropout_prob: float = 0.1
    mel_mean: float = -6.589515
    mel_std: float = 3.860679
    latent_mean: Any = 0.0  # scalar or [latent_dim] list
    latent_std: Any = 1.0
    use_lora: bool = True
    lora: LoRAConfig = field(default_factory=LoRAConfig)
    # backbone gradient-checkpointing policy: "full" (remat everything,
    # lowest memory), "dots" (save matmul outputs, skip most backward
    # recompute — the right trade with training.microbatch_steps since only
    # one microbatch's saved dots are live), "none" (no remat)
    remat_policy: str = "full"
    freeze_projector: bool = False
    qwen: Qwen2Config = field(default_factory=Qwen2Config)
    # soft restart (reference: train_calm.py:374-398, asr_config.yaml:36-41)
    pretrained_projector_path: Optional[str] = None
    pretrained_tts_head_path: Optional[str] = None
    pretrained_tts_len_pred_path: Optional[str] = None
    pretrained_asr_head_path: Optional[str] = None
    pretrained_asr_query_path: Optional[str] = None
    pretrained_lora_path: Optional[str] = None


@dataclass
class DatasetPaths:
    latent_dir: Optional[str] = None
    eval_latent_dir: Optional[str] = None
    subsets: str = ""


@dataclass
class DataConfig:
    task_mode: str = "mix"  # "tts" | "asr" | "mix"
    task_prob_tts: float = 0.5
    datasets: Dict[str, DatasetPaths] = field(default_factory=dict)
    train_subsets: str = ""
    eval_subsets: str = ""
    max_text_len: int = 96
    max_audio_len: int = 384
    latent_downsample: int = 1
    # optional audio-length buckets (ascending, last == max_audio_len):
    # batches pad to the smallest bucket that fits, trading one extra XLA
    # compile per bucket for less wasted compute on short utterances
    audio_buckets: Optional[List[int]] = None
    # length-grouped batching (reference ships HF group_by_length DISABLED,
    # train_calm.py:113-117): draw this many batches at a time, sort by
    # audio length, re-slice — concentrates batches into the smallest
    # fitting bucket so audio_buckets actually pay off. 0 = off; 16 is the
    # measured recipe (BASELINE.md). Single-host only (multi-host ignores
    # buckets and grouping to keep processes lock-stepped).
    length_group_window: int = 0
    # ASR LLM-prompt pad width: the ASR text prompt is a CONSTANT ~20
    # tokens ("Transcribe audio to text embedding." ChatML), yet the
    # reference pads it to max_text_len=96 inside the [audio|SOA|prompt]
    # LLM sequence. Padding to 32 instead cuts 64 dead tokens from every
    # ASR row — bit-exact (pad prompt tokens are attention-masked out;
    # tests assert loss equality), labels/flow queries stay max_text_len.
    # None = reference behavior (pad to max_text_len).
    asr_text_pad: Optional[int] = None
    # ASR sequence packing: pack several [audio|SOA|prompt] segments into
    # each LLM row (block-diagonal attention + per-segment RoPE positions;
    # exact — the flow head still sees each utterance solo). Removes BOTH
    # pad wastes at once: no bucket quantization of audio lengths and no
    # prompt pad at all (the constant prompt rides unpadded). 0 = off;
    # asr_pack_rows is the number of packed rows per GLOBAL batch (the
    # packed analogue of batch_size; must divide by data-parallel devices
    # x microbatch_steps, and by process_count multi-host). Multi-host
    # packing stays ON when the latent store is header-readable (npz/npy
    # — datasets.CalmDataset.meta): every process derives the identical
    # FFD plan from metadata and loads only its own rows; .pt stores
    # fall back to plain batches.
    asr_pack_rows: int = 0
    # tokens per packed row (>= max_audio_len + 1 + prompt length so the
    # longest utterance fits; 512 is MXU-friendly for the 384-frame grid)
    asr_pack_len: int = 512
    # max utterances per packed row (sizes the static per-row slot arrays)
    asr_pack_segments: int = 4
    # TTS sequence packing: pack several [text|SOA] segments into each LLM
    # row (same block-diagonal machinery; exact — the MAS/dur/flow tail
    # still sees each utterance solo). The TTS LLM encode otherwise pays
    # the full max_text_len grid per utterance while typical texts are a
    # quarter of it. The audio/DiT side stays per-slot and composes with
    # audio_buckets + length_group_window (groups sort by audio length
    # before their texts pack). 0 = off; rows per GLOBAL batch, must
    # divide by data devices x microbatch_steps (and process_count
    # multi-host; same metadata-planned multi-host contract as
    # asr_pack_rows).
    tts_pack_rows: int = 0
    # tokens per packed row (>= max_text_len + 1 so the longest text fits)
    tts_pack_len: int = 256
    # max utterances per packed row (tts_pack_rows x tts_pack_segments is
    # the utterance count per step — the packed analogue of batch_size)
    tts_pack_segments: int = 8
    # VAE training data
    data_dir: Optional[str] = None
    eval_data_dir: Optional[str] = None
    crop_size: int = 256


@dataclass
class TrainingConfig:
    output_dir: str = "outputs/checkpoints/run"
    run_name: str = "run"
    resume_from_checkpoint: Optional[str] = None
    per_device_train_batch_size: int = 16
    per_device_eval_batch_size: int = 1
    gradient_accumulation_steps: int = 1
    # in-step microbatching: lax.scan grad accumulation inside ONE jitted
    # step (peak-HBM lever for the 481-token ASR backbone; 1 = off)
    microbatch_steps: int = 1
    # per-task overrides (mix runs): tts/asr are separate jit programs, so
    # each can run its own measured-optimal scan depth (BASELINE.md: packed
    # TTS k=2 vs the ASR-driven k=8 costs +9.6% at t_aud=96). None = use
    # microbatch_steps for that task too.
    tts_microbatch_steps: Optional[int] = None
    asr_microbatch_steps: Optional[int] = None
    # storage dtype of FROZEN params (the LLM base): "bfloat16" frees
    # ~3.1 GB of HBM on the flagship (compute is bf16 either way; only the
    # never-updated master copies change) — the memory lever that admits
    # fewer microbatch slices. "float32" = reference-faithful masters.
    frozen_weights_dtype: str = "float32"
    learning_rate: float = 5e-5
    num_train_epochs: float = 3.0
    max_steps: int = -1
    bf16: bool = True
    gradient_checkpointing: bool = True
    lr_scheduler_type: str = "cosine"
    warmup_ratio: float = 0.1
    max_grad_norm: float = 1.0
    weight_decay: float = 0.01
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    logging_steps: int = 10
    save_steps: int = 500
    save_total_limit: int = 2
    eval_steps: int = 500
    load_best_model_at_end: bool = True
    metric_for_best_model: str = "loss"
    seed: int = 42
    # 5-group LR multipliers (reference: train_calm.py:249-291)
    soa_lr_mult: float = 5.0
    proj_lr_mult: float = 1.0
    head_lr_mult: float = 3.0
    # deferred-metric drain depth: the loop queues step metrics un-read and
    # drains them in one stacked readback every N steps; each queued step
    # also pins its input batch on device until the drain syncs the
    # dispatch queue. 4 measured safe at flagship geometry (~100 MB pinned;
    # 8-deep OOM'd after ~700 steps — BASELINE round 4); lower it for
    # geometries with thinner HBM margins.
    metrics_drain_steps: int = 4
    # ZeRO-style optimizer-state sharding over the data axis
    shard_optimizer_state: bool = True
    dataloader_num_workers: int = 0
    report_to: str = "none"


@dataclass
class EvaluationConfig:
    task: str = "mix"
    checkpoint_path: Optional[str] = None
    output_dir: str = "outputs/eval_results"
    max_samples: int = 50
    use_vocoder: bool = True
    # HiFi-GAN checkpoint (torch .bin/.ckpt file or SpeechBrain dir);
    # None -> Griffin-Lim fallback (reference eval_calm.py:169-208)
    vocoder_path: Optional[str] = None
    # inference ODE grid buckets (ascending latent-frame counts): run the
    # flow on the smallest bucket that fits the predicted length instead of
    # always paying max_audio_len; None -> single max-grid program
    audio_buckets: Optional[List[int]] = None
    # prompt-token buckets (ascending): pad prompts to the smallest bucket so
    # arbitrary text reuses a few compiled encode programs instead of one per
    # unique prompt length; None -> reference-exact unpadded prompts
    text_buckets: Optional[List[int]] = None
    # long-form TTS: chunk boundaries are equal-power crossfaded (ms)
    crossfade_ms: float = 20.0
    # Default solver: midpoint-12 = 24 velocity evals integrating the same
    # guided field 2.8x MORE accurately than the reference's euler-50 at
    # half the cost (measured, BASELINE.md "ODE solver quality"). Set
    # ode_method: euler / steps: 50 to reproduce the reference protocol
    # (eval_calm.py:140-164).
    steps: int = 12
    cfg_scale: float = 2.5
    # ASR decode: midpoint-10 = 20 velocity evals (exactly the reference's
    # euler-20 cost, eval_calm.py:340) and decodes closer to the dense
    # solution (token agreement 0.969 vs 0.938 measured,
    # tests/test_ode_quality.py). ode_method: euler + asr_steps: 20
    # reproduces the reference protocol.
    asr_steps: int = 10
    asr_cfg_scale: float = 1.0
    ode_method: str = "midpoint"  # "euler" (reference protocol) | "midpoint"
    time_schedule: str = "uniform"  # "uniform" (reference) | "sway"
    # Compute dtype of the CALM inference graph (LLM encode + flow ODE).
    # "float32" reproduces the reference eval protocol exactly (the
    # reference casts every module to torch.float32, eval_calm.py:284);
    # "bfloat16" is the TPU serving recipe — MXU-native compute AND bf16
    # float-param storage, so the per-ODE-step weight re-reads don't pay
    # fp32 HBM traffic (this is what BASELINE.md serving numbers measure).
    # Mel frontend / VAE / vocoder stay fp32 either way.
    compute_dtype: str = "float32"
    eval_asr_model: Optional[str] = None
    seed: int = 42
    datasets: Dict[str, DatasetPaths] = field(default_factory=dict)


@dataclass
class CALMConfig:
    """Root config for CALM training/eval (mirrors calm/tts/asr_config.yaml)."""

    model: CALMModelConfig = field(default_factory=CALMModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    evaluation: EvaluationConfig = field(default_factory=EvaluationConfig)
    mel: MelConfig = field(default_factory=MelConfig)


@dataclass
class VAEConfig:
    """Root config for VAE training (mirrors vae_config.yaml)."""

    model: VAEModelConfig = field(default_factory=VAEModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    mel: MelConfig = field(default_factory=MelConfig)


# ---------------------------------------------------------------------------
# Loading + CLI overrides
# ---------------------------------------------------------------------------
def _apply_override(data: Dict[str, Any], dotted: str, raw: str) -> None:
    keys = dotted.split(".")
    node = data
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = yaml.safe_load(raw)


def load_config(path: str, cls=CALMConfig, overrides: Optional[List[str]] = None):
    """Load a YAML config into dataclass `cls` with dotted CLI overrides."""
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        k, v = ov.split("=", 1)
        _apply_override(data, k, v)
    return from_dict(cls, data)
