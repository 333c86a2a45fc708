"""Optimizer construction: 5-group learning rates + freezing, as optax.

Replicates the reference CalmTrainer.create_optimizer grouping
(train/train_calm.py:249-291):

  group       match (first wins)                          lr mult   wd
  soa         soa_embed                                   soa_mult  0
  proj        input_proj (excluding lora_*)               proj_mult wd
  head        tts_flow_head | asr_flow_head |
              asr_cross_attn                              head_mult wd
  no_decay    bias / norm scales                          1         0
  decay       everything else trainable (incl. LoRA)      1         wd
  frozen      llm base weights, embed table, opposite-
              task heads per task_mode, optional projector  --

Plus warmup-cosine schedule, global-norm clipping, and optional
optax.MultiSteps gradient accumulation.
"""

from __future__ import annotations

from typing import Dict, Tuple

import optax
from flax.traverse_util import flatten_dict, unflatten_dict

from audio_calm_tpu.config import TrainingConfig


def calm_param_label(path: Tuple[str, ...], task_mode: str = "mix",
                     freeze_projector: bool = False) -> str:
    """Map a flattened param path to its optimizer group."""
    joined = "/".join(path)
    is_lora = path[-1] in ("lora_a", "lora_b")

    # frozen: llm base + embedding table (LoRA inside llm stays trainable)
    if path[0] == "llm" and not is_lora:
        return "frozen"
    if path[0] == "embed":
        return "frozen"
    if path[0] == "vae":
        return "frozen"
    # opposite-task freezing (reference train_calm.py:501-519)
    if task_mode == "tts" and path[0] in (
        "asr_flow_head", "asr_cross_attn", "asr_query_embed"
    ):
        return "frozen"
    if task_mode == "asr" and path[0] in (
        "tts_flow_head", "tts_len_predictor", "tts_dur_predictor"
    ):
        return "frozen"
    if freeze_projector and path[0] == "input_proj":
        return "frozen"

    if "soa_embed" in joined:
        return "soa"
    if path[0] == "input_proj" and not is_lora:
        return "proj"
    if path[0] in ("tts_flow_head", "asr_flow_head", "asr_cross_attn"):
        return "head"
    if path[-1] == "bias" or path[-1] == "scale":
        return "no_decay"
    return "decay"


def vae_param_label(path: Tuple[str, ...]) -> str:
    if path[-1] == "bias" or path[-1] == "scale":
        return "no_decay"
    return "decay"


def partition_params(params: Dict, label_fn) -> Tuple[Dict, Dict]:
    """Split a nested param dict into (trainable_flat, frozen_flat).

    Flat dicts keyed by path tuples; merge with `merge_partitions`. Keeping
    frozen params OUT of the grad computation avoids materializing LLM-sized
    gradients (the reference relies on requires_grad=False for the same).
    """
    flat = flatten_dict(params)
    trainable = {k: v for k, v in flat.items() if label_fn(k) != "frozen"}
    frozen = {k: v for k, v in flat.items() if label_fn(k) == "frozen"}
    return trainable, frozen


def merge_partitions(trainable: Dict, frozen: Dict) -> Dict:
    return unflatten_dict({**frozen, **trainable})


def make_schedule(cfg: TrainingConfig, total_steps: int):
    warmup = max(int(total_steps * cfg.warmup_ratio), 1)
    if cfg.lr_scheduler_type == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=warmup,
            decay_steps=max(total_steps, warmup + 1),
            end_value=0.0,
        )
    if cfg.lr_scheduler_type == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, cfg.learning_rate, warmup),
                optax.linear_schedule(
                    cfg.learning_rate, 0.0, max(total_steps - warmup, 1)
                ),
            ],
            [warmup],
        )
    return cfg.learning_rate  # constant


def make_optimizer(
    cfg: TrainingConfig,
    trainable_flat: Dict,
    label_fn,
    total_steps: int,
) -> optax.GradientTransformation:
    """Multi-group AdamW over a flat {path: array} trainable dict."""
    base = make_schedule(cfg, total_steps)

    def scaled(mult: float, wd: float):
        sched = (lambda s: base(s) * mult) if callable(base) else base * mult
        return optax.adamw(
            learning_rate=sched,
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=wd,
        )

    transforms = {
        "decay": scaled(1.0, cfg.weight_decay),
        "no_decay": scaled(1.0, 0.0),
        "proj": scaled(cfg.proj_lr_mult, cfg.weight_decay),
        "head": scaled(cfg.head_lr_mult, cfg.weight_decay),
        "soa": scaled(cfg.soa_lr_mult, 0.0),
    }
    labels = {k: label_fn(k) for k in trainable_flat}
    tx = optax.multi_transform(transforms, labels)
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), tx)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx
