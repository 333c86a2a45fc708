"""Train-step construction: pure functions + sharded jit wrappers.

Data parallelism comes from sharding the batch on the mesh "data" axis;
gradients are averaged by XLA-inserted collectives. Optimizer state is
ZeRO-sharded (parallel/mesh.zero_sharding), so grad reduction becomes
reduce-scatter + the update all-gathers — DeepSpeed ZeRO-2's dataflow
(reference ds_config.json:31-41) from annotations alone.

CALM training dispatches task-homogeneous batches to one of two static jit
programs (tts / asr) — see models/calm.py header for why.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from audio_calm_tpu.models.calm import QwenCALM
from audio_calm_tpu.models.vae import AcousticVAE
from audio_calm_tpu.parallel.mesh import (
    batch_sharding,
    replicated,
    zero_leaf_spec,
)
from audio_calm_tpu.parallel.tp import tp_shardings
from audio_calm_tpu.train.optim import merge_partitions


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    trainable: Any  # flat {path-tuple: array}
    opt_state: Any


def init_train_state(trainable_flat: Dict, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable_flat,
        opt_state=tx.init(trainable_flat),
    )


def make_calm_step(
    model: QwenCALM, tx, task: str, microbatch: int = 1
) -> Callable:
    """Returns step(state, frozen_flat, batch, rng) -> (state, metrics).

    microbatch > 1 splits the per-step batch into `microbatch` slices and
    lax.scans a grad-accumulation loop INSIDE the jitted step: only one
    slice's activations are live at a time, shrinking peak HBM by ~k for
    the remat'd 481-token ASR backbone (VERDICT r1 item 4; the reference's
    memory lever is DeepSpeed ZeRO-2 + DP, ds_config.json:31-41). One
    optimizer update per step either way — numerics match a full batch up
    to the per-slice rng folds and fp accumulation order.
    """
    assert task in ("tts", "asr", "asr_packed", "tts_packed")

    def loss_fn(trainable, frozen, batch, rngs, dens=None):
        params = merge_partitions(trainable, frozen)
        if task == "tts":
            out = model.apply(
                {"params": params},
                batch["text_ids"], batch["attention_mask"],
                batch["latents"], batch["audio_mask"],
                train=True, rngs=rngs, method=QwenCALM.forward_tts,
            )
        elif task == "tts_packed":
            # packed-sequence TTS (collator.pack_tts_window layout); dens
            # carries the FULL batch's global denominators through the
            # microbatch scan so slice losses sum exactly to the
            # full-batch loss (None = single-slice, derived in-model)
            out = model.apply(
                {"params": params},
                batch["latents"], batch["audio_mask"], batch["text_mask"],
                batch["tok_ids"], batch["kind"], batch["segment_ids"],
                batch["position_ids"], batch["ctx_idx"], batch["soa_idx"],
                global_den=dens,
                train=True, rngs=rngs, method=QwenCALM.forward_tts_packed,
            )
        elif task == "asr_packed":
            # packed-sequence ASR (collator.pack_asr_window layout): every
            # array's leading axis is the packed ROW, so the generic
            # microbatch split and data-axis sharding below apply unchanged
            out = model.apply(
                {"params": params},
                batch["latents"], batch["latent_mask"], batch["labels"],
                batch["tok_ids"], batch["kind"], batch["gather_idx"],
                batch["segment_ids"], batch["position_ids"],
                batch["ctx_idx"],
                train=True, rngs=rngs, method=QwenCALM.forward_asr_packed,
            )
        else:
            out = model.apply(
                {"params": params},
                batch["text_ids"], batch["attention_mask"],
                batch["latents"], batch["audio_mask"], batch["labels"],
                train=True, rngs=rngs, method=QwenCALM.forward_asr,
            )
        return out["loss"], out

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(state: TrainState, frozen: Dict, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        rng = jax.random.fold_in(rng, state.step)

        if microbatch > 1:
            def split(x):
                b = x.shape[0]
                assert b % microbatch == 0, (b, microbatch)
                return x.reshape((microbatch, b // microbatch) + x.shape[1:])

            mb = jax.tree_util.tree_map(split, batch)

            # Packed slices carry UNEQUAL valid-token counts (FFD fills
            # rows front-to-back, so a window's tail slice can be mostly
            # dummy slots): weight each slice's grads and loss metrics by
            # its masked-mean denominator and divide by the total at the
            # end — the accumulated update then equals the full-batch
            # global masked mean exactly (den is data-only, so
            # grad(num) = den * grad(mean)). Solo tasks keep the
            # reference's plain mean-of-slice-means (every row is one
            # utterance there, matching HF/DeepSpeed accumulation).
            weighted = task == "asr_packed"
            # Packed TTS has THREE loss terms with different denominators
            # (valid frames / real slots / slots*grid), so one scalar
            # weight can't reproduce the full batch. Instead each slice
            # loss is built against the FULL batch's global denominators
            # (computed here, outside the scan) and slice grads simply sum.
            summed = task == "tts_packed"
            dens = None
            if summed:
                slots = batch["text_mask"].any(-1).astype(jnp.float32)
                dens = (
                    jnp.maximum(jnp.sum(slots), 1.0),
                    jnp.maximum(
                        jnp.sum(batch["audio_mask"].astype(jnp.float32)), 1.0
                    ),
                )

            def body(carry, sub_batch):
                acc_g, acc_m, i = carry
                r = jax.random.fold_in(rng, i)
                rngs = {
                    "flow": jax.random.fold_in(r, 0),
                    "dropout": jax.random.fold_in(r, 1),
                }
                (_, out), g = grad_fn(
                    state.trainable, frozen, sub_batch, rngs, dens=dens)
                w = out["loss_den"] if weighted else jnp.float32(1.0)
                acc_g = jax.tree_util.tree_map(
                    lambda a, b: a + w * b, acc_g, g)
                acc_m = {
                    k: acc_m[k] + (out[k] if k == "loss_den" else w * out[k])
                    for k in acc_m
                }
                return (acc_g, acc_m, i + 1), None

            zero_g = jax.tree_util.tree_map(
                lambda x: jnp.zeros(x.shape, jnp.float32), state.trainable
            )
            # metric structure from an abstract eval (no compute)
            out_shape = jax.eval_shape(
                lambda tr: loss_fn(tr, frozen,
                                   jax.tree_util.tree_map(lambda x: x[0], mb),
                                   {"flow": rng, "dropout": rng})[1],
                state.trainable,
            )
            zero_m = {k: jnp.zeros((), jnp.float32) for k in out_shape}
            (g_sum, m_sum, _), _ = jax.lax.scan(
                body, (zero_g, zero_m, jnp.zeros((), jnp.int32)), mb
            )
            if weighted:
                denom = jnp.maximum(m_sum["loss_den"], 1.0)
            elif summed:
                denom = jnp.float32(1.0)  # slices sum to the global loss
            else:
                denom = jnp.float32(microbatch)
            grads = jax.tree_util.tree_map(lambda g: g / denom, g_sum)
            metrics = {
                k: (v if k == "loss_den" else v / denom)
                for k, v in m_sum.items()
            }
        else:
            rngs = {
                "flow": jax.random.fold_in(rng, 0),
                "dropout": jax.random.fold_in(rng, 1),
            }
            (_, out), grads = grad_fn(state.trainable, frozen, batch, rngs)
            metrics = dict(out)

        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        new_state = TrainState(
            step=state.step + 1, trainable=trainable, opt_state=opt_state
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step


def make_calm_eval_step(model: QwenCALM, task: str) -> Callable:
    def step(trainable: Dict, frozen: Dict, batch: Dict, rng) -> Dict:
        params = merge_partitions(trainable, frozen)
        rngs = {"flow": rng}
        if task == "tts":
            return model.apply(
                {"params": params},
                batch["text_ids"], batch["attention_mask"],
                batch["latents"], batch["audio_mask"],
                train=False, rngs=rngs, method=QwenCALM.forward_tts,
            )
        return model.apply(
            {"params": params},
            batch["text_ids"], batch["attention_mask"],
            batch["latents"], batch["audio_mask"], batch["labels"],
            train=False, rngs=rngs, method=QwenCALM.forward_asr,
        )

    return step


def make_vae_step(model: AcousticVAE, tx) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics). batch: {"mel"}."""

    def step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        rng = jax.random.fold_in(rng, state.step)
        rngs = {
            "noise": jax.random.fold_in(rng, 0),
            "dropout": jax.random.fold_in(rng, 1),
        }

        def loss_fn(trainable):
            params = merge_partitions(trainable, {})
            out = model.apply({"params": params}, batch["mel"], train=True,
                              rngs=rngs)
            return out["loss"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        metrics = {
            k: out[k]
            for k in ("loss", "rec_loss", "ssim_loss", "stft_loss", "kl_loss")
        }
        # latent-health stats (reference train_vae.py:134-147)
        metrics["mu_std"] = jnp.std(out["mu"])
        metrics["var_mean"] = jnp.mean(jnp.exp(out["logvar"]))
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(step=state.step + 1, trainable=trainable,
                       opt_state=opt_state),
            metrics,
        )

    return step


def shard_step(
    step_fn: Callable,
    mesh,
    state: TrainState,
    frozen: Optional[Dict] = None,
):
    """jit a step with DP batch + TP param + ZeRO opt-state sharding.

    Returns (jitted_step, sharded_state, sharded_frozen) — state and frozen
    params are placed according to the computed shardings up front so later
    step calls never re-transfer them.
    """
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0), state, frozen

    from jax.sharding import PartitionSpec as P

    repl = replicated(mesh)
    bsh = batch_sharding(mesh)
    # params: tensor-parallel over the "model" axis (replicated when the
    # mesh has no model axis); optimizer moments follow their param's TP
    # sharding, everything else is ZeRO-sharded over "data"
    train_sh = tp_shardings(state.trainable, mesh)

    def opt_spec(path, leaf):
        for entry in path:
            k = getattr(entry, "key", None)
            if isinstance(k, tuple) and k in train_sh:
                if train_sh[k].spec != P():
                    return train_sh[k]
                break
        return zero_leaf_spec(mesh, leaf)

    state_sh = TrainState(
        step=repl,
        trainable=train_sh,
        opt_state=jax.tree_util.tree_map_with_path(opt_spec, state.opt_state),
    )
    state = jax.device_put(state, state_sh)

    if frozen is not None:
        frozen_sh = tp_shardings(frozen, mesh)
        frozen = jax.device_put(frozen, frozen_sh)

        jitted = jax.jit(
            step_fn,
            in_shardings=(state_sh, frozen_sh, bsh, repl),
            out_shardings=(state_sh, None),
            donate_argnums=(0,),
        )
    else:
        def step2(state, batch, rng):
            return step_fn(state, batch, rng)

        jitted = jax.jit(
            step2,
            in_shardings=(state_sh, bsh, repl),
            out_shardings=(state_sh, None),
            donate_argnums=(0,),
        )
    return jitted, state, frozen
