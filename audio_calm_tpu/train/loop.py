"""Generic training loop: logging, periodic eval, checkpointing.

The HF-Trainer-equivalent layer (reference train_calm.py / train_vae.py use
Trainer): step loop with loss-meter accumulation flushed every
logging_steps (reference CalmTrainer.log, train_calm.py:293-334), periodic
eval, orbax step checkpoints with retention + best tracking, JSONL metric
log (wandb optional).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from audio_calm_tpu.config import TrainingConfig
from audio_calm_tpu.train.checkpoint import make_manager, save_train_state
from audio_calm_tpu.train.steps import TrainState


class MetricLogger:
    def __init__(self, output_dir: str, run_name: str, report_to: str = "none",
                 primary: bool = True):
        """primary=False (non-zero processes of a multi-process run) makes
        log() a no-op: metric values are global replicated scalars, so one
        writer per shared filesystem is both sufficient and required (two
        processes appending the same metrics.jsonl interleave duplicates)."""
        os.makedirs(output_dir, exist_ok=True)
        self.primary = primary
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self.f = open(self.path, "a") if primary else None
        self.wandb = None
        if report_to == "wandb" and primary:
            try:
                import wandb

                self.wandb = wandb
                wandb.init(project=os.environ.get("WANDB_PROJECT", run_name),
                           name=run_name)
            except Exception:
                self.wandb = None

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        if not self.primary:
            return
        rec = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()
        if self.wandb:
            self.wandb.log(metrics, step=step)
        items = " ".join(f"{k}={v:.4f}" for k, v in rec.items() if k != "step")
        print(f"[step {step}] {items}", flush=True)


def run_training(
    step_fn: Callable,
    state: TrainState,
    batches,
    cfg: TrainingConfig,
    total_steps: int,
    rng: jax.Array,
    frozen: Optional[Dict] = None,
    eval_fn: Optional[Callable[[TrainState], Dict[str, float]]] = None,
    batch_filter: Optional[Callable[[Dict], Dict]] = None,
    step_selector: Optional[Callable[[Dict], Callable]] = None,
    step_flops: Optional[Callable[[Dict], float]] = None,
) -> TrainState:
    """Run up to total_steps steps.

    step_selector(batch) may return a different jitted step per batch (used
    for the tts/asr task routing); otherwise step_fn is used. Host-only batch
    keys (like "task") should be stripped by batch_filter.

    `batches` is either an iterable, or a callable `start_step -> iterable`:
    the callable form lets a resumed run reseed its data order by the
    restored step, so the epoch head is not replayed (the reference's HF
    Trainer default skips consumed batches; a step-folded seed is the
    shuffle-equivalent for our infinite samplers).

    step_flops(raw_batch) -> FLOPs of the step that batch dispatches
    (pre-filter, so it can route on batch["task"]). When provided, each
    logging flush carries achieved-MFU against the local chip's bf16 peak
    alongside samples/sec — the reference's one-shot thop probe
    (train_calm.py:521-567) made continuous. samples/sec counts this
    process's shard (leading dim of the first array leaf).

    NOTE — the passed-in `state` is CONSUMED: its device buffers are either
    donated to the first step (fresh runs) or explicitly deleted after a
    checkpoint restore replaces them (resume; see the delete below — a live
    init copy pins its full param+opt HBM for the whole run). Callers must
    not touch the input TrainState after this call; use the returned one.

    Best-checkpoint retention: when cfg.load_best_model_at_end, the orbax
    manager ranks steps by cfg.metric_for_best_model (eval loss when eval_fn
    runs, else running train loss) and the best surviving checkpoint is
    restored into the returned state — reference calm_config.yaml:130-137.
    """
    logger = MetricLogger(cfg.output_dir, cfg.run_name, cfg.report_to,
                          primary=jax.process_index() == 0)
    track_best = bool(cfg.load_best_model_at_end)
    metric_name = cfg.metric_for_best_model or "loss"
    manager = make_manager(
        cfg.output_dir, cfg.save_total_limit,
        best_metric=metric_name if track_best else None,
    )

    # resume (reference trainer.train(resume_from_checkpoint=...),
    # train_calm.py:627-630): restore trainable + optimizer state and
    # continue from the recorded step
    if cfg.resume_from_checkpoint:
        from audio_calm_tpu.train.checkpoint import restore_train_state

        resume_mgr = (
            manager
            if os.path.abspath(cfg.resume_from_checkpoint)
            == os.path.abspath(cfg.output_dir)
            else make_manager(cfg.resume_from_checkpoint, cfg.save_total_limit,
                              best_metric=None)
        )
        if resume_mgr.latest_step() is not None:
            trainable, opt_state, step0 = restore_train_state(
                resume_mgr, state.trainable, state.opt_state
            )
            # Free the init-template device buffers NOW. The caller still
            # holds a Python reference to the passed-in TrainState, and on
            # resume those arrays never flow through a donating step call,
            # so without an explicit delete the dead init copy pins its
            # full param+opt HBM (~3 GB at flagship) for the entire run —
            # observed as a ResourceExhausted on the first resumed step.
            # (From scratch the same buffers ARE the step-1 input and
            # donation frees them.)
            for leaf in jax.tree.leaves((state.trainable, state.opt_state)):
                if hasattr(leaf, "delete"):
                    leaf.delete()
            # the first jitted step re-places these per its in_shardings
            state = TrainState(
                step=jax.numpy.asarray(step0, jax.numpy.int32),
                trainable=trainable,
                opt_state=opt_state,
            )
            print(f"resumed from step {step0}")
    if callable(batches):
        batches = batches(int(state.step))
    meters: Dict[str, float] = {}
    counts: Dict[str, int] = {}
    last_tracked: Optional[float] = None  # best-metric value for retention
    last_train_loss: Optional[float] = None
    t_last = time.perf_counter()
    step_idx = int(state.step)
    start_step = step_idx
    saved_at = None
    peak_flops = None
    if step_flops is not None:
        from audio_calm_tpu.utils.profiling import device_peak_flops

        peak_flops = device_peak_flops()
    window_samples = 0
    window_flops = 0.0

    def _prepared():
        """Per raw batch: select the step fn, account samples/FLOPs, and run
        batch_filter (which device_puts the arrays). Pulled ONE AHEAD of the
        dispatch loop so the next batch's host work + host->device upload
        overlap the current step's device compute. Through the axon tunnel
        the upload is hundreds of ms per step (measured: the loop ran at
        ~0.64 s/step predicted vs ~1.05 s observed before this); a
        colocated host overlaps it for free, a tunnel does not."""
        for raw in batches:
            fn = step_selector(raw) if step_selector else step_fn
            # packed batches carry the true utterance count (their leading
            # dim is packed rows, not samples)
            n = raw.get("n_samples") or next(
                (v.shape[0] for v in raw.values()
                 if getattr(v, "ndim", 0) >= 1), 0
            )
            fl = step_flops(raw) if step_flops is not None else 0.0
            yield fn, n, fl, (batch_filter(raw) if batch_filter else raw)

    # Metric harvest is DEFERRED: each step's metrics dict (device scalars)
    # is queued un-read and drained in one stacked transfer — per-scalar
    # float() costs a full tunnel round trip (~26 ms x ~6 metrics x every
    # step); one stacked readback per <=8 steps amortizes it to ~1%.
    # Multi-process runs stack UNDER JIT: eager ops on global replicated
    # arrays are not portable, but every process executes the same jitted
    # stack in lockstep (the drain cadence is step-deterministic), and the
    # replicated output is read from the local shard — still one transfer
    # per drain, no collective, no per-scalar round trips.
    pending_metrics = []
    _multi = jax.process_count() > 1
    _stack = jax.jit(lambda vs: jax.numpy.stack(vs))

    def harvest():
        nonlocal last_train_loss
        if not pending_metrics:
            return
        keys, vals = [], []
        for md in pending_metrics:
            for k, v in md.items():
                keys.append(k)
                vals.append(v)
        pending_metrics.clear()
        if not vals:
            return
        # pad to a few static shapes so the tiny stack program compiles
        # once per size class, not once per harvest
        pad = (-len(vals)) % 32
        out = _stack(vals + [vals[0]] * pad)
        if _multi:
            out = out.addressable_data(0)
        host = np.asarray(out)[:len(keys)].tolist()
        for k, v in zip(keys, host):
            if k == "loss":
                last_train_loss = v
            if v != 0.0 or k in ("loss", "grad_norm"):
                meters[k] = meters.get(k, 0.0) + v
                counts[k] = counts.get(k, 0) + 1

    it = _prepared()
    nxt = next(it, None)
    while nxt is not None:
        if step_idx >= total_steps:
            break
        fn, n_samples, fl, batch = nxt
        window_samples += n_samples
        window_flops += fl
        if frozen is not None:
            state, metrics = fn(state, frozen, batch, rng)
        else:
            state, metrics = fn(state, batch, rng)
        step_idx += 1
        # pull the NEXT prepared batch now: its packing/tokenization and
        # device upload run while the device executes the step above
        nxt = next(it, None)

        pending_metrics.append(metrics)
        drain_depth = max(1, getattr(cfg, "metrics_drain_steps", 4))
        if (len(pending_metrics) >= drain_depth
                or step_idx % cfg.logging_steps == 0):
            # drain regularly: the harvest readback syncs the dispatch
            # queue, bounding the device-resident input buffers it pins.
            # 8-deep measured an eventual ResourceExhausted at flagship
            # geometry (~200 MB of pinned batches against a thin HBM
            # margin, OOM after ~700 steps); 4-deep (~100 MB) holds and
            # still amortizes the ~52 ms stacked readback to ~13 ms/step
            # (cfg.metrics_drain_steps).
            harvest()

        if step_idx % cfg.logging_steps == 0:
            now = time.perf_counter()
            dt = now - t_last
            out = {k: meters[k] / max(counts.get(k, 1), 1) for k in meters}
            out["steps_per_sec"] = cfg.logging_steps / dt
            out["samples_per_sec"] = window_samples / dt
            if window_flops and peak_flops:
                out["mfu_pct"] = 100.0 * window_flops / dt / peak_flops
            logger.log(step_idx, out)
            meters, counts = {}, {}
            window_samples, window_flops = 0, 0.0
            t_last = now

        if eval_fn is not None and step_idx % cfg.eval_steps == 0:
            eval_metrics = eval_fn(state)
            if eval_metrics:
                logger.log(
                    step_idx, {f"eval_{k}": v for k, v in eval_metrics.items()}
                )
                if metric_name in eval_metrics:
                    last_tracked = float(eval_metrics[metric_name])

        if step_idx % cfg.save_steps == 0 or step_idx == total_steps:
            harvest()  # saves track last_train_loss; make it current
            tracked = last_tracked if last_tracked is not None else last_train_loss
            save_train_state(
                manager, step_idx, state.trainable, state.opt_state,
                metrics=(
                    {metric_name: float(tracked)}
                    if track_best and tracked is not None else None
                ),
            )
            saved_at = step_idx
    harvest()
    # epoch-bounded (packed) runs end on iterator exhaustion, usually off
    # the save_steps grid — checkpoint the final state so resume/best-model
    # retention see it
    if step_idx != saved_at and step_idx > start_step:
        tracked = last_tracked if last_tracked is not None else last_train_loss
        save_train_state(
            manager, step_idx, state.trainable, state.opt_state,
            metrics=(
                {metric_name: float(tracked)}
                if track_best and tracked is not None else None
            ),
        )
    manager.wait_until_finished()

    # load_best_model_at_end (reference calm_config.yaml:135-137)
    if track_best:
        best = manager.best_step()
        if best is not None and best != int(state.step):
            from audio_calm_tpu.train.checkpoint import restore_train_state

            trainable, opt_state, _ = restore_train_state(
                manager, state.trainable, state.opt_state, step=best
            )
            state = TrainState(step=state.step, trainable=trainable,
                               opt_state=opt_state)
            print(f"loaded best checkpoint (step {best})")
    return state
