"""Checkpoint resume through the training loop."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_calm_tpu.config import TrainingConfig, VAEModelConfig
from audio_calm_tpu.models.vae import AcousticVAE
from audio_calm_tpu.parallel.mesh import make_mesh
from audio_calm_tpu.train.loop import run_training
from audio_calm_tpu.train.optim import (
    make_optimizer, partition_params, vae_param_label,
)
from audio_calm_tpu.train.steps import init_train_state, make_vae_step, shard_step


def test_resume_continues_from_checkpoint(tmp_path):
    out = str(tmp_path / "run")
    cfg = VAEModelConfig(hidden_channels=32, latent_channels=8,
                         norm_num_groups=4, ssim_weight=0.0,
                         stft_loss_weight=0.0)
    model = AcousticVAE(cfg)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 24, 80)), jnp.float32
    )

    def build(resume):
        tcfg = TrainingConfig(
            learning_rate=1e-3, warmup_ratio=0.0, output_dir=out,
            logging_steps=100, save_steps=3, eval_steps=100,
            resume_from_checkpoint=out if resume else None,
        )
        params = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            mel, train=False,
        )["params"]
        trainable, _ = partition_params(params, vae_param_label)
        tx = make_optimizer(tcfg, trainable, vae_param_label, 20)
        state = init_train_state(trainable, tx)
        step, state, _ = shard_step(make_vae_step(model, tx), make_mesh(), state)
        return tcfg, step, state

    batches = iter(lambda: {"mel": mel}, None)
    tcfg, step, state = build(False)
    s = run_training(step, state, batches, tcfg, 6, jax.random.PRNGKey(0))
    assert int(s.step) == 6

    tcfg2, step2, state2 = build(True)
    s2 = run_training(step2, state2, batches, tcfg2, 10, jax.random.PRNGKey(0))
    assert int(s2.step) == 10
    # resumed params differ from fresh init (training progressed)
    _, _, fresh = build(False)
    k = next(iter(fresh.trainable))
    assert not np.allclose(np.asarray(fresh.trainable[k]),
                           np.asarray(s2.trainable[k]))
    # the init-template buffers must be freed on resume: the caller keeps a
    # Python reference to the passed-in state and it never flows through a
    # donating step, so without an explicit delete the dead init copy pins
    # param+opt HBM for the whole run (flagship resume OOM'd on this)
    assert all(leaf.is_deleted() for leaf in
               jax.tree.leaves((state2.trainable, state2.opt_state))
               if hasattr(leaf, "is_deleted"))


def test_exhaustion_checkpoints_final_state(tmp_path):
    """Epoch-bounded (packed) runs end on iterator exhaustion, usually off
    the save_steps grid: run_training must checkpoint the final step so
    resume / best-model retention see the last epoch's work."""
    out = str(tmp_path / "run")
    cfg = VAEModelConfig(hidden_channels=32, latent_channels=8,
                         norm_num_groups=4, ssim_weight=0.0,
                         stft_loss_weight=0.0)
    model = AcousticVAE(cfg)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 24, 80)), jnp.float32
    )
    tcfg = TrainingConfig(
        learning_rate=1e-3, warmup_ratio=0.0, output_dir=out,
        logging_steps=100, save_steps=10, eval_steps=100,
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        mel, train=False,
    )["params"]
    trainable, _ = partition_params(params, vae_param_label)
    tx = make_optimizer(tcfg, trainable, vae_param_label, 20)
    state = init_train_state(trainable, tx)
    step, state, _ = shard_step(make_vae_step(model, tx), make_mesh(), state)

    # 7 batches then exhaustion, far below the step cap and off the
    # save_steps=10 grid
    batches = iter([{"mel": mel}] * 7)
    s = run_training(step, state, batches, tcfg, 100, jax.random.PRNGKey(0))
    assert int(s.step) == 7

    from audio_calm_tpu.train.checkpoint import make_manager

    assert make_manager(out, 3).latest_step() == 7
