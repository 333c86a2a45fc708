"""Worker for the 2-process multi-host data-path test (not a test module).

Usage: python mp_worker_vae.py <coordinator> <process_id> <num_procs> \
           <data_dir> <out_file>

Each process: 2 local CPU devices, jax.distributed over localhost, dp mesh
over all 4 global devices; loads ONLY its shard of each global batch
(mel_batch_iterator process slicing), assembles global arrays with
shard_host_batch, and runs 3 sharded VAE train steps. Writes the final
loss so the parent can compare against a single-process reference run.
"""

import sys


def main():
    coord, pid, nproc, data_dir, out_file = sys.argv[1:6]
    pid, nproc = int(pid), int(nproc)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc

    import numpy as np

    from audio_calm_tpu.config import TrainingConfig, VAEModelConfig
    from audio_calm_tpu.data.collator import mel_batch_iterator
    from audio_calm_tpu.data.datasets import MelDataset
    from audio_calm_tpu.models.vae import AcousticVAE
    from audio_calm_tpu.parallel.mesh import make_mesh, shard_host_batch
    from audio_calm_tpu.train.optim import (
        make_optimizer, partition_params, vae_param_label,
    )
    from audio_calm_tpu.train.steps import (
        init_train_state, make_vae_step, shard_step,
    )

    ds = MelDataset(data_dir, "dev", crop_size=16, training=False)
    mesh = make_mesh()
    assert mesh.shape["data"] == 2 * nproc

    cfg = VAEModelConfig(hidden_channels=16, latent_channels=4,
                         norm_num_groups=4, ssim_weight=0.0,
                         stft_loss_weight=0.0)
    model = AcousticVAE(cfg)
    import jax.numpy as jnp

    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 80)), train=False,
    )["params"]
    trainable, _ = partition_params(params, vae_param_label)
    tcfg = TrainingConfig(learning_rate=1e-3, warmup_ratio=0.0)
    tx = make_optimizer(tcfg, trainable, vae_param_label, 10)
    state = init_train_state(trainable, tx)
    step, state, _ = shard_step(make_vae_step(model, tx), mesh, state)

    it = mel_batch_iterator(ds, 4, training=False, seed=0,
                            process_index=jax.process_index(),
                            process_count=nproc)
    loss = None
    for i, b in enumerate(it):
        if i >= 3:
            break
        assert b["mel"].shape[0] == 4 // nproc, b["mel"].shape
        gb = shard_host_batch(b, mesh)
        assert gb["mel"].shape[0] == 4  # global batch reassembled
        state, metrics = step(state, gb, jax.random.PRNGKey(0))
        loss = float(metrics["loss"])
    assert loss is not None and np.isfinite(loss)

    if jax.process_index() == 0:
        with open(out_file, "w") as f:
            f.write(repr(loss))
    print(f"[worker {pid}] done, loss={loss}")


if __name__ == "__main__":
    main()
