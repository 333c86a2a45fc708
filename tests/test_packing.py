"""ASR sequence packing: several [audio|SOA|prompt] segments per LLM row.

The packed forward (QwenCALM.forward_asr_packed) must equal forward_asr run
on each utterance solo — block-diagonal attention + per-segment RoPE
positions make packing invisible to the model (the reference pads every row
to the max grid instead, train/train_calm.py:193-221). The collator's
pack_asr_window builds the static row-local index layout.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_calm_tpu.config import CALMModelConfig, LoRAConfig, Qwen2Config
from audio_calm_tpu.data.collator import (
    calm_batch_iterator,
    pack_asr_window,
    pack_tts_window,
)
from audio_calm_tpu.data.datasets import CalmExample
from audio_calm_tpu.models.calm import QwenCALM

PROMPT = np.asarray([5, 6, 7], np.int32)


def _examples(lengths, latent_dim=8, label_lens=None, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i, L in enumerate(lengths):
        n_lab = (label_lens or [4] * len(lengths))[i]
        out.append(CalmExample(
            input_ids=PROMPT.copy(),
            labels=rng.integers(1, 200, (n_lab,)).astype(np.int32),
            audio=rng.standard_normal((L, latent_dim)).astype(np.float32),
            mode="asr",
        ))
    return out


def test_pack_asr_window_layout_invariants():
    """Every example lands in exactly one segment (or the leftover); rows
    respect the token budget and segment cap; the gather/ctx index pairs
    round-trip; positions restart per segment."""
    exs = _examples([16, 4, 10, 7, 15, 3, 2, 12], seed=1)
    rows, row_len, segs, L = 2, 60, 3, 16
    batch, left = pack_asr_window(
        exs, PROMPT, rows, row_len, segs, L, 8, max_text_len=6)
    P = len(PROMPT)
    packed = 0
    for r in range(rows):
        used = 0
        for s in range(segs):
            n = int(batch["latent_mask"][r, s].sum())
            if n == 0:
                continue
            packed += 1
            used += n + 1 + P
            # the segment's audio frames sit contiguously in the row
            ctx = batch["ctx_idx"][r, s, :n]
            assert (np.diff(ctx) == 1).all()
            assert (batch["kind"][r, ctx] == 1).all()
            assert (batch["gather_idx"][r, ctx] == s * L + np.arange(n)).all()
            # [audio | SOA | prompt] with within-segment positions
            t0 = ctx[0]
            assert batch["kind"][r, t0 + n] == 2
            assert (batch["kind"][r, t0 + n + 1 : t0 + n + 1 + P] == 3).all()
            assert (batch["tok_ids"][r, t0 + n + 1 : t0 + n + 1 + P]
                    == PROMPT).all()
            span = slice(t0, t0 + n + 1 + P)
            assert (batch["segment_ids"][r, span] == s + 1).all()
            assert (batch["position_ids"][r, span]
                    == np.arange(n + 1 + P)).all()
        assert used <= row_len
        # pad region is fully zeroed metadata
        pad = batch["segment_ids"][r] == 0
        assert (batch["kind"][r, pad] == 0).all()
    assert packed + len(left) == len(exs)
    # FFD packs the window tightly: with 8 short examples and capacity for
    # 6 segments the two longest-per-row fill first
    assert packed == rows * segs
    assert len(left) == 2


def test_pack_rejects_too_small_rows():
    with pytest.raises(ValueError, match="asr_pack_len"):
        pack_asr_window(_examples([4]), PROMPT, 1, 10, 2, 16, 8, 6)


@pytest.fixture(scope="module")
def tiny_calm():
    cfg = CALMModelConfig(
        latent_dim=8,
        max_audio_len=16,
        max_text_len=6,
        tts_flow_hidden_dim=32,
        tts_flow_num_layers=2,
        asr_flow_hidden_dim=32,
        asr_flow_num_layers=2,
        flow_num_heads=4,
        qwen=Qwen2Config.tiny(vocab_size=256),
        lora=LoRAConfig(rank=2, alpha=4, dropout=0.0),
        latent_mean=0.04,
        latent_std=1.19,
    )
    model = QwenCALM(cfg, dtype=jnp.float32)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "flow": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    B, T_txt, T_aud = 2, 3, 16
    params = model.init(
        rngs,
        jnp.zeros((B, T_txt), jnp.int32),
        jnp.ones((B, T_txt), jnp.int32),
        jnp.zeros((B, T_aud, 8), jnp.float32),
        jnp.ones((B, T_aud), jnp.int32),
        jnp.zeros((B, 6), jnp.int32),
        train=False,
        method=QwenCALM.forward_asr,
    )["params"]
    # the DiT out_proj is zero-init, which would make the flow loss blind
    # to the condition (pred_v = 0 regardless) — perturb the whole ASR head
    # so any packed-vs-solo context difference shows up in the loss
    leaves, treedef = jax.tree_util.tree_flatten(params["asr_flow_head"])
    key = jax.random.PRNGKey(7)
    noised = [
        l + 0.02 * jax.random.normal(jax.random.fold_in(key, i), l.shape, l.dtype)
        for i, l in enumerate(leaves)
    ]
    params["asr_flow_head"] = jax.tree_util.tree_unflatten(treedef, noised)
    return model, {"params": params}


def test_forward_asr_packed_matches_solo(tiny_calm):
    """Packed loss == solo forward_asr loss on the same utterances in the
    same flattened order (fp32, same rng => identical flow-time draws)."""
    model, variables = tiny_calm
    rows, segs, L = 2, 2, 16
    exs = _examples([9, 6, 12, 3], label_lens=[4, 2, 5, 3], seed=3)
    packed, left = pack_asr_window(
        exs, PROMPT, rows, row_len=2 * (16 + 1 + 3), segments=segs,
        seg_frames=L, latent_dim=8, max_text_len=6)
    assert not left
    assert int((packed["latent_mask"].sum(-1) > 0).sum()) == 4

    B = rows * segs
    solo = dict(
        text_ids=np.tile(PROMPT, (B, 1)),
        attention_mask=np.ones((B, len(PROMPT)), np.int32),
        latents=packed["latents"].reshape(B, L, 8),
        audio_mask=packed["latent_mask"].reshape(B, L),
        labels=packed["labels"].reshape(B, -1),
    )

    flow = jax.random.PRNGKey(11)
    out_solo = model.apply(
        variables, solo["text_ids"], solo["attention_mask"],
        solo["latents"], solo["audio_mask"], solo["labels"],
        train=False, rngs={"flow": flow}, method=QwenCALM.forward_asr,
    )
    out_packed = model.apply(
        variables, packed["latents"], packed["latent_mask"],
        packed["labels"], packed["tok_ids"], packed["kind"],
        packed["gather_idx"], packed["segment_ids"],
        packed["position_ids"], packed["ctx_idx"],
        train=False, rngs={"flow": flow}, method=QwenCALM.forward_asr_packed,
    )
    a, b = float(out_solo["loss_asr"]), float(out_packed["loss_asr"])
    assert a == pytest.approx(b, rel=2e-5), (a, b)

    # sensitivity control: corrupting one segment's context gather must
    # move the loss, or the equality above proves nothing
    bad = dict(packed)
    ci = packed["ctx_idx"].copy()
    ci[0, 0] = (ci[0, 0] + 5) % (2 * (16 + 1 + 3))
    bad["ctx_idx"] = ci
    out_bad = model.apply(
        variables, bad["latents"], bad["latent_mask"], bad["labels"],
        bad["tok_ids"], bad["kind"], bad["gather_idx"], bad["segment_ids"],
        bad["position_ids"], bad["ctx_idx"],
        train=False, rngs={"flow": flow}, method=QwenCALM.forward_asr_packed,
    )
    assert abs(float(out_bad["loss_asr"]) - b) > 1e-6


def test_forward_asr_packed_with_dummy_slots(tiny_calm):
    """Underfull windows leave empty segments; they contribute nothing to
    the loss (global mask normalization) and never NaN."""
    model, variables = tiny_calm
    exs = _examples([9, 6, 12], seed=4)  # 3 utterances in 4 slots
    packed, left = pack_asr_window(
        exs, PROMPT, 2, row_len=2 * (16 + 1 + 3), segments=2,
        seg_frames=16, latent_dim=8, max_text_len=6)
    assert not left
    out = model.apply(
        variables, packed["latents"], packed["latent_mask"],
        packed["labels"], packed["tok_ids"], packed["kind"],
        packed["gather_idx"], packed["segment_ids"],
        packed["position_ids"], packed["ctx_idx"],
        train=False, rngs={"flow": jax.random.PRNGKey(11)},
        method=QwenCALM.forward_asr_packed,
    )
    assert np.isfinite(float(out["loss_asr"]))


class _PackDataset:
    """In-memory CalmDataset stand-in; audio value idx+1 identifies items."""

    def __init__(self, asr_lens, max_text_len=6, max_audio_len=16):
        self.max_text_len = max_text_len
        self.max_audio_len = max_audio_len
        self.tts_items = []
        self.asr_items = list(asr_lens)
        self.asr_prompt_ids = PROMPT

    def get(self, mode, idx):
        L = self.asr_items[idx]
        return CalmExample(
            input_ids=PROMPT.copy(),
            labels=np.asarray([idx % 5 + 1], np.int32),
            audio=np.full((L, 8), idx + 1, np.float32),
            mode="asr",
        )


def test_packed_iterator_coverage_and_task():
    """The packing iterator emits task='asr_packed' batches; every drawn
    example lands in exactly one segment across the epoch (window leftovers
    carry instead of dropping)."""
    rng = np.random.default_rng(5)
    lens = [int(x) for x in rng.integers(2, 17, size=40)]
    ds = _PackDataset(lens)
    seen = []
    for b in calm_batch_iterator(
        ds, batch_size=4, pad_token_id=0, latent_dim=8, task_prob_tts=0.0,
        training=False, seed=0, epochs=1,
        asr_pack_rows=2, asr_pack_len=42, asr_pack_segments=3,
    ):
        assert b["task"] == "asr_packed"
        ids = b["latents"][..., 0, 0][b["latent_mask"][..., 0] > 0]
        seen.extend(int(v) - 1 for v in ids)
    assert len(seen) == len(set(seen))
    # tail pools are emitted underfull; only undrawn order tail may drop
    assert len(seen) >= 40 - 2 * 3
    # identified examples really are distinct dataset items
    assert set(seen) <= set(range(40))


def test_packed_train_step_microbatch():
    """make_calm_step(task='asr_packed', microbatch=2): the generic axis-0
    split applies to the row-local packed layout; loss finite, grads move
    the trainable params."""
    import optax

    from audio_calm_tpu.train.optim import partition_params
    from audio_calm_tpu.train.steps import init_train_state, make_calm_step

    cfg = CALMModelConfig(
        latent_dim=8, max_audio_len=16, max_text_len=6,
        tts_flow_hidden_dim=32, tts_flow_num_layers=1,
        asr_flow_hidden_dim=32, asr_flow_num_layers=1, flow_num_heads=4,
        qwen=Qwen2Config.tiny(vocab_size=256),
        lora=LoRAConfig(rank=2, alpha=4, dropout=0.0),
    )
    model = QwenCALM(cfg, dtype=jnp.float32)
    exs = _examples([9, 6, 12, 3, 7, 5, 2, 11], seed=6)
    packed, _ = pack_asr_window(
        exs, PROMPT, 4, row_len=40, segments=2, seg_frames=16,
        latent_dim=8, max_text_len=6)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "flow": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        packed["latents"], packed["latent_mask"], packed["labels"],
        packed["tok_ids"], packed["kind"], packed["gather_idx"],
        packed["segment_ids"], packed["position_ids"], packed["ctx_idx"],
        train=False, method=QwenCALM.forward_asr_packed,
    )["params"]
    trainable, frozen = partition_params(
        params, lambda k: "train" if k[0] != "llm" else "freeze")
    tx = optax.adam(1e-3)
    state = init_train_state(trainable, tx)
    step = jax.jit(make_calm_step(model, tx, "asr_packed", microbatch=2))
    batch = {k: jnp.asarray(v) for k, v in packed.items()}
    new_state, metrics = step(state, frozen, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0


def test_packed_training_trajectory_matches_solo():
    """Packed and solo ASR TRAINING trajectories match step-for-step (same
    utterances, same rng): forward equality alone could hide a backward
    bug; 12 optimizer steps through both programs agree to fp32 drift."""
    import optax

    from audio_calm_tpu.train.optim import partition_params
    from audio_calm_tpu.train.steps import init_train_state, make_calm_step

    exs = _examples([9, 6, 12, 3, 7, 5, 2, 11], label_lens=[3] * 8, seed=8)
    packed, left = pack_asr_window(
        exs, PROMPT, rows=4, row_len=40, segments=2, seg_frames=16,
        latent_dim=8, max_text_len=6)
    assert not left
    B = 8
    solo = dict(
        text_ids=jnp.asarray(np.tile(PROMPT, (B, 1))),
        attention_mask=jnp.ones((B, len(PROMPT)), jnp.int32),
        latents=jnp.asarray(packed["latents"].reshape(B, 16, 8)),
        audio_mask=jnp.asarray(packed["latent_mask"].reshape(B, 16)),
        labels=jnp.asarray(packed["labels"].reshape(B, -1)),
    )
    cfg = CALMModelConfig(
        latent_dim=8, max_audio_len=16, max_text_len=6,
        tts_flow_hidden_dim=32, tts_flow_num_layers=1,
        asr_flow_hidden_dim=32, asr_flow_num_layers=1, flow_num_heads=4,
        qwen=Qwen2Config.tiny(vocab_size=256),
        lora=LoRAConfig(rank=2, alpha=4, dropout=0.0),
        cfg_dropout_prob=0.0,
    )
    model = QwenCALM(cfg, dtype=jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "flow": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        solo["text_ids"], solo["attention_mask"], solo["latents"],
        solo["audio_mask"], solo["labels"],
        train=False, method=QwenCALM.forward_asr)["params"]

    def run(task, batch):
        trainable, frozen = partition_params(
            params, lambda k: "train" if k[0] != "llm" else "freeze")
        tx = optax.adam(3e-3)
        state = init_train_state(trainable, tx)
        step = jax.jit(make_calm_step(model, tx, task))
        losses = []
        for _ in range(12):
            state, m = step(state, frozen, batch, jax.random.PRNGKey(42))
            losses.append(float(m["loss_asr"]))
        return np.asarray(losses)

    ls = run("asr", solo)
    lp = run("asr_packed", {k: jnp.asarray(v) for k, v in packed.items()})
    assert np.max(np.abs(ls - lp)) < 5e-3, (ls, lp)


def test_packed_microbatch_weights_slices_by_valid_tokens():
    """FFD fills rows front-to-back, so a window's tail microbatch slice
    can be ALL dummy slots. The packed scan must weight slice grads and
    losses by their masked-mean denominators (mean-of-slice-means halved
    the loss and the gradient whenever the tail slice was empty): with
    slice 1 entirely dummy, the step's loss/grads equal slice 0's alone."""
    import optax

    from audio_calm_tpu.train.optim import partition_params
    from audio_calm_tpu.train.steps import init_train_state, make_calm_step

    cfg = CALMModelConfig(
        latent_dim=8, max_audio_len=16, max_text_len=6,
        tts_flow_hidden_dim=32, tts_flow_num_layers=1,
        asr_flow_hidden_dim=32, asr_flow_num_layers=1, flow_num_heads=4,
        qwen=Qwen2Config.tiny(vocab_size=256),
        lora=LoRAConfig(rank=2, alpha=4, dropout=0.0),
        cfg_dropout_prob=0.0,
    )
    model = QwenCALM(cfg, dtype=jnp.float32)
    # 4 utterances FFD-pack into rows 0-1; rows 2-3 stay dummy, so the
    # microbatch=2 split puts ALL real content in slice 0
    exs = _examples([9, 6, 12, 3], seed=11)
    packed, left = pack_asr_window(
        exs, PROMPT, rows=4, row_len=40, segments=2, seg_frames=16,
        latent_dim=8, max_text_len=6)
    assert not left
    real_rows = packed["latent_mask"].reshape(4, -1).sum(-1) > 0
    assert list(real_rows) == [True, True, False, False]

    params = model.init(
        {"params": jax.random.PRNGKey(0), "flow": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        packed["latents"], packed["latent_mask"], packed["labels"],
        packed["tok_ids"], packed["kind"], packed["gather_idx"],
        packed["segment_ids"], packed["position_ids"], packed["ctx_idx"],
        train=False, method=QwenCALM.forward_asr_packed,
    )["params"]
    trainable, frozen = partition_params(
        params, lambda k: "train" if k[0] != "llm" else "freeze")
    tx = optax.adam(1e-3)
    state = init_train_state(trainable, tx)
    step = jax.jit(make_calm_step(model, tx, "asr_packed", microbatch=2))
    batch = {k: jnp.asarray(v) for k, v in packed.items()}
    rng = jax.random.PRNGKey(9)
    _, metrics = step(state, frozen, batch, rng)

    # manual slice-0 forward/backward with the body's exact rng folds
    r = jax.random.fold_in(jax.random.fold_in(rng, 0), 0)  # step 0, slice 0
    rngs = {"flow": jax.random.fold_in(r, 0),
            "dropout": jax.random.fold_in(r, 1)}
    slice0 = {k: v[:2] for k, v in batch.items()}

    def loss0(tr):
        from audio_calm_tpu.train.optim import merge_partitions
        out = model.apply(
            {"params": merge_partitions(tr, frozen)},
            slice0["latents"], slice0["latent_mask"], slice0["labels"],
            slice0["tok_ids"], slice0["kind"], slice0["gather_idx"],
            slice0["segment_ids"], slice0["position_ids"],
            slice0["ctx_idx"],
            train=True, rngs=rngs, method=QwenCALM.forward_asr_packed,
        )
        return out["loss"], out

    (l0, out0), g0 = jax.value_and_grad(loss0, has_aux=True)(trainable)
    assert float(out0["loss_den"]) > 0
    np.testing.assert_allclose(float(metrics["loss"]), float(l0), rtol=1e-5)
    np.testing.assert_allclose(
        float(metrics["loss_den"]), float(out0["loss_den"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(metrics["grad_norm"]), float(optax.global_norm(g0)),
        rtol=1e-4)


# ---------------------------------------------------------------------------
# TTS packing: several [text|SOA] segments per LLM row; the MAS/duration/flow
# tail still sees each utterance solo (per-slot audio grid)
# ---------------------------------------------------------------------------

def _tts_examples(text_lens, audio_lens, latent_dim=8, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for tl, al in zip(text_lens, audio_lens):
        out.append(CalmExample(
            input_ids=rng.integers(1, 200, (tl,)).astype(np.int32),
            labels=np.zeros((0,), np.int32),
            audio=rng.standard_normal((al, latent_dim)).astype(np.float32),
            mode="tts",
        ))
    return out


def test_pack_tts_window_layout_invariants():
    """Each packed segment is a contiguous [text|SOA] span with restarting
    positions; the ctx/soa gathers address it; rows respect the budget."""
    exs = _tts_examples([5, 3, 6, 2, 4, 6, 1, 5], [9, 6, 12, 3, 7, 5, 2, 11],
                        seed=1)
    rows, row_len, segs = 2, 18, 3
    batch, left = pack_tts_window(exs, rows, row_len, segs, 16, 8,
                                  max_text_len=6)
    packed = 0
    for r in range(rows):
        used = 0
        for s in range(segs):
            n = int(batch["text_mask"][r, s].sum())
            if n == 0:
                # dummy slot: gathers point at the appended zero position
                assert (batch["ctx_idx"][r, s] == row_len).all()
                assert batch["soa_idx"][r, s] == row_len
                continue
            packed += 1
            used += n + 1
            ctx = batch["ctx_idx"][r, s, :n]
            assert (np.diff(ctx) == 1).all()
            assert (batch["kind"][r, ctx] == 1).all()
            # pad tail of the ctx gather points at the zero position
            assert (batch["ctx_idx"][r, s, n:] == row_len).all()
            t0 = ctx[0]
            assert batch["kind"][r, t0 + n] == 2  # SOA after the text
            assert batch["soa_idx"][r, s] == t0 + n
            span = slice(t0, t0 + n + 1)
            assert (batch["segment_ids"][r, span] == s + 1).all()
            assert (batch["position_ids"][r, span] == np.arange(n + 1)).all()
        assert used <= row_len
        pad = batch["segment_ids"][r] == 0
        assert (batch["kind"][r, pad] == 0).all()
    assert packed + len(left) == len(exs)
    assert packed == rows * segs  # FFD fills all 6 slots from 8 candidates
    assert len(left) == 2
    # per-slot audio landed on the t_aud grid with its own mask
    assert batch["latents"].shape == (rows, segs, 16, 8)
    assert (batch["audio_mask"].sum(-1) <= 16).all()


def test_pack_tts_rejects_too_small_rows():
    with pytest.raises(ValueError, match="tts_pack_len"):
        pack_tts_window(_tts_examples([4], [8]), 1, 6, 2, 16, 8,
                        max_text_len=6)


@pytest.fixture(scope="module")
def tiny_calm_tts():
    cfg = CALMModelConfig(
        latent_dim=8,
        max_audio_len=16,
        max_text_len=6,
        tts_flow_hidden_dim=32,
        tts_flow_num_layers=2,
        asr_flow_hidden_dim=32,
        asr_flow_num_layers=2,
        flow_num_heads=4,
        qwen=Qwen2Config.tiny(vocab_size=256),
        lora=LoRAConfig(rank=2, alpha=4, dropout=0.0),
        latent_mean=0.04,
        latent_std=1.19,
    )
    model = QwenCALM(cfg, dtype=jnp.float32)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "flow": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
    }
    B, T_txt, T_aud = 2, 6, 16
    params = model.init(
        rngs,
        jnp.zeros((B, T_txt), jnp.int32),
        jnp.ones((B, T_txt), jnp.int32),
        jnp.zeros((B, T_aud, 8), jnp.float32),
        jnp.ones((B, T_aud), jnp.int32),
        train=False,
        method=QwenCALM.forward_tts,
    )["params"]
    # zero-init DiT out_proj would make the flow loss blind to the
    # condition; perturb the TTS head so packing bugs show in the loss
    leaves, treedef = jax.tree_util.tree_flatten(params["tts_flow_head"])
    key = jax.random.PRNGKey(7)
    noised = [
        l + 0.02 * jax.random.normal(jax.random.fold_in(key, i), l.shape, l.dtype)
        for i, l in enumerate(leaves)
    ]
    params["tts_flow_head"] = jax.tree_util.tree_unflatten(treedef, noised)
    return model, {"params": params}


def _solo_from_packed_tts(packed, max_text_len):
    """Reconstruct the per-utterance solo batch in slot order."""
    R, S, T_aud, D = packed["latents"].shape
    B = R * S
    text_ids = np.zeros((B, max_text_len), np.int32)
    for r in range(R):
        for s in range(S):
            n = int(packed["text_mask"][r, s].sum())
            text_ids[r * S + s, :n] = packed["tok_ids"][
                r, packed["ctx_idx"][r, s, :n]]
    return dict(
        text_ids=text_ids,
        attention_mask=packed["text_mask"].reshape(B, max_text_len),
        latents=packed["latents"].reshape(B, T_aud, D),
        audio_mask=packed["audio_mask"].reshape(B, T_aud),
    )


def test_forward_tts_packed_matches_solo(tiny_calm_tts):
    """Packed losses (all three terms) == solo forward_tts on the same
    utterances in slot order (fp32, same rng => identical flow draws;
    identical masked sims => identical MAS alignment)."""
    model, variables = tiny_calm_tts
    exs = _tts_examples([5, 3, 6, 2], [9, 6, 12, 3], seed=3)
    packed, left = pack_tts_window(exs, 2, 14, 2, 16, 8, max_text_len=6)
    assert not left
    solo = _solo_from_packed_tts(packed, 6)

    flow = jax.random.PRNGKey(11)
    out_solo = model.apply(
        variables, solo["text_ids"], solo["attention_mask"],
        solo["latents"], solo["audio_mask"],
        train=False, rngs={"flow": flow}, method=QwenCALM.forward_tts,
    )
    out_packed = model.apply(
        variables, packed["latents"], packed["audio_mask"],
        packed["text_mask"], packed["tok_ids"], packed["kind"],
        packed["segment_ids"], packed["position_ids"],
        packed["ctx_idx"], packed["soa_idx"],
        train=False, rngs={"flow": flow},
        method=QwenCALM.forward_tts_packed,
    )
    for k in ("loss", "loss_tts", "loss_len", "loss_dur"):
        a, b = float(out_solo[k]), float(out_packed[k])
        assert a == pytest.approx(b, rel=1e-4), (k, a, b)
    assert float(out_packed["loss_den"]) == 4.0

    # sensitivity control: corrupting one segment's context gather must
    # move the loss, or the equality above proves nothing
    bad = dict(packed)
    ci = packed["ctx_idx"].copy()
    ci[0, 0] = (ci[0, 0] + 5) % 14
    bad["ctx_idx"] = ci
    out_bad = model.apply(
        variables, bad["latents"], bad["audio_mask"], bad["text_mask"],
        bad["tok_ids"], bad["kind"], bad["segment_ids"],
        bad["position_ids"], bad["ctx_idx"], bad["soa_idx"],
        train=False, rngs={"flow": flow},
        method=QwenCALM.forward_tts_packed,
    )
    assert abs(float(out_bad["loss"]) - float(out_packed["loss"])) > 1e-6


def test_forward_tts_packed_with_dummy_slots(tiny_calm_tts):
    """Underfull windows leave empty segments: finite loss, loss_den counts
    only real utterances, and the loss equals the same 3 utterances packed
    without the dummy slot (global denominators ignore dummies)."""
    model, variables = tiny_calm_tts
    exs = _tts_examples([5, 3, 6], [9, 6, 12], seed=4)
    packed, left = pack_tts_window(exs, 2, 14, 2, 16, 8, max_text_len=6)
    assert not left
    assert int(packed["text_mask"].any(-1).sum()) == 3
    out = model.apply(
        variables, packed["latents"], packed["audio_mask"],
        packed["text_mask"], packed["tok_ids"], packed["kind"],
        packed["segment_ids"], packed["position_ids"],
        packed["ctx_idx"], packed["soa_idx"],
        train=False, rngs={"flow": jax.random.PRNGKey(11)},
        method=QwenCALM.forward_tts_packed,
    )
    assert np.isfinite(float(out["loss"]))
    assert float(out["loss_den"]) == 3.0


class _TTSPackDataset:
    """In-memory stand-in; audio value idx+1 identifies items."""

    def __init__(self, audio_lens, text_lens, max_text_len=6,
                 max_audio_len=16):
        self.max_text_len = max_text_len
        self.max_audio_len = max_audio_len
        self.tts_items = list(audio_lens)
        self.asr_items = []
        self.text_lens = list(text_lens)
        self.asr_prompt_ids = PROMPT

    def get(self, mode, idx):
        return CalmExample(
            input_ids=np.full((self.text_lens[idx],), idx % 7 + 1, np.int32),
            labels=np.zeros((0,), np.int32),
            audio=np.full((self.tts_items[idx], 8), idx + 1, np.float32),
            mode="tts",
        )


def test_packed_tts_iterator_coverage_buckets():
    """The iterator emits task='tts_packed' batches; every drawn example
    lands in exactly one slot across the epoch; with buckets + grouping the
    per-group audio grid is the smallest bucket that fits."""
    rng = np.random.default_rng(5)
    a_lens = [int(x) for x in rng.integers(2, 17, size=40)]
    t_lens = [int(x) for x in rng.integers(1, 7, size=40)]
    ds = _TTSPackDataset(a_lens, t_lens)
    seen = []
    for b in calm_batch_iterator(
        ds, batch_size=4, pad_token_id=0, latent_dim=8, task_prob_tts=1.0,
        training=False, seed=0, epochs=1,
        audio_buckets=[4, 8, 16], length_group_window=2,
        tts_pack_rows=2, tts_pack_len=20, tts_pack_segments=3,
    ):
        assert b["task"] == "tts_packed"
        t_aud = b["latents"].shape[2]
        assert t_aud in (4, 8, 16)
        ids = b["latents"][..., 0, 0][b["audio_mask"][..., 0] > 0]
        for v in ids:
            idx = int(v) - 1
            seen.append(idx)
            assert a_lens[idx] <= t_aud  # bucket fits every item
    assert len(seen) == len(set(seen))
    assert len(seen) >= 40 - 2 * 3
    assert set(seen) <= set(range(40))


def test_tts_packed_training_trajectory_matches_solo():
    """Packed and solo TTS TRAINING trajectories match step-for-step (same
    utterances, same rng): 12 optimizer steps through both programs."""
    import optax

    from audio_calm_tpu.train.optim import partition_params
    from audio_calm_tpu.train.steps import init_train_state, make_calm_step

    exs = _tts_examples([5, 3, 6, 2, 4, 6, 1, 5], [9, 6, 12, 3, 7, 5, 2, 11],
                        seed=8)
    packed, left = pack_tts_window(exs, 4, 14, 2, 16, 8, max_text_len=6)
    assert not left
    solo = {k: jnp.asarray(v)
            for k, v in _solo_from_packed_tts(packed, 6).items()}
    cfg = CALMModelConfig(
        latent_dim=8, max_audio_len=16, max_text_len=6,
        tts_flow_hidden_dim=32, tts_flow_num_layers=1,
        asr_flow_hidden_dim=32, asr_flow_num_layers=1, flow_num_heads=4,
        qwen=Qwen2Config.tiny(vocab_size=256),
        lora=LoRAConfig(rank=2, alpha=4, dropout=0.0),
        cfg_dropout_prob=0.0,
    )
    model = QwenCALM(cfg, dtype=jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "flow": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        solo["text_ids"], solo["attention_mask"], solo["latents"],
        solo["audio_mask"],
        train=False, method=QwenCALM.forward_tts)["params"]

    def run(task, batch):
        trainable, frozen = partition_params(
            params, lambda k: "train" if k[0] != "llm" else "freeze")
        tx = optax.adam(3e-3)
        state = init_train_state(trainable, tx)
        step = jax.jit(make_calm_step(model, tx, task))
        losses = []
        for _ in range(12):
            state, m = step(state, frozen, batch, jax.random.PRNGKey(42))
            losses.append(float(m["loss"]))
        return np.asarray(losses)

    ls = run("tts", solo)
    lp = run("tts_packed", {k: jnp.asarray(v) for k, v in packed.items()})
    assert np.max(np.abs(ls - lp)) < 5e-3, (ls, lp)


def test_tts_packed_microbatch_dummy_tail():
    """FFD fills rows front-to-back, so the microbatch tail slice can be
    ALL dummy slots. Packed-TTS slices are built against the FULL batch's
    global denominators and simply sum: with slice 1 entirely dummy, the
    step's loss/grads equal slice 0's alone."""
    import optax

    from audio_calm_tpu.train.optim import merge_partitions, partition_params
    from audio_calm_tpu.train.steps import init_train_state, make_calm_step

    cfg = CALMModelConfig(
        latent_dim=8, max_audio_len=16, max_text_len=6,
        tts_flow_hidden_dim=32, tts_flow_num_layers=1,
        asr_flow_hidden_dim=32, asr_flow_num_layers=1, flow_num_heads=4,
        qwen=Qwen2Config.tiny(vocab_size=256),
        lora=LoRAConfig(rank=2, alpha=4, dropout=0.0),
        cfg_dropout_prob=0.0,
    )
    model = QwenCALM(cfg, dtype=jnp.float32)
    # 4 utterances FFD-pack into rows 0-1; rows 2-3 stay dummy, so the
    # microbatch=2 split puts ALL real content in slice 0
    exs = _tts_examples([5, 3, 6, 2], [9, 6, 12, 3], seed=11)
    packed, left = pack_tts_window(exs, 4, 14, 2, 16, 8, max_text_len=6)
    assert not left
    real_rows = packed["text_mask"].reshape(4, -1).sum(-1) > 0
    assert list(real_rows) == [True, True, False, False]

    params = model.init(
        {"params": jax.random.PRNGKey(0), "flow": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        packed["latents"], packed["audio_mask"], packed["text_mask"],
        packed["tok_ids"], packed["kind"], packed["segment_ids"],
        packed["position_ids"], packed["ctx_idx"], packed["soa_idx"],
        train=False, method=QwenCALM.forward_tts_packed,
    )["params"]
    trainable, frozen = partition_params(
        params, lambda k: "train" if k[0] != "llm" else "freeze")
    tx = optax.adam(1e-3)
    state = init_train_state(trainable, tx)
    step = jax.jit(make_calm_step(model, tx, "tts_packed", microbatch=2))
    batch = {k: jnp.asarray(v) for k, v in packed.items()}
    rng = jax.random.PRNGKey(9)
    _, metrics = step(state, frozen, batch, rng)

    # manual slice-0 forward/backward with the body's exact rng folds and
    # the FULL batch's global denominators
    r = jax.random.fold_in(jax.random.fold_in(rng, 0), 0)  # step 0, slice 0
    rngs = {"flow": jax.random.fold_in(r, 0),
            "dropout": jax.random.fold_in(r, 1)}
    slice0 = {k: v[:2] for k, v in batch.items()}
    dens = (
        jnp.maximum(batch["text_mask"].any(-1).astype(jnp.float32).sum(), 1.0),
        jnp.maximum(batch["audio_mask"].astype(jnp.float32).sum(), 1.0),
    )

    def loss0(tr):
        out = model.apply(
            {"params": merge_partitions(tr, frozen)},
            slice0["latents"], slice0["audio_mask"], slice0["text_mask"],
            slice0["tok_ids"], slice0["kind"], slice0["segment_ids"],
            slice0["position_ids"], slice0["ctx_idx"], slice0["soa_idx"],
            global_den=dens,
            train=True, rngs=rngs, method=QwenCALM.forward_tts_packed,
        )
        return out["loss"], out

    (l0, out0), g0 = jax.value_and_grad(loss0, has_aux=True)(trainable)
    assert float(out0["loss_den"]) == 4.0
    np.testing.assert_allclose(float(metrics["loss"]), float(l0), rtol=1e-5)
    np.testing.assert_allclose(float(metrics["loss_den"]), 4.0, rtol=1e-6)
    np.testing.assert_allclose(
        float(metrics["grad_norm"]), float(optax.global_norm(g0)),
        rtol=1e-4)


def test_estimate_packed_steps_per_epoch_tracks_iterator():
    """The sampled-cost schedule estimate lands near the true packed step
    count per epoch (the naive n_items/batch_size over-runs configured
    epochs several-fold under packing — train_calm sizes the LR schedule
    from this and stops on exact iterator exhaustion)."""
    from audio_calm_tpu.data.collator import estimate_packed_steps_per_epoch

    rng = np.random.default_rng(9)
    n = 400
    a_lens = [int(x) for x in rng.integers(2, 17, size=n)]
    t_lens = [int(x) for x in rng.integers(1, 7, size=n)]

    # TTS: costs from text tokens
    ds = _TTSPackDataset(a_lens, t_lens)
    est = estimate_packed_steps_per_epoch(ds, "tts", rows=2, row_len=20,
                                          segments=3)
    true = sum(1 for _ in calm_batch_iterator(
        ds, batch_size=4, pad_token_id=0, latent_dim=8, task_prob_tts=1.0,
        training=False, seed=0, epochs=1,
        tts_pack_rows=2, tts_pack_len=20, tts_pack_segments=3,
    ))
    assert true > n // (2 * 3)  # packing really is denser than slot count
    assert 0.6 * true <= est <= 1.5 * true, (est, true)

    # ASR: costs from latent frames + the constant prompt
    ds2 = _PackDataset(a_lens)
    est2 = estimate_packed_steps_per_epoch(ds2, "asr", rows=2, row_len=42,
                                           segments=3)
    true2 = sum(1 for _ in calm_batch_iterator(
        ds2, batch_size=4, pad_token_id=0, latent_dim=8, task_prob_tts=0.0,
        training=False, seed=0, epochs=1,
        asr_pack_rows=2, asr_pack_len=42, asr_pack_segments=3,
    ))
    assert 0.6 * true2 <= est2 <= 1.5 * true2, (est2, true2)


def test_tts_pack_config_falls_back_multihost():
    """Multi-host runs disable TTS packing too: plain 'tts' batches,
    identical to the no-pack iterator."""
    rng = np.random.default_rng(3)
    a_lens = [int(x) for x in rng.integers(2, 17, 24)]
    t_lens = [int(x) for x in rng.integers(1, 7, 24)]

    def batches(rank, **kw):
        ds = _TTSPackDataset(a_lens, t_lens)
        return list(calm_batch_iterator(
            ds, batch_size=4, pad_token_id=0, latent_dim=8,
            task_prob_tts=1.0, training=False, seed=7, epochs=1,
            process_index=rank, process_count=2, **kw))

    with_pack = [batches(r, tts_pack_rows=2, tts_pack_len=20,
                         tts_pack_segments=3) for r in (0, 1)]
    without = [batches(r) for r in (0, 1)]
    for rank in (0, 1):
        assert len(with_pack[rank]) == len(without[rank]) > 0
        for bp, bn in zip(with_pack[rank], without[rank]):
            assert bp["task"] == "tts"
            for k in bp:
                if k == "task":
                    continue
                np.testing.assert_array_equal(bp[k], bn[k])


def test_pack_config_falls_back_multihost():
    """Multi-host runs disable packing (pack decisions would depend on rows
    other processes hold): with process_count>1 the iterator must yield
    plain 'asr' batches whose per-rank shards are lock-stepped slices of
    the same global order — identical to the no-pack iterator."""
    lens = [int(x) for x in np.random.default_rng(3).integers(2, 17, 24)]

    def batches(rank, **kw):
        ds = _PackDataset(lens)
        return list(calm_batch_iterator(
            ds, batch_size=4, pad_token_id=0, latent_dim=8,
            task_prob_tts=0.0, training=False, seed=7, epochs=1,
            process_index=rank, process_count=2, **kw))

    with_pack = [batches(r, asr_pack_rows=2, asr_pack_len=42,
                         asr_pack_segments=3) for r in (0, 1)]
    without = [batches(r) for r in (0, 1)]
    for rank in (0, 1):
        assert len(with_pack[rank]) == len(without[rank]) > 0
        for bp, bn in zip(with_pack[rank], without[rank]):
            assert bp["task"] == "asr"  # packing silently off, not packed
            for k in bp:
                if k == "task":
                    continue
                np.testing.assert_array_equal(bp[k], bn[k])
    # the two ranks hold disjoint halves of each global batch
    for bp0, bp1 in zip(with_pack[0], with_pack[1]):
        assert bp0["latents"].shape == bp1["latents"].shape
        assert not np.array_equal(bp0["latents"], bp1["latents"])


# ---------------------------------------------------------------------------
# Multi-host packing: metadata-planned shared FFD (datasets.CalmDataset.meta
# header reads), each process materializes only its own rows
# ---------------------------------------------------------------------------

class _ByteTok:
    pad_token_id = 0

    def encode(self, text, add_special_tokens=False):
        return [(ord(c) % 60) + 1 for c in text]


def _npz_store(root, n=24, seed=0, latent_dim=8):
    import os

    d = os.path.join(root, "dev", "1")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    lines = []
    for i in range(n):
        fid = f"1-{i:04d}"
        T = int(rng.integers(4, 17))
        np.savez(os.path.join(d, fid + ".npz"),
                 latent=rng.standard_normal((T, latent_dim)).astype(
                     np.float32))
        lines.append(f"{fid} sample number {i} {'pad ' * (i % 4)}")
    with open(os.path.join(d, "1.trans.txt"), "w") as f:
        f.write("\n".join(lines))
    return root


def _npz_dataset(root, task_mode):
    from audio_calm_tpu.data.datasets import CalmDataset

    return CalmDataset(
        _ByteTok(), asr_latent_dir=root, asr_subsets="dev",
        tts_latent_dir=root, tts_subsets="dev",
        max_text_len=16, max_audio_len=24, task_mode=task_mode)


_MH_KW = dict(batch_size=4, pad_token_id=0, latent_dim=8,
              training=False, seed=3, epochs=1,
              audio_buckets=[8, 16, 24], length_group_window=2)
_MH_PK = {
    "tts": dict(task_prob_tts=1.0, tts_pack_rows=4, tts_pack_len=40,
                tts_pack_segments=2),
    # _ByteTok encodes the constant ASR prompt to 75 tokens (real
    # tokenizers: ~20), so a 2-segment row needs 2*(24+1+75)
    "asr": dict(task_prob_tts=0.0, asr_pack_rows=4, asr_pack_len=200,
                asr_pack_segments=2),
}


@pytest.mark.parametrize("task", ["tts", "asr"])
def test_multihost_packed_matches_single(tmp_path, task):
    """Two rank iterators' rows concatenate to exactly the single-process
    packed batches (same plan from metadata, same bucket grids): the FFD
    plan over header-read frames + tokenized texts equals the plan over
    loaded examples, and row materialization is row-local."""
    root = _npz_store(str(tmp_path))
    kw = {**_MH_KW, **_MH_PK[task]}
    single = list(calm_batch_iterator(_npz_dataset(root, task), **kw))
    ranks = [list(calm_batch_iterator(
        _npz_dataset(root, task), **kw,
        process_index=r, process_count=2)) for r in (0, 1)]
    assert len(single) == len(ranks[0]) == len(ranks[1]) > 0
    for bs, b0, b1 in zip(single, ranks[0], ranks[1]):
        assert bs["task"] == b0["task"] == b1["task"] == f"{task}_packed"
        assert b0["n_samples"] + b1["n_samples"] == bs["n_samples"] > 0
        for k in bs:
            if k in ("task", "n_samples"):
                continue
            np.testing.assert_array_equal(
                np.concatenate([b0[k], b1[k]]), bs[k], err_msg=k)


def test_multihost_packed_corrupt_slot_stubs_owner_locally(
        tmp_path, monkeypatch):
    """A failed load affects ONLY the owner rank's rows (the plan is
    metadata-derived, so shapes/buckets/segment layout never depend on
    load success): the slot goes dummy on the owner, the other rank's
    arrays are bit-identical to the clean run, and exactly one utterance
    disappears from the epoch's sample count."""
    from audio_calm_tpu.data.datasets import CalmDataset

    root = _npz_store(str(tmp_path))
    kw = {**_MH_KW, **_MH_PK["tts"]}

    def run():
        return [list(calm_batch_iterator(
            _npz_dataset(root, "tts"), **kw,
            process_index=r, process_count=2)) for r in (0, 1)]

    clean = run()
    real_get = CalmDataset.get

    def failing(self, mode, idx, _real=real_get):
        return None if idx == 7 else _real(self, mode, idx)

    monkeypatch.setattr(CalmDataset, "get", failing)
    broken = run()

    n_clean = sum(b["n_samples"] for rank in clean for b in rank)
    n_broken = sum(b["n_samples"] for rank in broken for b in rank)
    assert n_broken == n_clean - 1
    diffs = 0
    for r in (0, 1):
        assert len(clean[r]) == len(broken[r])
        for bc, bb in zip(clean[r], broken[r]):
            same = all(
                np.array_equal(bc[k], bb[k])
                for k in bc if k not in ("task", "n_samples"))
            for k in bc:
                if k in ("task", "n_samples"):
                    continue
                assert bc[k].shape == bb[k].shape, k  # plan is unchanged
            diffs += not same
    assert diffs == 1  # only the owner's rows changed
