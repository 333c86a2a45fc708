"""Non-autoregressive TTS / ASR inference pipelines.

Re-design of the reference inference (eval/eval_calm.py:306-381 ASR,
419-540 TTS) for XLA: everything runs on a static [B, max_audio_len] /
[B, max_text_len] grid with traced lengths + masks, so each pipeline is ONE
jit program (the reference re-shapes per utterance). CFG passes are fused
(see ops/ode.py). EOS truncation and tokenizer decode stay host-side.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audio_calm_tpu.models.calm import QwenCALM
from audio_calm_tpu.ops.alignment import build_alignment_from_durations
from audio_calm_tpu.ops.ode import ode_solve

TTS_PROMPT = (
    "<|im_start|>user\nRead this text:\n{}<|im_end|>\n<|im_start|>assistant\n"
)
ASR_PROMPT = (
    "<|im_start|>user\nTranscribe audio to text embedding.<|im_end|>\n"
    "<|im_start|>assistant\n"
)
# Qwen2 ChatML terminators (reference eval_calm.py:365-372)
EOS_CANDIDATES = (151643, 151645)


def tts_encode(
    model: QwenCALM,
    params,
    text_ids: jnp.ndarray,  # [B, T_txt]
    attention_mask: jnp.ndarray,  # [B, T_txt]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Phase 1: LLM encode + length prediction.

    -> (cond_vec, text_ctx, text_pad, num_frames [B] int32). Splitting here
    lets the host pick a bucketed ODE grid from num_frames before phase 2
    (one compile per bucket instead of always paying max_audio_len — the
    static-shape answer to the reference's fully dynamic num_frames,
    eval_calm.py:449-460)."""
    cond_vec, text_ctx, text_pad = model.apply(
        params, text_ids, attention_mask, False,
        method=QwenCALM.encode_text_for_tts,
    )
    num_frames_f = model.apply(
        params, text_ctx, text_pad, method=QwenCALM.predict_length
    )
    return cond_vec, text_ctx, text_pad, num_frames_f.astype(jnp.int32)


def tts_condition(
    model: QwenCALM,
    params,
    cond_vec: jnp.ndarray,  # [B, 1, D]
    text_ctx: jnp.ndarray,  # [B, T_txt, D]
    text_pad: jnp.ndarray,  # [B, T_txt] True = PAD
    num_frames: jnp.ndarray,  # [B] int32
    t_aud: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Durations -> alignment -> per-frame DiT condition on a static
    [B, t_aud] grid (reference eval_calm.py:466-504). Shared by inference
    (tts_decode) and few-step distillation (train/distill.py — the student
    must be supervised under the exact conditioning it will be served with).

    -> (condition [B, t_aud, D], frame_valid [B, t_aud] bool,
        num_frames clipped to t_aud)."""
    num_frames = jnp.minimum(num_frames, t_aud)
    dur_scaled = model.apply(
        params, text_ctx, text_pad, num_frames, method=QwenCALM.predict_durations
    )
    valid = ~text_pad
    dur_int = jnp.floor(dur_scaled).astype(jnp.int32)
    dur_int = jnp.where(valid, jnp.maximum(dur_int, 1), 0)
    align = build_alignment_from_durations(
        dur_int, valid, t_aud, budget=num_frames
    )

    aligned_text = jnp.einsum(
        "bnt,bnd->btd", align.astype(text_ctx.dtype), text_ctx
    )
    condition = aligned_text + cond_vec
    frame_valid = jnp.arange(t_aud)[None, :] < num_frames[:, None]
    condition = condition * frame_valid[:, :, None].astype(condition.dtype)
    return condition, frame_valid, num_frames


def tts_decode(
    model: QwenCALM,
    params,
    cond_vec: jnp.ndarray,
    text_ctx: jnp.ndarray,
    text_pad: jnp.ndarray,
    num_frames: jnp.ndarray,  # [B] int32 (will be clipped to t_aud)
    rng: jax.Array,
    steps: int = 50,
    cfg_scale: float = 2.5,
    t_aud: int = 384,
    method: str = "euler",
    time_schedule: str = "uniform",
    x_init: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Phase 2: durations -> alignment -> CFG flow ODE on a [B, t_aud] grid.

    -> denormalized latents [B, t_aud, latent_dim]; frames >= num_frames[b]
    are padding. x_init (optional [B, t_aud, latent_dim]) supplies the ODE
    noise init explicitly — the batched serving path generates row b from
    request b's OWN key so a request's audio is reproducible from its seed
    alone, independent of what it got batched with."""
    condition, frame_valid, num_frames = tts_condition(
        model, params, cond_vec, text_ctx, text_pad, num_frames, t_aud
    )

    B = cond_vec.shape[0]
    if x_init is None:
        x_init = jax.random.normal(
            rng, (B, t_aud, model.cfg.latent_dim), condition.dtype
        )
    else:
        x_init = x_init.astype(condition.dtype)

    def head_fn(c, x, t, ctx, cmask, xmask):
        return model.apply(
            params, c, x, t, ctx, cmask, xmask, method=QwenCALM.tts_flow_fn
        )

    x = ode_solve(
        head_fn, condition, x_init, steps, cfg_scale,
        context=text_ctx, context_mask=text_pad, x_mask=~frame_valid,
        method=method, time_schedule=time_schedule,
    )
    return model.apply(params, x, method=QwenCALM.denormalize_latents)


def tts_generate_latents(
    model: QwenCALM,
    params,
    text_ids: jnp.ndarray,  # [B, T_txt]
    attention_mask: jnp.ndarray,  # [B, T_txt]
    rng: jax.Array,
    steps: int = 50,
    cfg_scale: float = 2.5,
    t_aud: int = 384,
    num_frames_override: Optional[int] = None,
    method: str = "euler",
    time_schedule: str = "uniform",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-shot text -> (denormalized latents [B, t_aud, latent_dim],
    num_frames [B]) — tts_encode + tts_decode fused into one program.

    num_frames_override pins the generated length (used by benchmarks where
    an untrained length predictor would be meaningless); the predictor still
    runs so its cost is always included.
    """
    cond_vec, text_ctx, text_pad, num_frames = tts_encode(
        model, params, text_ids, attention_mask
    )
    if num_frames_override is not None:
        num_frames = jnp.full_like(num_frames, num_frames_override)
    latents = tts_decode(
        model, params, cond_vec, text_ctx, text_pad, num_frames, rng,
        steps=steps, cfg_scale=cfg_scale, t_aud=t_aud, method=method,
        time_schedule=time_schedule,
    )
    return latents, jnp.minimum(num_frames, t_aud)


def asr_generate_ids(
    model: QwenCALM,
    params,
    latents: jnp.ndarray,  # [B, T_aud, latent_dim] raw
    audio_mask: jnp.ndarray,  # [B, T_aud]
    prompt_ids: jnp.ndarray,  # [B, T_prompt]
    prompt_mask: jnp.ndarray,  # [B, T_prompt]
    rng: jax.Array,
    steps: int = 20,
    cfg_scale: float = 1.0,
    num_queries: int = 96,
    method: str = "euler",
    time_schedule: str = "uniform",
    x_init: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """audio latents -> (token ids [B, num_queries], query lengths [B]).

    Query length heuristic min(max(T_aud//4, 10), max_text_len) from
    reference eval_calm.py:334, computed per sample from the audio mask.
    method/time_schedule select the solver like the TTS path (euler-20 =
    reference protocol, eval_calm.py:340-360). x_init (optional
    [B, num_queries, hidden]) supplies the ODE noise explicitly — the
    batched serving path draws row b from request b's OWN key so batching
    never changes a request's transcript (see CALMInference.asr_batch).
    """
    condition = model.apply(
        params, latents, audio_mask, prompt_ids, prompt_mask, num_queries,
        method=QwenCALM.asr_encode_audio,
    )
    t_aud_valid = jnp.sum(audio_mask.astype(jnp.int32), axis=1)
    q_len = jnp.clip(t_aud_valid // 4, 10, model.cfg.max_text_len)
    q_valid = jnp.arange(num_queries)[None, :] < q_len[:, None]
    condition = condition * q_valid[:, :, None].astype(condition.dtype)

    B = latents.shape[0]
    if x_init is None:
        x_init = jax.random.normal(
            rng, (B, num_queries, model.cfg.qwen.hidden_size), condition.dtype
        )
    else:
        x_init = x_init.astype(condition.dtype)

    def head_fn(c, x, t, ctx, cmask, xmask):
        return model.apply(
            params, c, x, t, ctx, cmask, xmask, method=QwenCALM.asr_flow_fn
        )

    x = ode_solve(head_fn, condition, x_init, steps, cfg_scale,
                  x_mask=~q_valid, method=method,
                  time_schedule=time_schedule)
    ids = model.apply(params, x, method=QwenCALM.search_nearest_tokens)
    return ids, q_len


def split_text_for_tts(
    text: str,
    tokenizer,
    max_tokens: int,
    prompt_template: str = TTS_PROMPT,
) -> list:
    """Split long text into TTS-able chunks (beyond reference: the reference
    hard-truncates at max_text_len, train_calm.py:145-146).

    Sentences (split at .!?;: boundaries) are greedily packed so that the
    FULL prompt (template + chunk) stays within `max_tokens`; a single
    over-budget sentence is hard-split on whitespace. Returns a non-empty
    list of chunk strings whose concatenation covers the input text.

    The packing check tokenizes the ASSEMBLED prompt (template.format(s)),
    not template + chunk separately: BPE boundary merges/splits at the
    template seam can make the assembled count differ from the sum, and a
    separately-budgeted chunk could then exceed max_tokens and be silently
    tail-truncated downstream.
    """
    import re

    def n_tok(s: str) -> int:
        return len(tokenizer.encode(prompt_template.format(s),
                                    add_special_tokens=False))

    budget = max_tokens

    # sentence split, keeping delimiters attached
    parts = [p for p in re.split(r"(?<=[.!?;:])\s+", text.strip()) if p]
    if not parts:
        return [text]

    # hard-split any single sentence that exceeds the budget
    units: list = []
    for p in parts:
        if n_tok(p) <= budget:
            units.append(p)
            continue
        words = p.split()
        cur = ""
        for w in words:
            cand = (cur + " " + w).strip()
            if cur and n_tok(cand) > budget:
                units.append(cur)
                cur = w
            else:
                cur = cand
        if cur:
            units.append(cur)

    chunks: list = []
    cur = ""
    for u in units:
        cand = (cur + " " + u).strip()
        if cur and n_tok(cand) > budget:
            chunks.append(cur)
            cur = u
        else:
            cur = cand
    if cur:
        chunks.append(cur)
    return chunks or [text]


def split_wav_for_asr(wav: np.ndarray, max_samples: int,
                      search_samples: Optional[int] = None,
                      frame: int = 400) -> list:
    """Split a long waveform into <=max_samples chunks at low-energy points
    (beyond reference: eval_calm.py caps audio at the 384-latent-frame
    budget — ~24.6 s at 16 kHz — and anything longer is simply truncated,
    calm_config.yaml max_speech_token_num).

    Greedy left-to-right: each cut lands in the middle of the
    minimum-RMS `frame`-sample window inside the last `search_samples` of
    the current max-length window, so chunk boundaries prefer pauses over
    word interiors. Chunks do not overlap and concatenate back to the
    input exactly; every chunk is <= max_samples and non-empty (except a
    zero-length input, which returns one empty chunk).
    """
    wav = np.asarray(wav, np.float32)
    if search_samples is None:
        search_samples = max(frame, max_samples // 8)
    out: list = []
    pos, n = 0, len(wav)
    while n - pos > max_samples:
        hi = pos + max_samples
        lo = max(hi - int(search_samples), pos + 1)
        seg = wav[lo:hi]
        k = len(seg) // frame * frame
        if k >= frame:
            rms = np.square(seg[:k].reshape(-1, frame)).mean(axis=1)
            cut = lo + int(np.argmin(rms)) * frame + frame // 2
        else:
            cut = hi
        out.append(wav[pos:cut])
        pos = cut
    out.append(wav[pos:])
    return out


def split_wav_for_asr_stream(pieces, max_samples: int,
                             search_samples: Optional[int] = None,
                             frame: int = 400, tagged: bool = False):
    """Incremental split_wav_for_asr: consume an iterable of waveform
    pieces (audio arriving over time) and yield decode chunks as soon as
    each cut is decided.

    Exactly equal to the offline splitter — the yielded chunks are
    `split_wav_for_asr(concat(pieces), ...)` element for element — because
    the offline algorithm is greedy left-to-right: each cut looks only at
    the current `max_samples` window, so it is decidable the moment
    `max_samples` of un-emitted audio has arrived (a cut fires while the
    upload is still in flight; only the final <= max_samples chunk waits
    for end-of-stream). Mirrors the (beyond-reference) long-form design:
    the reference truncates audio at the 384-latent-frame budget
    (eval_calm.py / calm_config.yaml max_speech_token_num).

    tagged=True yields (chunk, is_final) instead of bare chunks. A
    cut-produced chunk (is_final False) always has more audio behind it —
    a cut leaves a non-empty remainder — which is what lets a streaming
    consumer decode it immediately under asr_long's multi-chunk key
    contract without waiting to learn the total chunk count.
    """
    if search_samples is None:
        search_samples = max(frame, max_samples // 8)
    buf = np.zeros(0, np.float32)
    for piece in pieces:
        piece = np.asarray(piece, np.float32)
        buf = piece if not len(buf) else np.concatenate([buf, piece])
        # buffered > max_samples guarantees the offline loop condition
        # (n - pos > max_samples) whatever audio follows
        while len(buf) > max_samples:
            hi = max_samples
            lo = max(hi - int(search_samples), 1)
            seg = buf[lo:hi]
            k = len(seg) // frame * frame
            if k >= frame:
                rms = np.square(seg[:k].reshape(-1, frame)).mean(axis=1)
                cut = lo + int(np.argmin(rms)) * frame + frame // 2
            else:
                cut = hi
            yield (buf[:cut], False) if tagged else buf[:cut]
            buf = buf[cut:]
    # offline always appends the remainder (even when empty)
    yield (buf, True) if tagged else buf


def crossfade_stream(wavs, sample_rate: int = 16000,
                     crossfade_ms: float = 20.0):
    """Generator: equal-power crossfade over an iterable of waveform
    chunks, yielding audio incrementally (each chunk's fade-length tail is
    held back until the next chunk arrives). The concatenation of the
    yields equals crossfade_concat(list(wavs)) exactly — streaming and
    whole-utterance long-form synthesis produce identical audio."""
    fade = int(sample_rate * crossfade_ms / 1000.0)
    held = None  # tail of the previous chunk, not yet emitted
    for wav in wavs:
        wav = np.asarray(wav, np.float32)
        if held is not None:
            f = min(fade, len(held), len(wav))
            if f > 0:
                t = np.linspace(0.0, np.pi / 2.0, f, dtype=np.float32)
                wav = np.concatenate([
                    held[: len(held) - f],
                    held[len(held) - f:] * np.cos(t) + wav[:f] * np.sin(t),
                    wav[f:],
                ])
            else:
                wav = np.concatenate([held, wav])
        if len(wav) > fade:
            yield wav[: len(wav) - fade]
            held = wav[len(wav) - fade:]
        else:
            held = wav
    if held is not None and len(held):
        yield held


def crossfade_concat(wavs: list, sample_rate: int = 16000,
                     crossfade_ms: float = 20.0) -> np.ndarray:
    """Concatenate waveform chunks with an equal-power crossfade at each
    boundary (click-free long-form synthesis)."""
    wavs = [np.asarray(w, np.float32) for w in wavs if len(w)]
    if not wavs:
        return np.zeros((0,), np.float32)
    out = wavs[0]
    for w in wavs[1:]:
        f = int(sample_rate * crossfade_ms / 1000.0)
        f = min(f, len(out), len(w))
        if f == 0:
            out = np.concatenate([out, w])
            continue
        t = np.linspace(0.0, np.pi / 2.0, f, dtype=np.float32)
        fade_out, fade_in = np.cos(t), np.sin(t)
        mixed = out[-f:] * fade_out + w[:f] * fade_in
        out = np.concatenate([out[:-f], mixed, w[f:]])
    return out


def truncate_at_eos(
    ids: np.ndarray, q_len: int, extra_eos: Optional[set] = None
) -> list:
    """Host-side EOS truncation (reference eval_calm.py:365-379)."""
    eos = set(EOS_CANDIDATES) | (extra_eos or set())
    out = []
    for i, tid in enumerate(ids[:q_len].tolist()):
        if tid in eos:
            break
        out.append(tid)
    return out


class CALMInference:
    """Convenience host-side wrapper binding model + params + tokenizer.

    audio_buckets (ascending frame counts, e.g. [96, 192, 384]): the flow
    ODE runs on the smallest bucket grid that fits the predicted length —
    a short utterance stops paying max_audio_len compute (one extra compile
    per bucket). Without buckets, everything is one fused program on the
    max grid.

    text_buckets (ascending prompt token counts, e.g. [32, 64, 96]): prompts
    are right-padded (pad id + zero attention mask) to the smallest bucket
    that fits, so arbitrary input text reuses a handful of compiled encode
    programs instead of one per unique prompt length. None (default) keeps
    the reference-exact unpadded prompt: note the reference itself places
    the SOA token after batch padding in training but after the raw prompt
    at inference (train_calm.py pad_sequence vs eval_calm.py:424-440), so
    bucketed padding matches the TRAINING placement; numerics differ from
    unpadded inference only via the SOA position's RoPE phase.
    """

    def __init__(self, model: QwenCALM, params, tokenizer=None,
                 max_audio_len: Optional[int] = None,
                 audio_buckets: Optional[list] = None,
                 text_buckets: Optional[list] = None,
                 mesh=None):
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            # multi-chip serving: TP-shard the transformer kernels over the
            # mesh's "model" axis (one device_put for the whole tree) and
            # let the SAME jitted programs compile SPMD; batched entry
            # points shard their rows over "data" (parallel.infer_shard)
            from audio_calm_tpu.parallel.infer_shard import (
                shard_inference_params,
            )

            params = shard_inference_params(params, mesh)
        self.params = params
        self.tokenizer = tokenizer
        self.max_audio_len = max_audio_len or model.cfg.max_audio_len
        self.audio_buckets = sorted(audio_buckets) if audio_buckets else None
        self.text_buckets = sorted(text_buckets) if text_buckets else None
        # jit once per static (steps, cfg_scale, grid) combination; the model
        # is closed over (its config holds lists, so it cannot be a static arg)
        self._tts_jit = jax.jit(
            functools.partial(tts_generate_latents, model),
            static_argnames=("steps", "cfg_scale", "t_aud", "method",
                             "time_schedule"),
        )
        self._tts_encode_jit = jax.jit(functools.partial(tts_encode, model))
        self._tts_decode_jit = jax.jit(
            functools.partial(tts_decode, model),
            static_argnames=("steps", "cfg_scale", "t_aud", "method",
                             "time_schedule"),
        )
        self._asr_jit = jax.jit(
            functools.partial(asr_generate_ids, model),
            static_argnames=("steps", "cfg_scale", "num_queries",
                             "method", "time_schedule"),
        )

        # Grid-invariant per-item ODE noise: every row draws at a FULL
        # t_full grid from its own key, then slices to the active grid.
        # A request's noise (hence its audio/transcript) is therefore a
        # function of its key alone — independent of which bucket the
        # length predictor picked AND of what the serving batcher batched
        # it with. TTS draws at (max_audio_len, latent_dim) sliced to the
        # bucket; ASR draws at (num_queries, hidden) — a (1, t, d) draw
        # from key k is bit-identical to the solo B=1 in-solver draw.
        t_max = self.max_audio_len

        @functools.partial(
            jax.jit, static_argnames=("t_full", "t_slice", "d", "dtype"))
        def _stack_noise(keys, t_full, t_slice, d, dtype):
            draw = lambda k: jax.random.normal(k, (1, t_full, d), dtype)
            return jax.vmap(draw)(keys)[:, 0, :t_slice]

        self._noise_stack = _stack_noise
        self._noise_jit = lambda keys, t_aud, d, dtype: _stack_noise(
            keys, t_max, t_aud, d, dtype)

    def _encode_prompt(self, text: str):
        ids = self.tokenizer.encode(text, add_special_tokens=False)
        return np.asarray(ids, np.int32)

    def _prompt_arrays(self, text: str):
        """-> (ids [1, L], mask [1, L]); L is bucket-padded when
        text_buckets is set (pad id 0 / mask 0, truncate past the largest
        bucket — mirroring the dataset's max_text_len truncation)."""
        ids = self._encode_prompt(text)
        if not self.text_buckets:
            return ids[None], np.ones_like(ids)[None]
        L = len(ids)
        bucket = next((b for b in self.text_buckets if b >= L),
                      self.text_buckets[-1])
        if L > bucket:
            import warnings

            warnings.warn(
                f"prompt of {L} tokens truncated to largest text bucket "
                f"{bucket}; content (possibly the ChatML suffix) was cut",
                stacklevel=2,
            )
        ids = ids[:bucket]
        pad_id = getattr(self.tokenizer, "pad_token_id", None) or 0
        out = np.full((bucket,), pad_id, np.int32)
        out[: len(ids)] = ids
        mask = (np.arange(bucket) < len(ids)).astype(np.int32)
        return out[None], mask[None]

    def pick_bucket(self, n_frames: int) -> int:
        n_frames = min(n_frames, self.max_audio_len)
        for b in self.audio_buckets or ():
            if b >= n_frames:
                return min(b, self.max_audio_len)
        return self.max_audio_len

    def tts(self, text: str, rng: jax.Array, steps: int = 50,
            cfg_scale: float = 2.5, method: str = "euler",
            time_schedule: str = "uniform",
            pad_to_grid: bool = False) -> Tuple[np.ndarray, int]:
        """-> (latents [T, latent_dim], num_frames).

        pad_to_grid=False slices to num_frames (simple, but every unique
        length is a fresh downstream compile); pad_to_grid=True returns the
        full static grid (bucket size) so the VAE/vocoder stage keeps one
        compiled program per bucket — pair with eval.render.make_renderer.
        """
        ids, mask = self._prompt_arrays(TTS_PROMPT.format(text))
        if self.audio_buckets:
            cond_vec, text_ctx, text_pad, num_frames = self._tts_encode_jit(
                self.params, jnp.asarray(ids), jnp.asarray(mask)
            )
            n = int(num_frames[0])  # host sync picks the grid
            t_aud = self.pick_bucket(n)
            # grid-invariant noise (see _stack_noise): same key -> same
            # audio whichever bucket (or serving batch) the request lands in
            x_init = self._noise_jit(
                jnp.asarray(rng)[None], t_aud,
                self.model.cfg.latent_dim, text_ctx.dtype,
            )
            latents = self._tts_decode_jit(
                self.params, cond_vec, text_ctx, text_pad, num_frames, rng,
                steps=steps, cfg_scale=cfg_scale, t_aud=t_aud,
                method=method, time_schedule=time_schedule, x_init=x_init,
            )
            n = min(n, t_aud)
        else:
            latents, num_frames = self._tts_jit(
                self.params, jnp.asarray(ids), jnp.asarray(mask),
                rng, steps=steps, cfg_scale=cfg_scale,
                t_aud=self.max_audio_len,
                method=method, time_schedule=time_schedule,
            )
            n = int(num_frames[0])
        if pad_to_grid:
            return np.asarray(latents[0]), n
        return np.asarray(latents[0, :n]), n

    def tts_batch(self, texts: list, keys: list, steps: int = 50,
                  cfg_scale: float = 2.5, method: str = "euler",
                  time_schedule: str = "uniform",
                  pad_batch: bool = True):
        """Batched single-chunk synthesis: the whole batch runs as ONE
        encode + ONE decode program (the serving batcher's device call —
        B=8 aggregate measured ~1.5x the single-stream per-chip
        throughput, BASELINE.md "TTS serving").

        texts: list[str] (raw, un-templated); keys: one PRNG key per item —
        row i's ODE noise comes from keys[i] ALONE, so a request's audio is
        reproducible from its seed regardless of batch composition.
        pad_batch pads B up to the next power of two (repeat row 0) so
        arbitrary group sizes reuse a handful of compiled programs.

        -> (latents [B, t_grid, latent_dim] np, n_frames list[int], t_grid).
        All items share one ODE grid = the bucket fitting the LONGEST
        predicted length (masks keep short rows correct).
        """
        assert texts and len(texts) == len(keys)
        B = len(texts)
        arrs = [self._prompt_arrays(TTS_PROMPT.format(t)) for t in texts]
        L = max(a.shape[1] for a, _ in arrs)
        pad_id = getattr(self.tokenizer, "pad_token_id", None) or 0
        ids = np.full((B, L), pad_id, np.int32)
        mask = np.zeros((B, L), np.int32)
        for i, (a, m) in enumerate(arrs):
            ids[i, : a.shape[1]] = a[0]
            mask[i, : m.shape[1]] = m[0]
        karr = jnp.stack([jnp.asarray(k) for k in keys])
        if pad_batch:
            Bp = 1 << (B - 1).bit_length()  # next power of two
            if Bp > B:
                ids = np.concatenate([ids, np.repeat(ids[:1], Bp - B, 0)])
                mask = np.concatenate([mask, np.repeat(mask[:1], Bp - B, 0)])
                karr = jnp.concatenate([karr, jnp.repeat(karr[:1], Bp - B, 0)])

        from audio_calm_tpu.parallel.infer_shard import shard_batch_rows

        ids_j, mask_j, karr = shard_batch_rows(
            (jnp.asarray(ids), jnp.asarray(mask), karr), self.mesh)
        cond_vec, text_ctx, text_pad, num_frames = self._tts_encode_jit(
            self.params, ids_j, mask_j
        )
        nf = np.asarray(num_frames)[:B]
        t_aud = self.pick_bucket(int(nf.max()))
        # grid-invariant per-item noise (one vmapped dispatch): row i is
        # exactly what a solo tts() with keys[i] would draw, whatever
        # bucket either path picked
        x_init = self._noise_jit(karr, t_aud, self.model.cfg.latent_dim,
                                 text_ctx.dtype)
        latents = self._tts_decode_jit(
            self.params, cond_vec, text_ctx, text_pad, num_frames,
            jax.random.PRNGKey(0), steps=steps, cfg_scale=cfg_scale,
            t_aud=t_aud, method=method, time_schedule=time_schedule,
            x_init=x_init,
        )
        return (np.asarray(latents[:B]),
                [int(min(n, t_aud)) for n in nf], t_aud)

    def split_chunks(self, text: str,
                     max_chunk_tokens: Optional[int] = None) -> list:
        """Sentence-pack `text` into prompt-budget chunks (the long-form
        budget logic shared by tts_long_stream and the serving batcher's
        single-chunk routing)."""
        budget = max_chunk_tokens or self.model.cfg.max_text_len
        if self.text_buckets:
            # _prompt_arrays truncates past the largest bucket; keep the
            # chunk budget inside it so no chunk content is silently cut
            budget = min(budget, self.text_buckets[-1])
        return split_text_for_tts(text, self.tokenizer, budget)

    def tts_long_stream(self, text: str, rng: jax.Array, render,
                        steps: int = 50, cfg_scale: float = 2.5,
                        method: str = "euler",
                        time_schedule: str = "uniform",
                        crossfade_ms: float = 20.0,
                        max_chunk_tokens: Optional[int] = None):
        """Generator form of tts_long: yields waveform pieces as each text
        chunk is synthesized (time-to-first-audio = one chunk, not the
        whole utterance). Crossfades are applied across yields by
        crossfade_stream; the concatenation of the yielded pieces equals
        tts_long's output exactly."""
        chunks = self.split_chunks(text, max_chunk_tokens)

        def chunk_wavs():
            for chunk, k in zip(chunks, self.chunk_keys(rng, len(chunks))):
                latents, n = self.tts(
                    chunk, k, steps=steps, cfg_scale=cfg_scale,
                    method=method, time_schedule=time_schedule,
                    pad_to_grid=True,
                )
                yield np.asarray(render(latents, n), np.float32)

        yield from crossfade_stream(chunk_wavs(), crossfade_ms=crossfade_ms)

    def tts_long(self, text: str, rng: jax.Array, render,
                 steps: int = 50, cfg_scale: float = 2.5,
                 method: str = "euler", time_schedule: str = "uniform",
                 crossfade_ms: float = 20.0,
                 max_chunk_tokens: Optional[int] = None) -> np.ndarray:
        """Long-form text -> waveform: sentence-pack into prompt-budget
        chunks, synthesize each on the bucketed grids, render, and
        equal-power-crossfade the chunk boundaries. `render` is an
        eval.render.make_renderer callable. Short text degenerates to a
        single tts() call. (Beyond reference: it truncates at max_text_len.)
        """
        pieces = list(self.tts_long_stream(
            text, rng, render, steps=steps, cfg_scale=cfg_scale,
            method=method, time_schedule=time_schedule,
            crossfade_ms=crossfade_ms, max_chunk_tokens=max_chunk_tokens,
        ))
        if not pieces:
            return np.zeros((0,), np.float32)
        return np.concatenate(pieces)

    def chunk_keys(self, rng: jax.Array, n: int) -> list:
        """The per-chunk PRNG keys tts_long_stream derives from `rng`
        (sequential splits). Shared with the batched long-form paths so
        batched, streamed, and solo synthesis of the same text from the
        same key produce identical audio."""
        keys = []
        for _ in range(n):
            rng, k = jax.random.split(rng)
            keys.append(k)
        return keys

    def tts_long_batched(self, text: str, rng: jax.Array, render,
                         steps: int = 50, cfg_scale: float = 2.5,
                         method: str = "euler",
                         time_schedule: str = "uniform",
                         crossfade_ms: float = 20.0,
                         max_chunk_tokens: Optional[int] = None,
                         batch_size: int = 8) -> np.ndarray:
        """tts_long with the text's chunks coalesced into batched device
        programs: groups of up to `batch_size` chunks run as ONE encode +
        ONE decode (tts_batch) + ONE render (render.batch) instead of a
        solo pipeline per chunk — the B=8 aggregate throughput win
        (BASELINE.md "TTS serving", ~1.5x device-side) applied WITHIN a
        single long request.

        Equivalent to tts_long for the same `rng`: chunk keys are the
        same sequential splits (chunk_keys), each row's ODE noise comes
        from its own key on a grid-invariant draw, and the masked VAE
        decode + render make the LATENTS independent of bucket and batch
        composition bit-exactly (test_tts_long_batched_matches_sequential).
        The rendered float wav can differ from the sequential path at
        ~1 ULP — XLA compiles different B=1 vs B=N conv programs — which
        is at most 1 LSB on <0.1% of samples after the int16 wire
        quantization (verified; inaudible)."""
        chunks = self.split_chunks(text, max_chunk_tokens)
        keys = self.chunk_keys(rng, len(chunks))
        wavs = []
        for i in range(0, len(chunks), batch_size):
            latents, n_frames, _grid = self.tts_batch(
                chunks[i:i + batch_size], keys[i:i + batch_size],
                steps=steps, cfg_scale=cfg_scale, method=method,
                time_schedule=time_schedule,
            )
            wavs.extend(render.batch(latents, n_frames))
        return crossfade_concat(wavs, crossfade_ms=crossfade_ms)

    def _asr_pad(self, latents: np.ndarray):
        """One item's raw latents [T, D] -> (padded [t_max, D], mask)."""
        T = latents.shape[0]
        t_max = self.max_audio_len
        pad = np.zeros((t_max, latents.shape[1]), np.float32)
        pad[: min(T, t_max)] = latents[:t_max]
        mask = (np.arange(t_max) < T).astype(np.int32)
        return pad, mask

    def _asr_decode_row(self, ids_row: np.ndarray, q_len: int) -> str:
        extra = set()
        if self.tokenizer is not None and getattr(
                self.tokenizer, "eos_token_id", None) is not None:
            extra.add(self.tokenizer.eos_token_id)
        final = truncate_at_eos(np.asarray(ids_row), int(q_len), extra)
        return self.tokenizer.decode(final, skip_special_tokens=True)

    def asr(self, latents: np.ndarray, rng: jax.Array, steps: int = 20,
            cfg_scale: float = 1.0, method: str = "euler",
            time_schedule: str = "uniform") -> str:
        """latents [T, latent_dim] -> transcript string."""
        pad, mask = self._asr_pad(latents)
        prompt = self._encode_prompt(ASR_PROMPT)[None]
        ids, q_len = self._asr_jit(
            self.params, jnp.asarray(pad[None]),
            jnp.asarray(mask[None]), jnp.asarray(prompt),
            jnp.ones_like(jnp.asarray(prompt)), rng,
            steps=steps, cfg_scale=cfg_scale,
            num_queries=self.model.cfg.max_text_len,
            method=method, time_schedule=time_schedule,
        )
        return self._asr_decode_row(ids[0], int(q_len[0]))

    def asr_batch(self, latents_list: list, keys: list, steps: int = 20,
                  cfg_scale: float = 1.0, method: str = "euler",
                  time_schedule: str = "uniform",
                  pad_batch: bool = True) -> list:
        """Batched ASR: the whole group runs as ONE flow program (the
        serving batcher's /asr device call). latents_list: per-item raw
        latents [T_i, latent_dim]; keys: one PRNG key per item — row i's
        ODE noise is drawn from keys[i] ALONE at the fixed
        (num_queries, hidden) grid, bit-identical to the solo asr() draw,
        so batch composition never changes a transcript. Audio pads to the
        same max_audio_len grid the solo path uses (identical numerics);
        pad_batch pads B to the next power of two (repeat row 0) so
        arbitrary group sizes reuse a handful of compiled programs.
        -> list[str] transcripts."""
        assert latents_list and len(latents_list) == len(keys)
        B = len(latents_list)
        padded = [self._asr_pad(x) for x in latents_list]
        lat = np.stack([p for p, _ in padded])
        mask = np.stack([m for _, m in padded])
        prompt = self._encode_prompt(ASR_PROMPT)[None]
        karr = jnp.stack([jnp.asarray(k) for k in keys])
        if pad_batch:
            Bp = 1 << (B - 1).bit_length()
            if Bp > B:
                lat = np.concatenate([lat, np.repeat(lat[:1], Bp - B, 0)])
                mask = np.concatenate([mask, np.repeat(mask[:1], Bp - B, 0)])
                karr = jnp.concatenate(
                    [karr, jnp.repeat(karr[:1], Bp - B, 0)])
        Bp = lat.shape[0]
        Q = self.model.cfg.max_text_len
        from audio_calm_tpu.parallel.infer_shard import shard_batch_rows

        lat_j, mask_j, karr, prompts = shard_batch_rows(
            (jnp.asarray(lat), jnp.asarray(mask), karr,
             jnp.repeat(jnp.asarray(prompt), Bp, 0)), self.mesh)
        x_init = self._noise_stack(
            karr, Q, Q, self.model.cfg.qwen.hidden_size, self.model.dtype)
        ids, q_len = self._asr_jit(
            self.params, lat_j, mask_j,
            prompts, jnp.ones_like(prompts), jax.random.PRNGKey(0),
            steps=steps, cfg_scale=cfg_scale, num_queries=Q,
            method=method, time_schedule=time_schedule, x_init=x_init,
        )
        ids, q_len = np.asarray(ids), np.asarray(q_len)
        return [self._asr_decode_row(ids[i], int(q_len[i]))
                for i in range(B)]

    def asr_long(self, wav: np.ndarray, rng: jax.Array, encode,
                 max_wav_samples: int, steps: int = 20,
                 cfg_scale: float = 1.0, method: str = "euler",
                 time_schedule: str = "uniform",
                 search_ms: float = 1500.0, sample_rate: int = 16000,
                 max_decode_batch: int = 8) -> str:
        """Long-form waveform -> transcript: split the wav into
        <=max_wav_samples chunks at low-energy points (split_wav_for_asr),
        encode them to latents, decode each chunk's transcript with the
        batched flow program, and join. (Beyond reference: eval_calm.py
        truncates audio at the 384-frame budget.)

        `encode`: list[wav chunk] -> list[latents [T_i, latent_dim]] — e.g.
        serving.frontend.encode_chunks over a make_asr_frontend pair, which
        runs one batched masked-VAE encode per wav bucket.

        Key contract: a single-chunk wav decodes with `rng` itself (so
        asr_long == the wav's solo asr() when it fits the budget);
        multi-chunk wavs give chunk i the key fold_in(rng, i). Chunk keys
        never depend on how chunks are grouped into device batches, so the
        transcript is a function of (audio, rng) alone — the same
        batch-composition-invariance contract as asr_batch.
        """
        chunks = [c for c in split_wav_for_asr(
            wav, int(max_wav_samples),
            search_samples=int(search_ms / 1000.0 * sample_rate),
        ) if len(c)]
        if not chunks:
            return ""
        lats = encode(chunks)
        if len(chunks) == 1:
            keys = [rng]
        else:
            keys = [jax.random.fold_in(rng, i) for i in range(len(chunks))]
        texts: list = []
        for i in range(0, len(lats), max_decode_batch):
            texts.extend(self.asr_batch(
                lats[i:i + max_decode_batch], keys[i:i + max_decode_batch],
                steps=steps, cfg_scale=cfg_scale, method=method,
                time_schedule=time_schedule,
            ))
        return " ".join(t.strip() for t in texts if t.strip())

    def asr_stream(self, pieces, rng: jax.Array, encode,
                   max_wav_samples: int, steps: int = 20,
                   cfg_scale: float = 1.0, method: str = "euler",
                   time_schedule: str = "uniform",
                   search_ms: float = 1500.0, sample_rate: int = 16000):
        """Generator: incremental transcription of audio arriving over
        time. `pieces` is an iterable of waveform arrays (e.g. decoded
        HTTP upload chunks); each decode chunk is transcribed the moment
        its low-energy cut is decided — while the rest of the audio is
        still arriving — and its transcript yielded immediately.

        Contract: ``" ".join(t for t in asr_stream(pieces, ...) if t)``
        equals ``asr_long(concat(pieces), ...)`` — same cuts
        (split_wav_for_asr_stream is exactly the offline splitter), same
        per-chunk keys (single chunk decodes with `rng` itself, chunk i of
        many with fold_in(rng, i)), and per-chunk decode equals the
        grouped decode by asr_batch's batch-composition-invariance. When
        `encode` batches chunks (serving.frontend), streamed per-chunk
        encodes match grouped encodes to the frontend's masked-batching
        tolerance (~6e-7 rel) rather than bit-exactly.

        The first transcript lands after ~max_wav_samples of audio (the
        first cut) instead of after the full upload — for an N-chunk
        upload the final transcript needs 1 decode after end-of-stream
        instead of N. (Beyond reference: eval_calm.py truncates at the
        384-frame budget; no streaming exists there.)
        """

        def decode_one(chunk, key):
            lat = encode([chunk])[0]
            return self.asr_batch(
                [lat], [key], steps=steps, cfg_scale=cfg_scale,
                method=method, time_schedule=time_schedule,
            )[0].strip()

        i = 0
        for chunk, is_final in split_wav_for_asr_stream(
            pieces, int(max_wav_samples),
            search_samples=int(search_ms / 1000.0 * sample_rate),
            tagged=True,
        ):
            if not len(chunk):
                continue  # only the EOS remainder can be empty
            if not is_final:
                # a cut guarantees more audio follows -> multi-chunk keys
                yield decode_one(chunk, jax.random.fold_in(rng, i))
            else:
                # single-chunk streams decode with rng itself, matching
                # the solo asr() / asr_long contract
                key = rng if i == 0 else jax.random.fold_in(rng, i)
                yield decode_one(chunk, key)
            i += 1
