"""QwenCALM: continuous audio language model (main composite model).

Re-design of the reference QwenCALM (models/modeling_calm.py:534-936) for
TPU/XLA:

  - Frozen Qwen2 backbone (+LoRA) conditions two DiT flow heads:
    TTS (text -> VAE-latent velocity field, gated cross-attn to text) and
    ASR (audio -> LLM-embedding velocity field, positional-query conditioned).
  - The reference routes mixed-task batches with dynamic index lists
    (modeling_calm.py:704, 831). Under XLA that forces recompilation or
    wasted dual compute, so here batches are task-homogeneous: the data
    pipeline emits "tts" or "asr" batches and the train step dispatches to
    `forward_tts` / `forward_asr` — two static jit programs.
  - All lengths are pad-to-max + mask; MAS and alignment run on-device.

Component names mirror the reference checkpoint layout (input_proj,
tts_flow_head, asr_flow_head, soa_embed, tts_len_predictor,
tts_dur_predictor, asr_query_embed, asr_cross_attn) so component-sharded
checkpoints convert one-to-one (reference save_pretrained,
modeling_calm.py:911-936).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from audio_calm_tpu.config import CALMModelConfig
from audio_calm_tpu.models.calm_heads import (
    AudioInputProjector,
    PredictorMLP,
    TransformerFlowHead,
)
from audio_calm_tpu.models.qwen2 import Qwen2Embed, Qwen2Model
from audio_calm_tpu.ops.attention import MultiheadAttention
from audio_calm_tpu.ops.flow import compute_flow_loss
from audio_calm_tpu.ops.mas import monotonic_alignment_search


def _as_stat(x, dim: int) -> jnp.ndarray:
    """Scalar or [D] normalization stat -> broadcastable [1, 1, D or 1]."""
    arr = jnp.asarray(x, dtype=jnp.float32)
    if arr.ndim == 1:
        assert arr.shape[0] == dim
        return arr[None, None, :]
    return arr.reshape(1, 1, 1)


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """torch F.smooth_l1_loss (beta=1), mean reduction."""
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))


class QwenCALM(nn.Module):
    cfg: CALMModelConfig
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        c = self.cfg
        qdim = c.qwen.hidden_size
        self.embed = Qwen2Embed(c.qwen)
        self.llm = Qwen2Model(
            c.qwen,
            lora=c.lora if c.use_lora else None,
            gradient_checkpointing=(c.remat_policy != "none"),
            remat_policy=c.remat_policy,
            dtype=self.dtype,
        )
        self.input_proj = AudioInputProjector(qdim, use_rope=False, dtype=self.dtype)
        # learned start-of-audio embedding (reference inits from the mean
        # vocab embedding, modeling_calm.py:568-572; see init_soa_value)
        self.soa_embed = self.param(
            "soa_embed", nn.initializers.normal(0.02), (1, 1, qdim)
        )
        self.asr_cross_attn = MultiheadAttention(
            qdim, 16, dropout=0.1, dtype=self.dtype
        )
        self.asr_query_embed = nn.Embed(c.max_text_len, qdim)
        self.tts_flow_head = TransformerFlowHead(
            input_dim=qdim,
            output_dim=c.latent_dim,
            hidden_dim=c.tts_flow_hidden_dim,
            num_layers=c.tts_flow_num_layers,
            num_heads=c.flow_num_heads,
            context_dim=qdim,
            dtype=self.dtype,
        )
        self.asr_flow_head = TransformerFlowHead(
            input_dim=qdim,
            output_dim=qdim,
            hidden_dim=c.asr_flow_hidden_dim,
            num_layers=c.asr_flow_num_layers,
            num_heads=c.flow_num_heads,
            context_dim=None,
            dtype=self.dtype,
        )
        self.tts_len_predictor = PredictorMLP(qdim // 2)
        self.tts_dur_predictor = PredictorMLP(qdim // 2)

    # ------------------------------------------------------------------
    # shared helpers
    # ------------------------------------------------------------------
    def normalize_latents(self, latents: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        mean = _as_stat(c.latent_mean, c.latent_dim)
        std = _as_stat(c.latent_std, c.latent_dim)
        return ((latents - mean) / std).astype(self.dtype)

    def denormalize_latents(self, latents: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        mean = _as_stat(c.latent_mean, c.latent_dim)
        std = _as_stat(c.latent_std, c.latent_dim)
        return latents.astype(jnp.float32) * std + mean

    def embed_tokens(self, ids: jnp.ndarray) -> jnp.ndarray:
        return self.embed(ids)

    def search_nearest_tokens(self, x: jnp.ndarray) -> jnp.ndarray:
        """Cosine-nearest vocab ids for continuous embeddings [..., D].

        argmin cdist on L2-normalized vectors == argmax cosine similarity,
        computed as one [T, D] @ [D, V] matmul (MXU) instead of the
        reference's [T, V] torch.cdist (modeling_calm.py:630-636).
        """
        table = self.embed.variables["params"]["embedding"]
        xn = x.astype(jnp.float32)
        xn = xn / jnp.maximum(jnp.linalg.norm(xn, axis=-1, keepdims=True), 1e-12)
        tn = table.astype(jnp.float32)
        tn = tn / jnp.maximum(jnp.linalg.norm(tn, axis=-1, keepdims=True), 1e-12)
        sim = jnp.einsum("...d,vd->...v", xn, tn,
                         preferred_element_type=jnp.float32)
        return jnp.argmax(sim, axis=-1)

    def _llm_encode(self, inputs_embeds, attention_mask, train):
        pos_ids = jnp.maximum(
            jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1, 0
        )
        return self.llm(
            inputs_embeds, attention_mask=attention_mask,
            position_ids=pos_ids, train=train,
        )

    def encode_text_for_tts(
        self, text_ids: jnp.ndarray, attention_mask: jnp.ndarray, train: bool
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """[text, SOA] through the LLM -> (condition_vec [B,1,D],
        text_context [B,T,D], text_pad_mask [B,T] True=PAD)."""
        B = text_ids.shape[0]
        text_embeds = self.embed(text_ids).astype(self.dtype)
        soa = jnp.broadcast_to(
            self.soa_embed.astype(self.dtype), (B, 1, self.cfg.qwen.hidden_size)
        )
        inp = jnp.concatenate([text_embeds, soa], axis=1)
        full_mask = jnp.concatenate(
            [attention_mask, jnp.ones((B, 1), attention_mask.dtype)], axis=1
        )
        hidden = self._llm_encode(inp, full_mask, train)
        condition_vec = hidden[:, -1:, :]
        text_context = hidden[:, :-1, :]
        text_pad_mask = attention_mask == 0
        return condition_vec, text_context, text_pad_mask

    # ------------------------------------------------------------------
    # TTS training branch (reference modeling_calm.py:703-827)
    # ------------------------------------------------------------------
    def forward_tts(
        self,
        text_ids: jnp.ndarray,  # [B, T_txt]
        attention_mask: jnp.ndarray,  # [B, T_txt] 1 = valid
        latents: jnp.ndarray,  # [B, T_aud, latent_dim] raw (unnormalized)
        audio_mask: jnp.ndarray,  # [B, T_aud] 1 = valid
        train: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        gt = self.normalize_latents(latents)
        cond_vec, text_ctx, text_pad = self.encode_text_for_tts(
            text_ids, attention_mask, train
        )
        return self._tts_condition_and_loss(
            cond_vec, text_ctx, text_pad, gt, audio_mask.astype(bool), train
        )

    def _tts_condition_and_loss(
        self,
        cond_vec: jnp.ndarray,  # [B, 1, D] SOA hidden
        text_ctx: jnp.ndarray,  # [B, T_txt, D] LLM hidden over text
        text_pad: jnp.ndarray,  # [B, T_txt] True = PAD
        gt: jnp.ndarray,  # [B, T_aud, latent_dim] normalized targets
        tgt_mask: jnp.ndarray,  # [B, T_aud] bool, True = valid
        train: bool,
        real: jnp.ndarray = None,  # [B] bool: row is a real utterance
        dens: Tuple[jnp.ndarray, jnp.ndarray] = None,  # (slots, frames)
    ) -> Dict[str, jnp.ndarray]:
        """MAS + len/dur predictors + flow loss given per-utterance LLM
        outputs (the tail shared by forward_tts and forward_tts_packed,
        reference modeling_calm.py:703-827).

        real=None: the reference's solo semantics (every row is an
        utterance; each term is a plain mean). real given: packed batches
        carry dummy slots, so each term becomes a masked sum over real
        rows divided by `dens` — pass the GLOBAL (slot count, valid frame
        count) so microbatch slices sum exactly to the full-batch loss
        (train/steps.py computes them pre-scan); dens=None derives them
        from this batch."""
        c = self.cfg
        B, T_aud, _ = gt.shape

        # --- length prediction ---
        valid = ~text_pad
        valid_f = valid.astype(jnp.float32)
        text_mean = jnp.sum(
            text_ctx.astype(jnp.float32) * valid_f[:, :, None], axis=1
        ) / jnp.maximum(jnp.sum(valid_f, axis=1, keepdims=True), 1.0)
        len_pred = self.tts_len_predictor(text_mean.astype(self.dtype))
        len_pred = len_pred.astype(jnp.float32)
        gt_len = jnp.sum(tgt_mask.astype(jnp.float32), axis=1)
        text_len = jnp.sum(valid_f, axis=1)
        min_f = jnp.maximum(text_len * 2.0, 10.0)
        max_f = jnp.minimum(text_len * 12.0, float(c.max_audio_len))
        len_pred_c = jnp.clip(len_pred, min_f, max_f)
        if real is None:
            len_loss = smooth_l1(jnp.log1p(len_pred_c), jnp.log1p(gt_len))
        else:
            real_f = real.astype(jnp.float32)
            d = jnp.abs(jnp.log1p(len_pred_c) - jnp.log1p(gt_len))
            len_num = jnp.sum(
                jnp.where(d < 1.0, 0.5 * d * d, d - 0.5) * real_f
            )

        # --- MAS duration ground truth (no grad) ---
        audio_for_align = jax.lax.stop_gradient(self.input_proj(gt))
        tn = text_ctx.astype(jnp.float32)
        tn = tn / jnp.maximum(jnp.linalg.norm(tn, axis=-1, keepdims=True), 1e-12)
        an = audio_for_align.astype(jnp.float32)
        an = an / jnp.maximum(jnp.linalg.norm(an, axis=-1, keepdims=True), 1e-12)
        sim = jnp.einsum("bnd,btd->bnt", tn, an)
        sim = jnp.where(text_pad[:, :, None], -1e9, sim)
        sim = jnp.where(~tgt_mask[:, None, :], -1e9, sim)
        log_p = jax.nn.log_softmax(sim, axis=1)
        align_gt = jax.lax.stop_gradient(monotonic_alignment_search(log_p))
        gt_dur = jnp.sum(align_gt, axis=-1)  # [B, T_txt]

        # --- duration prediction ---
        dur_raw = self.tts_dur_predictor(text_ctx)
        dur_pred = jax.nn.softplus(dur_raw.astype(jnp.float32)) + 1e-4
        dur_pred = jnp.where(text_pad, 0.0, dur_pred)
        dur_sum = jnp.maximum(jnp.sum(dur_pred, axis=1, keepdims=True), 1e-4)
        dur_scaled = dur_pred * (T_aud / dur_sum)
        dur_abs = jnp.abs(
            jnp.log1p(dur_scaled * valid_f) - jnp.log1p(gt_dur * valid_f)
        )
        if real is None:
            dur_loss = jnp.mean(dur_abs)
        else:
            dur_num = jnp.sum(dur_abs * real_f[:, None])

        # --- condition + flow loss (teacher-forced GT alignment) ---
        aligned_text = jnp.einsum(
            "bnt,bnd->btd", align_gt.astype(text_ctx.dtype), text_ctx
        )
        condition = aligned_text + cond_vec
        condition = condition * tgt_mask[:, :, None].astype(condition.dtype)
        target = gt * tgt_mask[:, :, None].astype(gt.dtype)

        def head_fn(cond, x, t, ctx, cmask, xmask):
            return self.tts_flow_head(
                cond, x, t, context=ctx, context_mask=cmask, x_mask=xmask,
                train=train,
            )

        tts_loss = compute_flow_loss(
            head_fn,
            self.make_rng("flow"),
            condition,
            target,
            tgt_mask,
            cfg_dropout_prob=c.cfg_dropout_prob if train else 0.0,
            context=text_ctx,
            context_mask=text_pad,
            train=train,
        )

        out: Dict[str, jnp.ndarray] = {}
        if real is not None:
            # dummy slots contribute zero frames, so the flow masked mean
            # already excludes them; rescale its local denominator to the
            # global one (num = mean * local_frames)
            frames = jnp.sum(tgt_mask.astype(jnp.float32))
            n_real = jnp.sum(real_f)
            if dens is None:
                den_slots = jnp.maximum(n_real, 1.0)
                den_frames = jnp.maximum(frames, 1.0)
            else:
                den_slots, den_frames = dens
            tts_loss = tts_loss * (frames / den_frames)
            len_loss = len_num / den_slots
            dur_loss = dur_num / (den_slots * float(text_pad.shape[1]))
            out["loss_den"] = n_real

        loss = (
            tts_loss * c.tts_loss_weight
            + len_loss * c.len_pred_loss_weight
            + dur_loss * c.dur_pred_loss_weight
        )
        out.update(
            loss=loss, loss_tts=tts_loss, loss_len=len_loss,
            loss_dur=dur_loss,
        )
        return out

    def forward_tts_packed(
        self,
        latents: jnp.ndarray,  # [R, S, T_aud, latent_dim] per-slot raw
        audio_mask: jnp.ndarray,  # [R, S, T_aud] 1 = valid frame
        text_mask: jnp.ndarray,  # [R, S, T_txt] 1 = valid token
        tok_ids: jnp.ndarray,  # [R, T_pack] text ids at text positions
        kind: jnp.ndarray,  # [R, T_pack] 0 pad / 1 text / 2 SOA
        segment_ids: jnp.ndarray,  # [R, T_pack] 1..S, 0 = pad
        position_ids: jnp.ndarray,  # [R, T_pack] within-segment positions
        ctx_idx: jnp.ndarray,  # [R, S, T_txt] into row hidden (T_pack = zero)
        soa_idx: jnp.ndarray,  # [R, S] into row hidden (T_pack = zero)
        global_den=None,  # optional (slot count, frame count) fp32 scalars
        train: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Packed-sequence TTS training: several [text|SOA] segments share
        one LLM row under block-diagonal attention with per-segment RoPE
        positions, then each utterance's text hidden states + SOA condition
        gather back out for the per-utterance MAS/duration/flow tail. The
        TTS LLM encode pays the full max_text_len=96 grid for every
        utterance in the solo layout (the reference pads every row,
        train/train_calm.py:193-221) while typical texts are a quarter of
        that — here the LLM sees only real tokens. Numerically equal to
        forward_tts per utterance: all downstream consumers of text_ctx mask
        pad positions, so gathering zeros there is invisible (tests assert
        loss equality). The audio/DiT side stays per-slot (bucketed grid);
        batch layout: data/collator.pack_tts_window."""
        c = self.cfg
        R, S, T_aud, D = latents.shape
        T_txt = text_mask.shape[-1]
        H = c.qwen.hidden_size
        gt = self.normalize_latents(latents.reshape(R * S, T_aud, D))
        tok = self.embed(tok_ids).astype(self.dtype)
        soa = self.soa_embed.astype(self.dtype)
        kindb = kind[..., None]
        inp = jnp.where(kindb == 1, tok, 0) + jnp.where(kindb == 2, soa, 0)
        hidden = self.llm(
            inp,
            attention_mask=(kind != 0).astype(jnp.int32),
            position_ids=position_ids,
            segment_ids=segment_ids,
            train=train,
        )
        hflat = jnp.concatenate(
            [hidden, jnp.zeros((R, 1, H), hidden.dtype)], axis=1
        )
        text_ctx = jnp.take_along_axis(
            hflat, ctx_idx.reshape(R, S * T_txt)[..., None], axis=1
        ).reshape(R * S, T_txt, H)
        cond_vec = jnp.take_along_axis(
            hflat, soa_idx.reshape(R, S)[..., None], axis=1
        ).reshape(R * S, 1, H)
        flat_text = text_mask.reshape(R * S, T_txt)
        return self._tts_condition_and_loss(
            cond_vec, text_ctx, flat_text == 0, gt,
            audio_mask.reshape(R * S, T_aud).astype(bool), train,
            real=flat_text.any(axis=-1), dens=global_den,
        )

    # ------------------------------------------------------------------
    # ASR training branch (reference modeling_calm.py:829-894)
    # ------------------------------------------------------------------
    def forward_asr(
        self,
        text_ids: jnp.ndarray,  # [B, T_txt] prompt ids
        attention_mask: jnp.ndarray,  # [B, T_txt]
        latents: jnp.ndarray,  # [B, T_aud, latent_dim] raw
        audio_mask: jnp.ndarray,  # [B, T_aud]
        labels: jnp.ndarray,  # [B, T_text] target ids, -100 = ignore
        train: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        gt = self.normalize_latents(latents)
        B, T_aud, _ = gt.shape

        audio_embeds = self.input_proj(gt)
        text_embeds = self.embed(text_ids).astype(self.dtype)
        soa = jnp.broadcast_to(
            self.soa_embed.astype(self.dtype), (B, 1, c.qwen.hidden_size)
        )
        inp = jnp.concatenate([audio_embeds.astype(self.dtype), soa, text_embeds], axis=1)
        full_mask = jnp.concatenate(
            [
                audio_mask.astype(jnp.int32),
                jnp.ones((B, 1), jnp.int32),
                attention_mask.astype(jnp.int32),
            ],
            axis=1,
        )
        hidden = self._llm_encode(inp, full_mask, train)
        audio_context = hidden[:, :T_aud, :]
        return self._asr_condition_and_loss(
            audio_context, audio_mask, labels, train
        )

    def _asr_condition_and_loss(
        self,
        audio_context: jnp.ndarray,  # [B, T_ctx, D] LLM hidden over audio
        audio_mask: jnp.ndarray,  # [B, T_ctx] 1 = valid
        labels: jnp.ndarray,  # [B, T_text] target ids, -100 = ignore
        train: bool,
    ) -> Dict[str, jnp.ndarray]:
        """Positional-query cross-attn + flow loss (the per-utterance tail
        shared by forward_asr and forward_asr_packed)."""
        c = self.cfg
        B = audio_context.shape[0]
        valid_target = labels != -100
        safe_ids = jnp.where(valid_target, labels, 0)
        target_embs = self.embed(safe_ids)

        T_text = labels.shape[1]
        pos_ids = jnp.clip(jnp.arange(T_text), 0, c.max_text_len - 1)
        queries = self.asr_query_embed(pos_ids)[None].astype(self.dtype)
        queries = jnp.broadcast_to(queries, (B, T_text, c.qwen.hidden_size))

        attn_out = self.asr_cross_attn(
            queries,
            audio_context,
            audio_context,
            key_padding_mask=audio_mask == 0,
            train=train,
        )
        condition = attn_out * valid_target[:, :, None].astype(attn_out.dtype)
        target = (
            target_embs.astype(self.dtype)
            * valid_target[:, :, None].astype(self.dtype)
        )

        def head_fn(cond, x, t, ctx, cmask, xmask):
            return self.asr_flow_head(cond, x, t, x_mask=xmask, train=train)

        asr_loss = compute_flow_loss(
            head_fn,
            self.make_rng("flow"),
            condition,
            target,
            valid_target,
            cfg_dropout_prob=c.cfg_dropout_prob if train else 0.0,
            x_mask=~valid_target,
            train=train,
        )
        # loss_den = the masked-mean denominator (valid label positions).
        # The packed microbatch scan re-weights slice losses/grads by it:
        # FFD packing front-loads rows, so slices carry UNEQUAL utterance
        # counts (a window's tail slice can be all dummy slots) and a
        # plain mean-of-slice-means would mis-weight the estimator
        # (observed as the loss halving on dummy-heavy windows).
        return {
            "loss": asr_loss * c.asr_loss_weight,
            "loss_asr": asr_loss,
            "loss_den": jnp.sum(valid_target.astype(jnp.float32)),
        }

    def forward_asr_packed(
        self,
        latents: jnp.ndarray,  # [R, S, L, latent_dim] per-slot raw latents
        latent_mask: jnp.ndarray,  # [R, S, L] 1 = valid frame
        labels: jnp.ndarray,  # [R, S, T_text] target ids, -100 = ignore
        tok_ids: jnp.ndarray,  # [R, T_pack] prompt ids at prompt positions
        kind: jnp.ndarray,  # [R, T_pack] 0 pad / 1 audio / 2 SOA / 3 prompt
        gather_idx: jnp.ndarray,  # [R, T_pack] into the row's S*L embeds (S*L = zero)
        segment_ids: jnp.ndarray,  # [R, T_pack] 1..S, 0 = pad
        position_ids: jnp.ndarray,  # [R, T_pack] within-segment positions
        ctx_idx: jnp.ndarray,  # [R, S, L] into the row's T_pack hidden (T_pack = zero)
        train: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Packed-sequence ASR training: several [audio|SOA|prompt] segments
        share one LLM row under block-diagonal attention with per-segment
        RoPE positions, then each utterance's hidden states gather back out
        for the per-utterance cross-attn + flow loss. Numerically equal to
        forward_asr on each utterance solo (the projector runs on the
        unpacked per-slot layout, so its causal convs never cross segment
        boundaries; tests assert loss equality). Removes all pad compute
        from the LLM — the reference pads every row to max grid
        (train_calm.py:193-221). Batch layout: data/collator.pack_asr_window.
        Per-row indices keep every gather local to its row, so rows shard
        over data-parallel devices and slice into microbatches untouched.
        """
        c = self.cfg
        R, S, L, D = latents.shape
        H = c.qwen.hidden_size
        gt = self.normalize_latents(latents.reshape(R * S, L, D))
        audio_embeds = self.input_proj(gt).astype(self.dtype)  # (R*S, L, H)
        flat = audio_embeds.reshape(R, S * L, H)
        flat = jnp.concatenate([flat, jnp.zeros((R, 1, H), flat.dtype)], axis=1)
        audio_part = jnp.take_along_axis(flat, gather_idx[..., None], axis=1)
        tok = self.embed(tok_ids).astype(self.dtype)
        soa = self.soa_embed.astype(self.dtype)
        kindb = kind[..., None]
        inp = (
            jnp.where(kindb == 1, audio_part, 0)
            + jnp.where(kindb == 2, soa, 0)
            + jnp.where(kindb == 3, tok, 0)
        )
        hidden = self.llm(
            inp,
            attention_mask=(kind != 0).astype(jnp.int32),
            position_ids=position_ids,
            segment_ids=segment_ids,
            train=train,
        )
        hflat = jnp.concatenate(
            [hidden, jnp.zeros((R, 1, H), hidden.dtype)], axis=1
        )
        ctx = jnp.take_along_axis(
            hflat, ctx_idx.reshape(R, S * L)[..., None], axis=1
        )
        return self._asr_condition_and_loss(
            ctx.reshape(R * S, L, H),
            latent_mask.reshape(R * S, L),
            labels.reshape(R * S, labels.shape[-1]),
            train,
        )

    # ------------------------------------------------------------------
    # Inference-side helpers (full pipelines live in eval/)
    # ------------------------------------------------------------------
    def predict_length(
        self, text_ctx: jnp.ndarray, text_pad: jnp.ndarray
    ) -> jnp.ndarray:
        """Clamped frame-count prediction [B] (reference eval_calm.py:449-460)."""
        c = self.cfg
        valid_f = (~text_pad).astype(jnp.float32)
        text_mean = jnp.sum(
            text_ctx.astype(jnp.float32) * valid_f[:, :, None], axis=1
        ) / jnp.maximum(jnp.sum(valid_f, axis=1, keepdims=True), 1.0)
        len_pred = self.tts_len_predictor(text_mean.astype(self.dtype))
        text_len = jnp.sum(valid_f, axis=1)
        min_f = jnp.maximum(text_len * 2.0, 10.0)
        max_f = jnp.minimum(text_len * 12.0, float(c.max_audio_len))
        return jnp.clip(len_pred.astype(jnp.float32), min_f, max_f)

    def predict_durations(
        self, text_ctx: jnp.ndarray, text_pad: jnp.ndarray, num_frames: jnp.ndarray
    ) -> jnp.ndarray:
        """softplus durations scaled to num_frames [B] (eval_calm.py:466-476)."""
        dur_raw = self.tts_dur_predictor(text_ctx)
        dur = jax.nn.softplus(dur_raw.astype(jnp.float32)) + 1e-4
        dur = jnp.where(text_pad, 0.0, dur)
        dsum = jnp.maximum(jnp.sum(dur, axis=1, keepdims=True), 1e-4)
        return dur * (num_frames[:, None].astype(jnp.float32) / dsum)

    def tts_flow_fn(self, condition, x, t, context, context_mask, x_mask):
        return self.tts_flow_head(
            condition, x, t, context=context, context_mask=context_mask,
            x_mask=x_mask, train=False,
        )

    def asr_flow_fn(self, condition, x, t, context=None, context_mask=None,
                    x_mask=None):
        return self.asr_flow_head(condition, x, t, x_mask=x_mask, train=False)

    def asr_encode_audio(
        self, latents: jnp.ndarray, audio_mask: jnp.ndarray,
        prompt_ids: jnp.ndarray, prompt_mask: jnp.ndarray, num_queries: int,
    ) -> jnp.ndarray:
        """Audio + SOA + prompt through LLM, then positional-query cross-attn
        -> condition [B, num_queries, D] (reference eval_calm.py:306-352)."""
        c = self.cfg
        gt = self.normalize_latents(latents)
        B, T_aud, _ = gt.shape
        audio_embeds = self.input_proj(gt).astype(self.dtype)
        soa = jnp.broadcast_to(
            self.soa_embed.astype(self.dtype), (B, 1, c.qwen.hidden_size)
        )
        prompt_embeds = self.embed(prompt_ids).astype(self.dtype)
        inp = jnp.concatenate([audio_embeds, soa, prompt_embeds], axis=1)
        full_mask = jnp.concatenate(
            [
                audio_mask.astype(jnp.int32),
                jnp.ones((B, 1), jnp.int32),
                prompt_mask.astype(jnp.int32),
            ],
            axis=1,
        )
        hidden = self._llm_encode(inp, full_mask, train=False)
        audio_context = hidden[:, :T_aud, :]
        pos = jnp.clip(jnp.arange(num_queries), 0, c.max_text_len - 1)
        queries = jnp.broadcast_to(
            self.asr_query_embed(pos)[None].astype(self.dtype),
            (B, num_queries, c.qwen.hidden_size),
        )
        return self.asr_cross_attn(
            queries, audio_context, audio_context,
            key_padding_mask=audio_mask == 0, train=False,
        )


def init_calm_params(
    model: QwenCALM,
    rng: jax.Array,
    batch_size: int = 1,
    text_len: int = 4,
    audio_len: int = 8,
) -> Dict[str, Any]:
    """Initialize ALL components (both task branches share the tree).

    linen initializes lazily per code path, so forward_tts alone would skip
    the ASR cross-attn / query / head; init both and merge (identical seeds
    give identical shared params).

    Each branch init is wrapped in jax.jit: linen's Module.init executes
    EAGERLY (op by op), which for the flagship 1.5B model would mean
    thousands of device dispatches — prohibitive through a ~26 ms/dispatch
    remote-TPU tunnel (BASELINE.md calibration) and wasteful everywhere.
    Under jit the whole init is ONE compiled program; values are identical
    (tracing does not change flax's deterministic RNG folding).
    """
    import functools

    c = model.cfg
    rngs = {
        "params": rng,
        "flow": jax.random.fold_in(rng, 1),
        "dropout": jax.random.fold_in(rng, 2),
    }
    text_ids = jnp.zeros((batch_size, text_len), jnp.int32)
    mask = jnp.ones((batch_size, text_len), jnp.int32)
    latents = jnp.zeros((batch_size, audio_len, c.latent_dim), jnp.float32)
    amask = jnp.ones((batch_size, audio_len), jnp.int32)
    labels = jnp.zeros((batch_size, text_len), jnp.int32)
    p_tts = jax.jit(functools.partial(
        model.init, train=False, method=QwenCALM.forward_tts,
    ))(rngs, text_ids, mask, latents, amask)["params"]
    p_asr = jax.jit(functools.partial(
        model.init, train=False, method=QwenCALM.forward_asr,
    ))(rngs, text_ids, mask, latents, amask, labels)["params"]
    merged = {**p_asr, **p_tts}
    # SOA initialized from the mean vocab embedding, as the reference does
    merged["soa_embed"] = init_soa_value(merged["embed"]["embedding"])
    return merged


def init_soa_value(embedding_table: jnp.ndarray) -> jnp.ndarray:
    """Mean of vocab embeddings 1000..2000 as the SOA init
    (reference modeling_calm.py:568-572); clipped for tiny test vocabs."""
    v = embedding_table.shape[0]
    lo = min(1000, max(v // 2, 0))
    hi = min(2000, v)
    return jnp.mean(embedding_table[lo:hi], axis=0).reshape(1, 1, -1)
