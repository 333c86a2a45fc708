"""Batching: static-shape collation + task-homogeneous batch loader.

The reference pads each batch to its longest member (train_calm.py:193-221),
which under XLA would trigger a recompile per unique shape. Here every batch
is padded to the static (max_text_len, max_audio_len) grid — jit compiles
exactly twice (tts + asr programs).

SpecAugment (one random 5-10 frame time mask on ASR training batches) matches
reference train_calm.py:184-191.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Tuple  # noqa: F401

import numpy as np

from audio_calm_tpu.data.datasets import CalmDataset, CalmExample, MelDataset


def spec_augment(
    audio: np.ndarray, rng: np.random.Generator, min_len: int = 5, max_len: int = 10
) -> np.ndarray:
    """Zero one random time span of min_len..max_len frames (T > 20 only)."""
    T = audio.shape[0]
    if T <= 20:
        return audio
    mask_len = int(rng.integers(min_len, max_len + 1))
    t0 = int(rng.integers(0, T - mask_len + 1))
    audio = audio.copy()
    audio[t0 : t0 + mask_len] = 0.0
    return audio


def collate_calm(
    examples: List[CalmExample],
    pad_token_id: int,
    max_text_len: int,
    max_audio_len: int,
    latent_dim: int,
    training: bool = False,
    rng: Optional[np.random.Generator] = None,
    text_pad: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """-> static-shape batch dict (channels-last audio [B, T, D]).

    text_pad: optional LLM-prompt width for text_ids/attention_mask
    (labels always pad to max_text_len — they size the flow-head query
    grid, not the LLM sequence). Used for ASR batches, whose prompt is a
    constant ~20 tokens (see DataConfig.asr_text_pad)."""
    B = len(examples)
    t_txt = text_pad if text_pad is not None else max_text_len
    text_ids = np.full((B, t_txt), pad_token_id, np.int32)
    labels = np.full((B, max_text_len), -100, np.int32)
    audio = np.zeros((B, max_audio_len, latent_dim), np.float32)
    attention_mask = np.zeros((B, t_txt), np.int32)
    audio_mask = np.zeros((B, max_audio_len), np.int32)
    for i, ex in enumerate(examples):
        ids = ex.input_ids[:t_txt]
        text_ids[i, : len(ids)] = ids
        attention_mask[i, : len(ids)] = 1
        lab = ex.labels[:max_text_len]
        labels[i, : len(lab)] = lab
        a = ex.audio[:max_audio_len]
        if training and ex.mode == "asr" and rng is not None:
            a = spec_augment(a, rng)
        audio[i, : len(a)] = a
        audio_mask[i, : len(a)] = 1
    return {
        "text_ids": text_ids,
        "attention_mask": attention_mask,
        "labels": labels,
        "latents": audio,
        "audio_mask": audio_mask,
    }


def plan_pack(
    costs: List[int], rows: int, row_len: int, segments: int
) -> Tuple[List[List[int]], List[int]]:
    """First-fit-decreasing pack of per-item token costs into `rows` rows
    of `row_len` capacity, at most `segments` items per row.

    -> (assign: per row the item positions in packing order, leftover
    positions). Deterministic in the input order (stable sort), so every
    process of a multi-host run derives the identical plan from identical
    costs — the basis of metadata-planned multi-host packing."""
    order = sorted(range(len(costs)), key=lambda i: -costs[i])
    caps = [row_len] * rows
    counts = [0] * rows
    assign: List[List[int]] = [[] for _ in range(rows)]
    leftover: List[int] = []
    for i in order:
        for r in range(rows):
            if counts[r] < segments and caps[r] >= costs[i]:
                assign[r].append(i)
                caps[r] -= costs[i]
                counts[r] += 1
                break
        else:
            leftover.append(i)
    return assign, leftover


def materialize_asr_rows(
    row_items: List[List[Optional[CalmExample]]],
    prompt_ids: np.ndarray,
    row_len: int,
    segments: int,
    seg_frames: int,
    latent_dim: int,
    max_text_len: int,
    training: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> Dict[str, np.ndarray]:
    """Build the packed-ASR arrays for `row_items` rows (None = failed
    load -> dummy slot the model masks out). Index arrays are row-local,
    so any row subset — a multi-host process's own rows, a data-parallel
    shard, a microbatch slice — is self-contained."""
    rows = len(row_items)
    P = len(prompt_ids)
    latents = np.zeros((rows, segments, seg_frames, latent_dim), np.float32)
    latent_mask = np.zeros((rows, segments, seg_frames), np.int32)
    labels = np.full((rows, segments, max_text_len), -100, np.int32)
    tok_ids = np.zeros((rows, row_len), np.int32)
    kind = np.zeros((rows, row_len), np.int32)
    # default gathers point at the appended zero slot (S*L / row_len)
    gather_idx = np.full((rows, row_len), segments * seg_frames, np.int32)
    segment_ids = np.zeros((rows, row_len), np.int32)
    position_ids = np.zeros((rows, row_len), np.int32)
    ctx_idx = np.full((rows, segments, seg_frames), row_len, np.int32)

    for r, items in enumerate(row_items):
        t = 0
        for s, ex in enumerate(items):
            if ex is None:  # failed load: dummy slot, masked out of loss
                continue
            a = ex.audio[:seg_frames]
            if training and rng is not None:
                a = spec_augment(a, rng)
            n = len(a)
            latents[r, s, :n] = a
            latent_mask[r, s, :n] = 1
            lab = ex.labels[:max_text_len]
            labels[r, s, : len(lab)] = lab
            kind[r, t : t + n] = 1
            gather_idx[r, t : t + n] = s * seg_frames + np.arange(n)
            ctx_idx[r, s, :n] = t + np.arange(n)
            segment_ids[r, t : t + n + 1 + P] = s + 1
            position_ids[r, t : t + n + 1 + P] = np.arange(n + 1 + P)
            kind[r, t + n] = 2
            kind[r, t + n + 1 : t + n + 1 + P] = 3
            tok_ids[r, t + n + 1 : t + n + 1 + P] = prompt_ids
            t += n + 1 + P

    return {
        "latents": latents,
        "latent_mask": latent_mask,
        "labels": labels,
        "tok_ids": tok_ids,
        "kind": kind,
        "gather_idx": gather_idx,
        "segment_ids": segment_ids,
        "position_ids": position_ids,
        "ctx_idx": ctx_idx,
    }


def pack_asr_window(
    examples: List[CalmExample],
    prompt_ids: np.ndarray,
    rows: int,
    row_len: int,
    segments: int,
    seg_frames: int,
    latent_dim: int,
    max_text_len: int,
    training: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[Dict[str, np.ndarray], List[int]]:
    """First-fit-decreasing pack of ASR examples into `rows` LLM rows.

    Each packed segment is [audio (exact length) | SOA | prompt] — no pad
    tokens between segments, the constant prompt rides unpadded. Returns
    (batch, leftover_indices): the static packed batch consumed by
    QwenCALM.forward_asr_packed, and indices of examples that did not fit
    (carried into the next window by the iterator).
    """
    P = len(prompt_ids)
    if row_len < seg_frames + 1 + P:
        raise ValueError(
            f"asr_pack_len={row_len} cannot fit a max-length segment "
            f"({seg_frames} frames + SOA + {P}-token prompt)"
        )
    costs = [min(len(e.audio), seg_frames) + 1 + P for e in examples]
    assign, leftover = plan_pack(costs, rows, row_len, segments)
    batch = materialize_asr_rows(
        [[examples[i] for i in idxs] for idxs in assign],
        prompt_ids, row_len, segments, seg_frames, latent_dim,
        max_text_len, training=training, rng=rng,
    )
    return batch, leftover


def pack_tts_window(
    examples: List[CalmExample],
    rows: int,
    row_len: int,
    segments: int,
    t_aud: int,
    latent_dim: int,
    max_text_len: int,
) -> Tuple[Dict[str, np.ndarray], List[int]]:
    """First-fit-decreasing pack of TTS texts into `rows` LLM rows.

    Each packed segment is [text (exact length) | SOA]; the audio/DiT side
    stays per-slot at the `t_aud` grid (callers bucket it). Returns
    (batch, leftover_indices) for QwenCALM.forward_tts_packed; index arrays
    are row-local so row subsets (data-parallel shards, microbatch slices)
    are self-contained. Empty slots are dummies (all-zero text_mask) the
    model masks out of every loss term.
    """
    if row_len < max_text_len + 1:
        raise ValueError(
            f"tts_pack_len={row_len} cannot fit a max-length segment "
            f"({max_text_len} tokens + SOA)"
        )
    costs = [min(len(e.input_ids), max_text_len) + 1 for e in examples]
    assign, leftover = plan_pack(costs, rows, row_len, segments)
    batch = materialize_tts_rows(
        [[examples[i] for i in idxs] for idxs in assign],
        row_len, segments, t_aud, latent_dim, max_text_len,
    )
    return batch, leftover


def materialize_tts_rows(
    row_items: List[List[Optional[CalmExample]]],
    row_len: int,
    segments: int,
    t_aud: int,
    latent_dim: int,
    max_text_len: int,
) -> Dict[str, np.ndarray]:
    """Build the packed-TTS arrays for `row_items` rows (None = failed
    load -> dummy slot). Row-local indices: any row subset is
    self-contained (multi-host process rows, DP shards, microbatch
    slices)."""
    rows = len(row_items)
    latents = np.zeros((rows, segments, t_aud, latent_dim), np.float32)
    audio_mask = np.zeros((rows, segments, t_aud), np.int32)
    text_mask = np.zeros((rows, segments, max_text_len), np.int32)
    tok_ids = np.zeros((rows, row_len), np.int32)
    kind = np.zeros((rows, row_len), np.int32)
    segment_ids = np.zeros((rows, row_len), np.int32)
    position_ids = np.zeros((rows, row_len), np.int32)
    # default gathers point at the appended zero slot (row_len)
    ctx_idx = np.full((rows, segments, max_text_len), row_len, np.int32)
    soa_idx = np.full((rows, segments), row_len, np.int32)

    for r, items in enumerate(row_items):
        t = 0
        for s, ex in enumerate(items):
            if ex is None:  # failed load: dummy slot, masked out of loss
                continue
            ids = ex.input_ids[:max_text_len]
            n = len(ids)
            a = ex.audio[:t_aud]
            latents[r, s, : len(a)] = a
            audio_mask[r, s, : len(a)] = 1
            text_mask[r, s, :n] = 1
            tok_ids[r, t : t + n] = ids
            kind[r, t : t + n] = 1
            kind[r, t + n] = 2
            ctx_idx[r, s, :n] = t + np.arange(n)
            soa_idx[r, s] = t + n
            segment_ids[r, t : t + n + 1] = s + 1
            position_ids[r, t : t + n + 1] = np.arange(n + 1)
            t += n + 1

    return {
        "latents": latents,
        "audio_mask": audio_mask,
        "text_mask": text_mask,
        "tok_ids": tok_ids,
        "kind": kind,
        "segment_ids": segment_ids,
        "position_ids": position_ids,
        "ctx_idx": ctx_idx,
        "soa_idx": soa_idx,
    }


def estimate_packed_steps_per_epoch(
    dataset: CalmDataset,
    task: str,
    rows: int,
    row_len: int,
    segments: int,
    sample: int = 128,
    fill: float = 0.9,
    seed: int = 0,
) -> int:
    """Estimate optimizer steps one epoch of the packed iterator takes.

    A packed step consumes ~rows x row_len/mean_cost utterances, not
    batch_size — without this, num_train_epochs x (n_items/batch_size)
    over-runs the configured passes over the data several-fold. Costs are
    sampled from `sample` real items (tokens for TTS, latent frames +
    prompt for ASR); `fill` discounts FFD fragmentation (measured 0.87
    TTS / 0.97 ASR — 0.9 keeps the estimate conservative either way).
    The LR schedule uses this estimate; the STOP is exact regardless
    (the iterator exhausts after its `epochs` passes)."""
    items = dataset.tts_items if task == "tts" else dataset.asr_items
    n = len(items)
    if n == 0:
        return 0
    rng = np.random.default_rng(seed)
    costs = []
    for i in rng.permutation(n)[:sample]:
        ex = dataset.get(task, int(i))
        if ex is None:
            continue
        if task == "tts":
            costs.append(min(len(ex.input_ids), dataset.max_text_len) + 1)
        else:
            costs.append(min(len(ex.audio), dataset.max_audio_len) + 1
                         + len(dataset.asr_prompt_ids))
    if not costs:
        return max(n // max(rows * segments, 1), 1)
    per_row = max(row_len * fill / float(np.mean(costs)), 1.0)
    utts = max(min(rows * segments, int(rows * per_row)), 1)
    return max(int(np.ceil(n / utts)), 1)


def calm_batch_iterator(
    dataset: CalmDataset,
    batch_size: int,
    pad_token_id: int,
    latent_dim: int,
    task_prob_tts: float = 0.5,
    training: bool = True,
    seed: int = 0,
    epochs: Optional[int] = None,
    audio_buckets: Optional[List[int]] = None,
    length_group_window: int = 0,
    asr_text_pad: Optional[int] = None,
    asr_pack_rows: int = 0,
    asr_pack_len: int = 512,
    asr_pack_segments: int = 4,
    tts_pack_rows: int = 0,
    tts_pack_len: int = 256,
    tts_pack_segments: int = 8,
    process_index: int = 0,
    process_count: int = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield task-homogeneous static batches, dropping ragged tails.

    Each batch's task is drawn ~ Bernoulli(task_prob_tts) among available
    tasks; corrupt samples are skipped and backfilled (the reference instead
    emits dummy batches, train_calm.py:223-231).

    With audio_buckets (ascending lengths), each batch pads its audio to the
    smallest bucket that fits its longest example — one jit compile per
    (task, bucket) shape instead of always paying max_audio_len.

    length_group_window = N > 0 enables length-grouped batching (the
    reference keeps per-item lengths for HF's group_by_length but ships it
    DISABLED, train_calm.py:113-117): examples are drawn N batches at a
    time from the shuffled order, sorted by audio length, sliced into
    batches, and the batch order within the window reshuffled. Random
    draws scatter one long utterance into most batches, dragging every
    batch up to the top bucket; sorted windows concentrate batches into
    the SMALLEST bucket that fits, so the static bucket shapes actually
    pay off (measured on the LibriSpeech length distribution — see
    BASELINE.md). Each example is still seen exactly once per epoch, and
    the task stream (Bernoulli per batch) is unchanged — grouping only
    reorders rows WITHIN a task.

    Multi-host: with process_count > 1, `batch_size` is the GLOBAL batch;
    every process draws the identical order/task stream (same seed) but
    loads ONLY its batch_size/process_count rows (process_index slice).
    To keep the streams lock-stepped without cross-host agreement, corrupt
    items become zero-filled stubs instead of being backfilled (the
    reference's dummy-batch behavior), and audio_buckets are ignored for
    SOLO batches (bucket choice would depend on rows other processes
    hold). Sequence packing STAYS ON multi-host when the store supports
    header-only metadata (CalmDataset.supports_meta — npz/npy, not .pt)
    and pack rows shard evenly: every process derives the identical pack
    plan (FFD over tokenized-text / header-read-frame costs, shared order
    stream) and materializes only its own rows, so grouping + buckets
    keep working for the packed stream; a row owner's failed load becomes
    a dummy slot in its own rows — invisible to other processes. Requires
    identical corpus copies on every host (the same contract the shared
    order stream already assumes). Assemble yielded shards into global
    arrays with parallel.mesh.shard_host_batch.
    """
    if process_count > 1:
        if batch_size % process_count:
            raise ValueError(
                f"global batch {batch_size} not divisible by "
                f"{process_count} processes"
            )
        # packed streams keep buckets/grouping (shared metadata plan);
        # solo batches lose them (choices would depend on other rows)
        pack_buckets = sorted(audio_buckets) if audio_buckets else None
        pack_window = length_group_window

        def _meta_ok(mode):  # stand-in datasets may lack supports_meta
            fn = getattr(dataset, "supports_meta", None)
            return callable(fn) and fn(mode)

        def _gate(mode, rows):
            if rows <= 0:
                return rows
            if rows % process_count == 0 and _meta_ok(mode):
                return rows
            # this silently costs the measured +121%/+187% packed wins —
            # make the degradation loud and name the one-shot fix
            import warnings

            warnings.warn(
                f"multi-host {mode} sequence packing DISABLED: the store "
                "has no header-readable metadata (.pt files?) or "
                f"{mode}_pack_rows={rows} does not shard over "
                f"{process_count} processes — falling back to plain "
                "batches. For reference-format .pt corpora, run "
                "scripts/convert_store.py once to regain packing.",
                stacklevel=2)
            return 0

        asr_pack_rows = _gate("asr", asr_pack_rows)
        tts_pack_rows = _gate("tts", tts_pack_rows)
        audio_buckets = None
        length_group_window = 0
    else:
        if audio_buckets:
            audio_buckets = sorted(audio_buckets)
        pack_buckets = audio_buckets
        pack_window = length_group_window
    if asr_pack_rows > 0:
        _p = len(dataset.asr_prompt_ids)
        if asr_pack_len < dataset.max_audio_len + 1 + _p:
            raise ValueError(
                f"asr_pack_len={asr_pack_len} cannot fit a max-length "
                f"segment ({dataset.max_audio_len} frames + SOA + "
                f"{_p}-token prompt)"
            )
    if tts_pack_rows > 0 and tts_pack_len < dataset.max_text_len + 1:
        raise ValueError(
            f"tts_pack_len={tts_pack_len} cannot fit a max-length segment "
            f"({dataset.max_text_len} tokens + SOA)"
        )
    # ASR prompt width: the prompt is the constant asr_prompt_ids, so the
    # width is content-independent (multi-host safe) — never narrower than
    # the prompt itself, so nothing is ever truncated
    if asr_text_pad is not None:
        asr_text_pad = min(
            dataset.max_text_len,
            max(int(asr_text_pad), len(dataset.asr_prompt_ids)),
        )
    # order/task draws come from `rng` and are identical on every process;
    # SpecAugment uses a separate per-process stream so augmentation cannot
    # desynchronize the shared order stream
    rng = np.random.default_rng(seed)
    aug_rng = np.random.default_rng((seed, process_index))
    # window-shuffle draws come from their own stream so enabling grouping
    # does not shift the shared order/task stream
    group_rng = np.random.default_rng((seed, 0x67726F75))
    per = batch_size // process_count
    lo, hi = process_index * per, (process_index + 1) * per
    epoch = 0
    while epochs is None or epoch < epochs:
        orders = {}
        if dataset.tts_items:
            orders["tts"] = list(rng.permutation(len(dataset.tts_items)))
        if dataset.asr_items:
            orders["asr"] = list(rng.permutation(len(dataset.asr_items)))
        if not orders:
            return
        cursors = {k: 0 for k in orders}
        # length grouping state: sorted-window batches queued per task, plus
        # the (< batch_size) leftover of each window carried into the next
        # so corrupt-skip raggedness never drops mid-epoch examples
        pending = {k: [] for k in orders}
        carry = {k: [] for k in orders}
        pack_carry: List[CalmExample] = []  # packed-ASR window leftovers
        tts_pack_carry: List[CalmExample] = []  # packed-TTS leftovers
        tts_pending: List[List[CalmExample]] = []  # length-grouped groups
        yielded = False

        def _avail(k):
            if k == "asr" and asr_pack_rows > 0:
                # a pool of >= rows utterances fills every row at least
                # once; the < rows epoch tail drops (same contract as the
                # < batch_size tail below)
                return bool(pack_carry) or (
                    cursors[k] + asr_pack_rows <= len(orders[k])
                )
            if k == "tts" and tts_pack_rows > 0:
                return bool(tts_pending) or bool(tts_pack_carry) or (
                    cursors[k] + tts_pack_rows <= len(orders[k])
                )
            return pending[k] or cursors[k] + batch_size <= len(orders[k])

        while True:
            avail = [k for k in orders if _avail(k)]
            if not avail:
                break
            if "tts" in avail and (
                "asr" not in avail or rng.random() < task_prob_tts
            ):
                task = "tts"
            else:
                task = "asr"
            if task == "asr" and asr_pack_rows > 0:
                # sequence packing: draw a pool, FFD-pack into static rows,
                # carry what didn't fit into the next window (tail pools at
                # epoch end are emitted underfull rather than dropped).
                # Pool entries are (payload, llm_tokens, frames): payload is
                # the loaded example single-host, or the dataset index
                # multi-host (metadata plan; owners load only their rows)
                meta_mode = process_count > 1
                P = len(dataset.asr_prompt_ids)
                want = asr_pack_rows * asr_pack_segments
                pool = pack_carry
                pack_carry = []
                while (len(pool) < want
                       and cursors[task] < len(orders[task])):
                    j = orders[task][cursors[task]]
                    cursors[task] += 1
                    if meta_mode:
                        # unreadable header -> stub cost, kept in the plan
                        # so every process plans identically; the owner's
                        # failed load zero-masks the slot
                        m = dataset.meta(task, j)
                        pool.append((j,) + (m or (P, 1)))
                    else:
                        ex = dataset.get(task, j)
                        if ex is not None:
                            pool.append((
                                ex, P,
                                min(len(ex.audio), dataset.max_audio_len),
                            ))
                if not pool:
                    continue
                costs = [e[2] + 1 + P for e in pool]
                assign, left = plan_pack(
                    costs, asr_pack_rows, asr_pack_len, asr_pack_segments)
                if meta_mode:
                    rpp = asr_pack_rows // process_count
                    mine = assign[process_index * rpp:
                                  (process_index + 1) * rpp]
                    row_items = [[dataset.get(task, pool[i][0])
                                  for i in idxs] for idxs in mine]
                else:
                    row_items = [[pool[i][0] for i in idxs]
                                 for idxs in assign]
                batch = materialize_asr_rows(
                    row_items, dataset.asr_prompt_ids, asr_pack_len,
                    asr_pack_segments, dataset.max_audio_len, latent_dim,
                    dataset.max_text_len, training=training, rng=aug_rng,
                )
                pack_carry = [pool[i] for i in left]
                batch["task"] = "asr_packed"
                # true utterance count for samples/sec accounting (the
                # leading dim is packed ROWS, not samples); multi-host it
                # counts THIS process's loaded slots
                batch["n_samples"] = sum(
                    1 for row in row_items for ex in row if ex is not None)
                yielded = True
                yield batch
                continue
            if task == "tts" and tts_pack_rows > 0:
                # TTS packing composes with length grouping: the pool is
                # sorted by audio length and sliced into row-set groups, so
                # each group's audio pads to the smallest bucket that fits
                # while its texts FFD-pack into the LLM rows. Same
                # (payload, llm_tokens, frames) entries as the ASR branch
                meta_mode = process_count > 1
                if not tts_pending:
                    gsize = tts_pack_rows * tts_pack_segments
                    want = gsize * max(pack_window, 1)
                    pool = tts_pack_carry
                    tts_pack_carry = []
                    while (len(pool) < want
                           and cursors[task] < len(orders[task])):
                        j = orders[task][cursors[task]]
                        cursors[task] += 1
                        if meta_mode:
                            m = dataset.meta(task, j)
                            pool.append((j,) + (m or (1, 1)))
                        else:
                            ex = dataset.get(task, j)
                            if ex is not None:
                                pool.append((
                                    ex,
                                    min(len(ex.input_ids),
                                        dataset.max_text_len),
                                    min(len(ex.audio),
                                        dataset.max_audio_len),
                                ))
                    if not pool:
                        continue
                    if pack_window > 0:
                        pool.sort(key=lambda e: e[2])  # stable, audio len
                    groups = [pool[i: i + gsize]
                              for i in range(0, len(pool), gsize)]
                    if pack_window > 0:
                        group_rng.shuffle(groups)
                    tts_pending.extend(groups)
                group = tts_pending.pop(0)
                t_aud = dataset.max_audio_len
                if pack_buckets:
                    longest = max(e[2] for e in group)
                    t_aud = next(
                        (b for b in pack_buckets if b >= longest),
                        dataset.max_audio_len,
                    )
                costs = [e[1] + 1 for e in group]
                assign, left = plan_pack(
                    costs, tts_pack_rows, tts_pack_len, tts_pack_segments)
                if meta_mode:
                    rpp = tts_pack_rows // process_count
                    mine = assign[process_index * rpp:
                                  (process_index + 1) * rpp]
                    row_items = [[dataset.get(task, group[i][0])
                                  for i in idxs] for idxs in mine]
                else:
                    row_items = [[group[i][0] for i in idxs]
                                 for idxs in assign]
                batch = materialize_tts_rows(
                    row_items, tts_pack_len, tts_pack_segments, t_aud,
                    latent_dim, dataset.max_text_len,
                )
                tts_pack_carry.extend(group[i] for i in left)
                batch["task"] = "tts_packed"
                batch["n_samples"] = sum(
                    1 for row in row_items for ex in row if ex is not None)
                yielded = True
                yield batch
                continue
            if process_count > 1:
                idxs = orders[task][cursors[task] : cursors[task] + batch_size]
                cursors[task] += batch_size
                examples = []
                for j in idxs[lo:hi]:
                    ex = dataset.get(task, j)
                    if ex is None:  # zero stub keeps processes lock-stepped
                        ex = CalmExample(
                            input_ids=np.asarray([pad_token_id], np.int32),
                            labels=np.asarray([-100], np.int32),
                            audio=np.zeros((1, latent_dim), np.float32),
                            mode=task,
                        )
                    examples.append(ex)
            elif length_group_window > 0:
                if not pending[task]:
                    want = batch_size * length_group_window
                    window = carry[task]
                    carry[task] = []
                    while (len(window) < want
                           and cursors[task] < len(orders[task])):
                        ex = dataset.get(task, orders[task][cursors[task]])
                        cursors[task] += 1
                        if ex is not None:
                            window.append(ex)
                    window.sort(key=lambda e: len(e.audio))  # stable
                    n_full = len(window) - len(window) % batch_size
                    groups = [window[i: i + batch_size]
                              for i in range(0, n_full, batch_size)]
                    carry[task] = window[n_full:]
                    # reshuffle batch order so short batches aren't always
                    # first within a window (keeps SGD length-unbiased at
                    # window granularity)
                    group_rng.shuffle(groups)
                    pending[task].extend(groups)
                if not pending[task]:
                    break
                examples = pending[task].pop(0)
            else:
                examples = []
                while (len(examples) < batch_size
                       and cursors[task] < len(orders[task])):
                    ex = dataset.get(task, orders[task][cursors[task]])
                    cursors[task] += 1
                    if ex is not None:
                        examples.append(ex)
                if len(examples) < batch_size:
                    break
            t_aud = dataset.max_audio_len
            if audio_buckets:
                longest = max(len(ex.audio) for ex in examples)
                t_aud = next(
                    (b for b in audio_buckets if b >= longest),
                    dataset.max_audio_len,
                )
            batch = collate_calm(
                examples, pad_token_id, dataset.max_text_len,
                t_aud, latent_dim, training=training, rng=aug_rng,
                text_pad=asr_text_pad if task == "asr" else None,
            )
            batch["task"] = task  # host-side routing key (not a device array)
            yielded = True
            yield batch
        if training and not yielded:
            # batch counts don't change across epochs, so a zero-batch epoch
            # would repeat forever (a 100%-CPU spin with epochs=None)
            raise ValueError(
                f"no full batch can be formed: dataset has "
                f"{len(dataset.tts_items)} tts + {len(dataset.asr_items)} asr "
                f"items but (global) batch_size={batch_size}; reduce the "
                f"batch size or add data"
            )
        epoch += 1
        if not training:
            return


def mel_batch_iterator(
    dataset: MelDataset,
    batch_size: int,
    training: bool = True,
    seed: int = 0,
    epochs: Optional[int] = None,
    process_index: int = 0,
    process_count: int = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    """Multi-host: batch_size is GLOBAL; each process yields its
    batch_size/process_count slice (same order stream; failed loads become
    zero mels so processes stay lock-stepped)."""
    if process_count > 1 and batch_size % process_count:
        raise ValueError(
            f"global batch {batch_size} not divisible by {process_count}"
        )
    rng = np.random.default_rng(seed)
    crop_rng = np.random.default_rng((seed, process_index))
    per = batch_size // process_count
    lo, hi = process_index * per, (process_index + 1) * per
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(len(dataset))
        yielded = False
        for i in range(0, len(order) - batch_size + 1, batch_size):
            mels = []
            for j in order[i : i + batch_size][lo:hi]:
                try:
                    mels.append(
                        dataset.get(int(j), crop_rng if training else None)
                    )
                except Exception:
                    if process_count > 1:
                        mels.append(
                            np.zeros((dataset.crop_size, 80), np.float32)
                        )
                    continue
            if len(mels) < (hi - lo):
                continue
            yielded = True
            yield {"mel": np.stack(mels)}
        if training and not yielded:
            # see calm_batch_iterator: a zero-batch epoch repeats forever
            raise ValueError(
                f"no full batch can be formed: dataset has {len(dataset)} "
                f"items but (global) batch_size={batch_size}; reduce the "
                f"batch size or add data"
            )
        epoch += 1
        if not training:
            return
