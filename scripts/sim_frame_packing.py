"""Simulate DiT frame-packing gains over the shipped packed-TTS recipe.

The parked "frame-pack the DiT side" lever (BASELINE.md "TTS sequence
packing"), quantified without building it: replays the collator's
decisions (window sort -> 128-slot groups -> bucket -> text FFD into 16
LLM rows) on the LibriTTS-like fold corpus, then frame-packs each LLM
row's segments' valid frames into Ff frame rows of length Lf = t_bucket
(no utterance may split across rows — attention is per-utterance). A
static Ff is a compile key, so each allowed Ff value is one more XLA
program per audio bucket; groups where any row's frames don't fit fall
back to the per-slot program (factor 1.0).

Step-time model from the measured per-bucket table (BASELINE.md):
  step(t, positions_factor) = LLM_CONST + AUDIO_SLOPE * t * factor
fit from the shipped Ff=8 numbers; packed legs carry a 5% gather/mask
overhead on the audio side.

Conclusion (run it): +7.0% samples/s needs FIVE Ff variants per bucket
(40 programs over the 8-bucket ladder); 2-3 variants give +3-5%, within
reach of the overhead uncertainty. Parked with these numbers — the
complexity (per-frame AdaLN maps, segment-masked self/cross attention,
packed-context gathers on the numerics-critical path) buys single
digits only.
"""
import numpy as np

ROWS, ROW_LEN, SEGS = 16, 256, 8
MAXTXT = 96
BUCKETS = [48, 96, 144, 192, 240, 288, 336, 384]
# shipped per-bucket step times (ms), 128 slots padded to bucket
MEAS = {48: 387, 96: 409, 144: 468, 192: 497, 240: 526, 288: 621, 336: 662, 384: 702}
FPS = 384 / 24.576
TOK0, TOK_PER_S = 13, 3.3
WINDOW = 16

def tok_of(frames):
    return int(np.clip(np.round(TOK0 + frames / FPS * TOK_PER_S), 14, MAXTXT))

def fold_lengths(n=20000, mean_s=5.9, sig=0.6):
    mu = float(np.log(mean_s) - 0.5 * sig * sig)
    npr = np.random.default_rng(12345)
    dur = np.exp(npr.normal(mu, sig, n))
    return np.clip(np.round(dur * FPS).astype(int), 8, 384)

def plan_pack(costs, rows, row_len, segments):
    order = sorted(range(len(costs)), key=lambda i: -costs[i])
    caps = [row_len] * rows
    counts = [0] * rows
    assign = [[] for _ in range(rows)]
    leftover = []
    for i in order:
        for r in range(rows):
            if counts[r] < segments and caps[r] >= costs[i]:
                assign[r].append(i); caps[r] -= costs[i]; counts[r] += 1
                break
        else:
            leftover.append(i)
    return assign, leftover

# linear fit of step(t) = A + B*t  (positions factor 1 = 8 slot-rows/LLM row)
ts = np.array(sorted(MEAS)); ys = np.array([MEAS[t] for t in sorted(MEAS)])
B_, A_ = np.polyfit(ts, ys, 1)
print(f"step model: {A_:.1f} ms + {B_:.4f} ms/frame (128 slots)")

def step_time(t_bucket, pos_factor, overhead=1.05):
    # audio side scales with packed positions; gathers/masks cost ~5% on it
    return A_ + B_ * t_bucket * pos_factor * overhead

def simulate(ff_choices, lf_mult=1.0, overhead=1.05):
    lens = list(fold_lengths())
    gsize = ROWS * SEGS
    i, carry, pendings = 0, [], []
    total_t = 0.0; utts = 0; n_groups = 0; n_fallback = 0
    pos_packed = pos_unpacked = 0
    while True:
        if not pendings:
            want = gsize * WINDOW
            pool, carry = carry, []
            while len(pool) < want and i < len(lens):
                pool.append(lens[i]); i += 1
            if not pool: break
            pool.sort()
            pendings = [pool[j:j+gsize] for j in range(0, len(pool), gsize)]
        group = pendings.pop(0)
        t_aud = next((b for b in BUCKETS if b >= max(group)), BUCKETS[-1])
        costs = [tok_of(n) + 1 for n in group]
        assign, left = plan_pack(costs, ROWS, ROW_LEN, SEGS)
        placed = [[group[i] for i in idxs] for idxs in assign]
        n_placed = sum(len(p) for p in placed)
        # frame packing per LLM row: FFD frames into Ff rows of Lf
        Lf = int(round(t_aud * lf_mult))
        best = None
        for Ff in ff_choices:
            ok = True
            for row in placed:
                a, _lo = plan_pack([min(n, t_aud) for n in row], Ff, Lf, SEGS)
                if _lo: ok = False; break
            if ok: best = Ff; break
        if best is None:
            n_fallback += 1
            factor = 1.0
            pos_unpacked += ROWS * SEGS * t_aud
        else:
            factor = best * Lf / (SEGS * t_aud)
            pos_packed += ROWS * best * Lf
        total_t += step_time(t_aud, factor, overhead)
        utts += n_placed; n_groups += 1
        carry.extend(group[i] for i in left)
    return utts / (total_t / 1000.0), n_groups, n_fallback

base, ng, _ = simulate([SEGS], overhead=1.0)
print(f"baseline (shipped model): {base:.1f} samples/s over {ng} groups")
for choices in ([4,5,6,7,8],[5,6,8],[6,8],[5,8],[6,7,8],[4,6,8]):
    s, ng, nf = simulate(choices)
    print(f"Ff choices {choices}: {s:.1f} samples/s (+{100*(s/base-1):.1f}%), fallback {nf}/{ng}")
# longer frame rows: Lf = 2*t, halve Ff
for choices in ([2,3,4],[3,4],[2,4]):
    s, ng, nf = simulate(choices, lf_mult=2.0)
    print(f"Lf=2t Ff {choices}: {s:.1f} samples/s (+{100*(s/base-1):.1f}%), fallback {nf}/{ng}")
