"""Sanity-check invariants (the reference's de-facto test layer, SURVEY §4).

Ports the three invariants of scripts/run_sanity_checks.py plus the
latent-store audit of scripts/check_latents.py:

  1. VAE upper bound: decode ground-truth latents; if this is bad nothing
     downstream can work.
  2. Flow learning: TTS flow loss vs. the analytic pred_v=0 baseline of 2.0
     (E||x1 - x0||^2 for unit Gaussians), verdict thresholds 0.5x / 0.9x.
  3. Length/duration predictor accuracy: relative-error mean/p50/p90 with
     MAS-derived duration ground truth (same derivation as training).
  4. Latent store audit: NaN/Inf counts + global moments with rescale
     advice when std is outside [0.5, 2.0].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterable, List, Optional

import jax
import numpy as np

FLOW_BASELINE = 2.0  # pred_v = 0 MSE for unit-Gaussian pairs


def flow_learning_verdict(loss: float) -> str:
    """Reference thresholds (run_sanity_checks.py:261-269)."""
    if loss < 0.5 * FLOW_BASELINE:
        return "PASS"  # clearly learning
    if loss < 0.9 * FLOW_BASELINE:
        return "WARN"  # barely below baseline
    return "FAIL"  # not learning


@dataclass
class LatentAudit:
    n_files: int
    n_nan: int
    n_inf: int
    mean: float
    std: float
    vmin: float
    vmax: float

    @property
    def verdict(self) -> str:
        if self.n_nan or self.n_inf:
            return "FAIL"
        if not (0.5 <= self.std <= 2.0):
            return "WARN"  # rescale advised (check_latents.py:113-121)
        return "PASS"

    @property
    def advice(self) -> Optional[str]:
        if self.verdict == "WARN":
            return (
                f"latent std {self.std:.3f} outside [0.5, 2.0]; set "
                f"latent_mean={self.mean:.6f} latent_std={self.std:.6f} in "
                "the model config"
            )
        return None


def audit_latents(files: Iterable[str], max_files: int = 200) -> LatentAudit:
    from audio_calm_tpu.data.datasets import load_array

    s = sq = 0.0
    n = 0
    n_nan = n_inf = 0
    vmin, vmax = np.inf, -np.inf
    count = 0
    for path in files:
        if count >= max_files:
            break
        arr = load_array(path).astype(np.float64)
        n_nan += int(np.isnan(arr).sum())
        n_inf += int(np.isinf(arr).sum())
        finite = arr[np.isfinite(arr)]
        if finite.size:
            s += finite.sum()
            sq += (finite**2).sum()
            n += finite.size
            vmin = min(vmin, float(finite.min()))
            vmax = max(vmax, float(finite.max()))
        count += 1
    mean = s / max(n, 1)
    std = float(np.sqrt(max(sq / max(n, 1) - mean**2, 0.0)))
    return LatentAudit(count, n_nan, n_inf, float(mean), std, vmin, vmax)


def stored_vs_fresh_encode(
    stored_latent: np.ndarray, fresh_mu: np.ndarray
) -> Dict[str, object]:
    """check_pt.py's PASS/WARN/FAIL at L1 thresholds 0.1 / 0.5."""
    T = min(stored_latent.shape[0], fresh_mu.shape[0])
    l1 = float(np.mean(np.abs(stored_latent[:T] - fresh_mu[:T])))
    verdict = "PASS" if l1 < 0.1 else ("WARN" if l1 < 0.5 else "FAIL")
    return {"l1": l1, "verdict": verdict}


def predictor_error_stats(pred: np.ndarray, gt: np.ndarray) -> Dict[str, float]:
    """Relative-error mean / p50 / p90 (run_sanity_checks.py:105-183)."""
    rel = np.abs(pred - gt) / np.maximum(np.abs(gt), 1e-6)
    return {
        "mean": float(rel.mean()),
        "p50": float(np.percentile(rel, 50)),
        "p90": float(np.percentile(rel, 90)),
    }


def check_flow_learning(
    model, params, batches: List[Dict], rng: jax.Array
) -> Dict[str, object]:
    """Average eval-mode TTS flow loss over batches, with verdict."""
    from audio_calm_tpu.models.calm import QwenCALM

    losses = []
    for i, b in enumerate(batches):
        out = model.apply(
            params, b["text_ids"], b["attention_mask"], b["latents"],
            b["audio_mask"], train=False,
            rngs={"flow": jax.random.fold_in(rng, i)},
            method=QwenCALM.forward_tts,
        )
        losses.append(float(out["loss_tts"]))
    loss = float(np.mean(losses))
    return {
        "loss_tts": loss,
        "baseline": FLOW_BASELINE,
        "verdict": flow_learning_verdict(loss),
    }
