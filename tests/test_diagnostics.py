import numpy as np

from audio_calm_tpu.diagnostics.sanity import (
    FLOW_BASELINE,
    audit_latents,
    flow_learning_verdict,
    predictor_error_stats,
    stored_vs_fresh_encode,
)


def test_flow_verdicts():
    assert flow_learning_verdict(0.5) == "PASS"
    assert flow_learning_verdict(1.7) == "WARN"
    assert flow_learning_verdict(2.1) == "FAIL"
    assert FLOW_BASELINE == 2.0


def test_latent_audit(tmp_path):
    for i in range(3):
        np.savez(tmp_path / f"a{i}.npz",
                 latent=np.random.default_rng(i).standard_normal((20, 16))
                 .astype(np.float32))
    files = sorted(str(p) for p in tmp_path.glob("*.npz"))
    audit = audit_latents(files)
    assert audit.verdict == "PASS"
    assert audit.n_nan == 0 and 0.8 < audit.std < 1.2

    # out-of-band std -> WARN with advice
    np.savez(tmp_path / "big.npz",
             latent=(10 * np.random.default_rng(9).standard_normal((20, 16)))
             .astype(np.float32))
    audit2 = audit_latents(sorted(str(p) for p in tmp_path.glob("*.npz")))
    assert audit2.verdict == "WARN" and audit2.advice

    # NaN -> FAIL
    bad = np.full((4, 16), np.nan, np.float32)
    np.savez(tmp_path / "nan.npz", latent=bad)
    audit3 = audit_latents(sorted(str(p) for p in tmp_path.glob("*.npz")))
    assert audit3.verdict == "FAIL"


def test_stored_vs_fresh():
    a = np.zeros((10, 4), np.float32)
    assert stored_vs_fresh_encode(a, a)["verdict"] == "PASS"
    assert stored_vs_fresh_encode(a, a + 0.3)["verdict"] == "WARN"
    assert stored_vs_fresh_encode(a, a + 2.0)["verdict"] == "FAIL"


def test_predictor_error_stats():
    gt = np.array([100.0, 200.0])
    pred = np.array([110.0, 180.0])
    s = predictor_error_stats(pred, gt)
    assert abs(s["mean"] - 0.1) < 1e-6


def test_profiler_trace_and_flops(tmp_path):
    import jax
    import jax.numpy as jnp

    from audio_calm_tpu.utils.profiling import StepTimer, flops_estimate, trace

    def f(x):
        return (x @ x).sum()

    x = jnp.ones((64, 64))
    cost = flops_estimate(f, x)
    assert cost["flops"] > 2 * 64**3 * 0.5  # ~2*n^3 matmul flops

    with trace(str(tmp_path / "tb")):
        jax.block_until_ready(f(x))
    import os

    dumped = [
        os.path.join(dp, fn)
        for dp, _, fs in os.walk(tmp_path / "tb")
        for fn in fs
    ]
    assert dumped, "profiler trace produced no files"

    t = StepTimer(warmup=1)
    for _ in range(3):
        t.tick(f(x))
    assert t.steps_per_sec > 0
