"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated here without TPU hardware (SURVEY.md §4:
the reference never tests multi-GPU without a cluster; we can).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any ambient TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A plugin may have imported jax before this conftest ran, in which case the
# env vars above were captured too late — set the config values directly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")


# --- fast tier (pytest -m fast): a <10-min subset for inner-loop runs ----
# Whole modules that measure under ~1 min each on the 1-core host, plus
# the named cheap tests of test_packing (its trajectory tests dominate the
# module's ~8 min). The FULL suite remains the round gate.
_FAST_MODULES = {
    "test_config", "test_mas_alignment", "test_native", "test_mel",
    "test_data_pipeline", "test_convert_store", "test_quant",
    "test_ode_solvers", "test_observability", "test_edge_cases",
}
_FAST_TESTS = {
    "test_pack_asr_window_layout_invariants",
    "test_pack_rejects_too_small_rows",
    "test_forward_asr_packed_matches_solo",
    "test_pack_tts_window_layout_invariants",
    "test_pack_tts_rejects_too_small_rows",
    "test_forward_tts_packed_matches_solo",
    "test_packed_iterator_coverage_and_task",
    "test_packed_tts_iterator_coverage_buckets",
    "test_estimate_packed_steps_per_epoch_tracks_iterator",
    "test_pack_config_falls_back_multihost",
    "test_tts_pack_config_falls_back_multihost",
    "test_multihost_packed_matches_single",
    "test_multihost_packed_corrupt_slot_stubs_owner_locally",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        name = item.name.split("[", 1)[0]
        if mod in _FAST_MODULES or name in _FAST_TESTS:
            item.add_marker(_pytest.mark.fast)
