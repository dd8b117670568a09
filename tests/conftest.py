"""Test configuration: force an 8-device virtual CPU mesh.

This is the TPU project's answer to "test multi-chip without a pod": all
tests run on CPU with XLA's forced host device count, so sharding tests
exercise real collectives (see SURVEY.md §4 test-strategy notes).
"""

import os

# Force local CPU: the ambient environment pins JAX_PLATFORMS to the
# remote TPU tunnel, which must never serve unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize hard-registers the remote-TPU backend and
# overrides JAX_PLATFORMS; the jax.config knob still wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# XLA:CPU dots default to low-precision accumulation; tests compare against
# float32 oracles, so force full precision (TPU runs set per-op precision).
jax.config.update("jax_default_matmul_precision", "highest")


# ---------------------------------------------------------------------------
# Smoke-tier budget (pytest.ini): the gate must stay fast enough to be
# run before every commit on this 1-core host.  The tests below are
# kernel/backend parity checks whose coverage overlaps a cheaper smoke
# test (same oracle at smaller shapes, or the same code path through a
# different backend); they run in the full (nightly) suite only.
_BUDGET_SLOW = {
    "test_pallas_hashgrid.py::test_mix_gradients_match_xla",
    "test_pallas_hashgrid.py::test_gradients_with_ste_binarize",
    "test_pallas_hashgrid.py::test_mix_forward_binarized_matches_xla",
    "test_hash_dispatch.py::test_lanegather_backend_matches_xla",
    "test_batched.py::test_pallas_batched_matches_jnp",
    "test_overflow.py::test_no_reaction_without_overflow",
    "test_matmul_dtype.py::test_bf16x2_gradients_close",
    "test_lpips.py::test_evaluate_video_reports_lpips",
    "test_decode_fidelity.py::test_decoded_attributes_match_ste_quantization",
    "test_decode_fidelity.py::"
    "test_decoded_render_matches_ste_render_of_quantized_state",
    "test_estimate.py::test_estimate_real_bits_consistency_tight",
    "test_detctx.py::test_matches_device_context",
    "test_pallas_stream.py::test_per_view_m2d_gradients_match_mirror",
    "test_pallas_stream.py::test_stream_with_copy_budget_matches_mirror",
}


def pytest_collection_modifyitems(items):
    import pytest as _pytest

    for item in items:
        base = item.nodeid.split("/")[-1].split("[")[0]
        if base in _BUDGET_SLOW:
            item.add_marker(_pytest.mark.slow)
