"""Test harness: force an 8-device virtual CPU mesh.

This is the JAX-idiomatic multi-chip-without-a-cluster mechanism: tests
exercise real pjit/NamedSharding code paths with XLA collectives on 8
virtual CPU devices. The container's sitecustomize force-registers the
axon TPU backend in every process, so `jax.config.update` (which beats the
JAX_PLATFORMS env var) is required, and XLA_FLAGS must be set before the
CPU backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Tests compare against float64-ish numpy/torch oracles; keep MXU-emulation
# out of the picture on CPU.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture(autouse=True)
def _no_hostguard_override(monkeypatch, tmp_path):
    """Tests must not see an operator's live RSS-budget override file
    (utils/hostguard.BUDGET_OVERRIDE_FILE, e.g. left by a canonical run
    on this machine) — budget assertions would silently invert."""
    from asvd4llm_tpu.utils import hostguard
    monkeypatch.setattr(hostguard, "BUDGET_OVERRIDE_FILE",
                        str(tmp_path / "no-override"))
