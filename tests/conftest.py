"""Test configuration.

Tests run on CPU with 8 virtual devices so mesh/sharding logic is exercised
without TPU hardware (the driver separately dry-runs the multi-chip path).
Must be set before jax is imported anywhere.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon TPU plugin ignores JAX_PLATFORMS; the config route does win
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def _load_reference_gguf_py():
    """Import the reference's gguf-py as an *oracle* for differential tests.

    Bypasses gguf/__init__ (it imports sentencepiece, not in this image).
    Returns None when the reference checkout is unavailable.
    """
    import types

    path = "/root/reference/gguf-py"
    if not os.path.isdir(os.path.join(path, "gguf")):
        return None
    if "gguf" not in sys.modules or not hasattr(sys.modules["gguf"], "__path__"):
        import importlib.machinery

        pkg = types.ModuleType("gguf")
        pkg.__path__ = [os.path.join(path, "gguf")]
        # a real ModuleSpec so later importlib.util.find_spec("gguf") calls
        # (e.g. transformers integration probing) don't raise
        pkg.__spec__ = importlib.machinery.ModuleSpec(
            "gguf", None, is_package=True)
        pkg.__spec__.submodule_search_locations = pkg.__path__
        sys.modules["gguf"] = pkg
    sys.path.insert(0, path)
    try:
        import gguf.quants  # noqa: F401
        import gguf.constants  # noqa: F401

        return sys.modules["gguf"]
    except Exception:
        return None


@pytest.fixture(scope="session")
def reference_gguf_py():
    mod = _load_reference_gguf_py()
    if mod is None:
        pytest.skip("reference gguf-py oracle not available")
    return mod
