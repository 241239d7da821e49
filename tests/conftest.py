"""Test harness config.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding logic can
be exercised without TPU hardware (the TPU-native analog of a fake backend).
Must set env vars before jax initializes.
"""
import os
import sys

# Force CPU even when the session env points at a TPU platform. NOTE: the
# axon sitecustomize registers the TPU backend and programmatically sets
# jax_platforms at interpreter start, so the env var alone is NOT enough —
# jax.config.update must run before any backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# The reference implementation (for differential tests). Optional: tests that
# use it must skip gracefully when it is absent or its deps are missing.
REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_to_path():
    """Make the reference importable AND executable for differential tests.

    The reference imports MIDI libraries that are not installed here
    (miditoolkit, pretty_midi, parmap, music21).  miditoolkit and pretty_midi
    are provided as WORKING adapter modules backed by commu_tpu.midi.smf
    (whose object model mirrors miditoolkit's surface), so the reference's
    actual encode/decode/augment code paths run for real in differential
    tests.  parmap stays an inert stub (tests call augment_data_map
    directly), yacs a minimal CfgNode shim.
    """
    import types

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    if "yacs" not in sys.modules:
        yacs_mod = types.ModuleType("yacs")
        yacs_config_mod = types.ModuleType("yacs.config")

        class _CfgNode(dict):
            pass

        yacs_config_mod.CfgNode = _CfgNode
        yacs_mod.config = yacs_config_mod
        sys.modules["yacs"] = yacs_mod
        sys.modules["yacs.config"] = yacs_config_mod

    if "miditoolkit" not in sys.modules:
        from ref_midi_adapter import install_midi_adapter

        install_midi_adapter()

    if "parmap" not in sys.modules:
        stub = types.ModuleType("parmap")
        stub.__stub__ = True
        sys.modules["parmap"] = stub
