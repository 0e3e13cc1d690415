"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding paths are
validated on fake CPU devices per SURVEY.md §4 ("TPU-build test plan").
Must run before any jax import.
"""

import os
import pathlib

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

# the axon TPU plugin's sitecustomize registers itself before conftest
# runs and pins jax_platforms; override back to CPU explicitly
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
DATA_DIR = REPO_ROOT / "data"
PROFILE_DIR = DATA_DIR / "profile_HMMs"
FASTA_DIR = DATA_DIR / "FASTA_files"


@pytest.fixture(scope="session")
def profile_dir() -> pathlib.Path:
    return PROFILE_DIR


@pytest.fixture(scope="session")
def fasta_dir() -> pathlib.Path:
    return FASTA_DIR


@pytest.fixture(scope="session")
def all_profile_paths() -> list[pathlib.Path]:
    return sorted(PROFILE_DIR.glob("*.hmm"), key=lambda p: int(p.stem))


def consensus_tokens(hmm, repeats: int = 1, spacer: int = 0, seed: int = 0):
    """Token sequence matching the profile's consensus (argmax match
    emission per node) — a guaranteed strong hit; ``repeats`` > 1 with a
    random spacer builds multi-domain test sequences."""
    import numpy as np

    core = np.argmax(hmm.match_emissions[1:], axis=1).astype(np.int32)
    rng = np.random.default_rng(seed)
    parts = []
    for r in range(repeats):
        if r:
            parts.append(rng.integers(0, 20, size=spacer, dtype=np.int32))
        parts.append(core)
    return np.concatenate(parts) if parts else core
