"""Test environment: force CPU with 8 virtual devices BEFORE jax import.

Mirrors the survey's test strategy (SURVEY §4): multi-chip sharding is
validated on a virtual CPU mesh; numeric kernels are checked against scalar
numpy oracles in tests/ref_impl.py.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
_TPU_TIER = os.environ.get("MESHCLUST_TEST_TPU") == "1"
if not _TPU_TIER:
    os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS=cpu; the config knob works.
# MESHCLUST_TEST_TPU=1 keeps the real backend so the `-m tpu` tier exercises
# actual Mosaic compilation (the round-1 failure mode: every Pallas test ran
# interpret-mode on CPU, so an uncompilable kernel shipped). The tier also
# keeps x64 OFF — production never enables it, and the int32/f32 kernels are
# what we want compiled exactly as the CLI compiles them.
if not _TPU_TIER:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def random_dna(rng, n, alphabet="ACGT"):
    return "".join(rng.choice(list(alphabet), size=n))


def mutate(rng, seq, rate):
    """Point-mutate a DNA string at the given rate (for synthetic clusters)."""
    bases = "ACGT"
    out = []
    for ch in seq:
        r = rng.random()
        if r < rate * 0.8:      # substitution
            out.append(bases[int(rng.integers(4))])
        elif r < rate * 0.9:    # deletion
            continue
        elif r < rate:          # insertion
            out.append(ch)
            out.append(bases[int(rng.integers(4))])
        else:
            out.append(ch)
    return "".join(out)


@pytest.fixture
def make_fasta(tmp_path):
    def _make(records, name="test.fasta"):
        p = tmp_path / name
        with open(p, "w") as f:
            for header, seq in records:
                f.write(f">{header}\n")
                for i in range(0, len(seq), 70):
                    f.write(seq[i:i + 70] + "\n")
        return str(p)

    return _make
