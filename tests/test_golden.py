"""CLSTR parity vs the reference binary on synthetic sets (SURVEY §4:
membership equality up to tie-breaking; we assert partition agreement)."""
import shutil
import subprocess

import numpy as np
import pytest

from meshclust_tpu.config import ClusterConfig
from meshclust_tpu.core.runner import run
from meshclust_tpu.io.clstr import (nmi, one_to_one_recovery, parse_clstr,
                                    partition_labels)
from tests.conftest import mutate, random_dna
from tests.golden.harness import run_reference


def _synthetic(rng, n_species, per, length, rate):
    records = []
    for s in range(n_species):
        base = random_dna(rng, length + int(rng.integers(-25, 25)))
        for c in range(per):
            records.append((f"sp{s}_c{c}",
                            base if c == 0 else mutate(rng, base, rate)))
    order = rng.permutation(len(records))
    return [records[i] for i in order]


@pytest.fixture(scope="module")
def have_ref():
    try:
        from tests.golden.harness import reference_binary
        reference_binary()
    except Exception as e:  # toolchain/reference unavailable
        pytest.skip(f"reference binary unavailable: {e}")


@pytest.mark.slow
def test_partition_parity_id090(rng, make_fasta, tmp_path, have_ref):
    records = _synthetic(rng, n_species=10, per=12, length=500, rate=0.03)
    path = make_fasta(records, "golden.fasta")
    ref_out = str(tmp_path / "ref.clstr")
    our_out = str(tmp_path / "ours.clstr")
    run_reference(path, ref_out, similarity=0.90, iterations=5, threads=4)
    run(ClusterConfig(files=[path], similarity=0.90, output=our_out,
                      iterations=5, use_pallas=False))
    ref_labels = partition_labels(parse_clstr(ref_out))
    our_labels = partition_labels(parse_clstr(our_out))
    assert set(ref_labels) == set(our_labels)
    score = nmi(our_labels, ref_labels)
    print(f"NMI vs reference: {score:.4f}")
    assert score > 0.95


@pytest.mark.slow
def test_partition_parity_id083(rng, make_fasta, tmp_path, have_ref):
    records = _synthetic(rng, n_species=8, per=10, length=400, rate=0.08)
    path = make_fasta(records, "golden83.fasta")
    ref_out = str(tmp_path / "ref.clstr")
    our_out = str(tmp_path / "ours.clstr")
    run_reference(path, ref_out, similarity=0.83, iterations=5, threads=4)
    run(ClusterConfig(files=[path], similarity=0.83, output=our_out,
                      iterations=5, use_pallas=False))
    ref_labels = partition_labels(parse_clstr(ref_out))
    our_labels = partition_labels(parse_clstr(our_out))
    score = nmi(our_labels, ref_labels)
    print(f"NMI vs reference: {score:.4f}")
    assert score > 0.90
