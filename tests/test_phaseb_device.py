"""Fused device Phase B (all update+merge iterations in one jitted call)
vs the per-iteration host-orchestrated path: partitions and representatives
must agree (ClusterFactory.cpp:738-753 semantics)."""
import numpy as np
import pytest

from meshclust_tpu.config import ClusterConfig
from meshclust_tpu.core.runner import run
from meshclust_tpu.io.clstr import parse_clstr, partition_labels
from tests.conftest import mutate, random_dna


def _synthetic(rng, n_species=8, per=10, length=400, rate=0.04):
    records = []
    for s in range(n_species):
        base = random_dna(rng, length + int(rng.integers(-25, 25)))
        for c in range(per):
            seq = base if c == 0 else mutate(rng, base, rate)
            records.append((f"sp{s}_c{c}", seq))
    order = rng.permutation(len(records))
    return [records[i] for i in order]


@pytest.mark.slow
def test_fused_phaseb_matches_periter(rng, make_fasta, tmp_path,
                                      monkeypatch):
    records = _synthetic(rng)
    path = make_fasta(records, "pb.fasta")
    out_f = str(tmp_path / "fused.clstr")
    out_p = str(tmp_path / "periter.clstr")

    monkeypatch.setenv("MESHCLUST_FUSED_PHASEB", "1")
    run(ClusterConfig(files=[path], similarity=0.90, output=out_f,
                      iterations=6, use_pallas=False))
    monkeypatch.setenv("MESHCLUST_FUSED_PHASEB", "0")
    run(ClusterConfig(files=[path], similarity=0.90, output=out_p,
                      iterations=6, use_pallas=False))

    lf = partition_labels(parse_clstr(out_f))
    lp = partition_labels(parse_clstr(out_p))
    assert set(lf) == set(lp)
    # same partition (cluster ids may be permuted)
    from meshclust_tpu.io.clstr import nmi
    assert nmi(lf, lp) == pytest.approx(1.0)

    # representatives agree cluster-for-cluster
    def reps(path):
        out = set()
        for cl in parse_clstr(path):
            out.update(h for h, is_rep in cl if is_rep)
        return out

    assert reps(out_f) == reps(out_p)
