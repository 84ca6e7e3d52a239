"""Red repeat detector: planted-repeat recovery + golden vs reference Red."""
import os
import subprocess

import numpy as np
import pytest

from meshclust_tpu.red.runner import RedConfig, run_red
from tests.conftest import random_dna


def _genome_with_repeats(rng, n_bg=60000, motif_len=600, n_copies=40):
    """Background + a repeated motif planted at known positions."""
    motif = random_dna(rng, motif_len)
    parts = []
    truth = []
    pos = 0
    gap = n_bg // (n_copies + 1)
    for i in range(n_copies):
        bg = random_dna(rng, gap)
        parts.append(bg)
        pos += len(bg)
        truth.append((pos, pos + motif_len - 1))
        parts.append(motif)
        pos += motif_len
    parts.append(random_dna(rng, gap))
    return "".join(parts), truth


@pytest.fixture(scope="module")
def genome_dir(tmp_path_factory):
    rng = np.random.default_rng(5)
    d = tmp_path_factory.mktemp("genome")
    seq, truth = _genome_with_repeats(rng)
    with open(d / "chr1.fa", "w") as f:
        f.write(">chr1\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i: i + 70] + "\n")
    return str(d), truth, len(seq)


@pytest.mark.slow
def test_red_finds_planted_repeats(genome_dir, tmp_path):
    gdir, truth, glen = genome_dir
    out = run_red(RedConfig(gnm=gdir, rpt=str(tmp_path / "rpt"),
                            msk=str(tmp_path / "msk"), k=12))
    header, regions = out["results"][0]
    mask = np.zeros(glen, bool)
    for s, e in regions:
        mask[s: e + 1] = True
    tmask = np.zeros(glen, bool)
    for s, e in truth:
        tmask[s: e + 1] = True
    tp = (mask & tmask).sum()
    recall = tp / tmask.sum()
    precision = tp / max(1, mask.sum())
    print(f"red recall={recall:.3f} precision={precision:.3f} "
          f"regions={len(regions)}")
    assert recall > 0.7
    assert precision > 0.5
    # outputs exist
    assert os.path.exists(tmp_path / "rpt" / "chr1.rpt")
    assert os.path.exists(tmp_path / "msk" / "chr1.msk")
    # masked file has lowercase repeats
    msk = open(tmp_path / "msk" / "chr1.msk").read()
    assert any(c.islower() for c in msk)


@pytest.mark.slow
def test_red_vs_reference_binary(genome_dir, tmp_path):
    gdir, truth, glen = genome_dir
    ref_bin = "/tmp/meshclust_ref_build/bin/Red"
    if not os.path.exists(ref_bin):
        try:
            from tests.golden.harness import reference_binary
            reference_binary()
        except Exception as e:
            pytest.skip(f"reference Red unavailable: {e}")
    if not os.path.exists(ref_bin):
        pytest.skip("reference Red binary not built")
    ref_rpt = tmp_path / "ref_rpt"
    ref_rpt.mkdir()
    subprocess.run([ref_bin, "-gnm", gdir, "-rpt", str(ref_rpt),
                    "-len", "12"], check=True, capture_output=True,
                   timeout=600)
    out = run_red(RedConfig(gnm=gdir, k=12))
    ours = np.zeros(glen, bool)
    for _, regions in out["results"]:
        for s, e in regions:
            ours[s: e + 1] = True
    ref = np.zeros(glen, bool)
    for line in open(ref_rpt / "chr1.rpt"):
        line = line.strip()
        if not line:
            continue
        span = line.split(":")[-1]
        s, e = span.split("-")
        ref[int(s): int(e)] = True
    inter = (ours & ref).sum()
    union = (ours | ref).sum()
    jacc = inter / max(1, union)
    print(f"red vs reference jaccard={jacc:.3f} "
          f"(ours={ours.sum()}, ref={ref.sum()})")
    assert jacc > 0.7


@pytest.fixture(scope="module")
def genome_dir_10m(tmp_path_factory):
    """~10 Mbp genome with repeat families and N runs (round-4 verdict #5:
    genome-scale Red coverage, not just the 60 kb toy)."""
    rng = np.random.default_rng(11)
    from tests.conftest import random_dna
    d = tmp_path_factory.mktemp("genome10m")
    parts = []
    motifs = [random_dna(rng, 800) for _ in range(5)]
    total = 0
    while total < 10_000_000:
        bg = random_dna(rng, int(rng.integers(3000, 12000)))
        parts.append(bg)
        total += len(bg)
        if rng.random() < 0.08:
            nrun = "N" * int(rng.integers(30, 200))
            parts.append(nrun)
            total += len(nrun)
        m = motifs[int(rng.integers(5))]
        parts.append(m)
        total += len(m)
    seq = "".join(parts)
    with open(d / "chr1.fa", "w") as f:
        f.write(">chr1\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i: i + 70] + "\n")
    return str(d), len(seq)


@pytest.mark.slow
def test_red_10mbp_vs_reference_binary(genome_dir_10m, tmp_path):
    """Genome-scale golden: same regions as the compiled reference Red on a
    10 Mbp genome (jaccard), and wall clock within ~3x of the binary on
    this host (the bench target is ~2x; the test bound leaves CI slack)."""
    import time
    gdir, glen = genome_dir_10m
    ref_bin = "/tmp/meshclust_ref_build/bin/Red"
    if not os.path.exists(ref_bin):
        try:
            from tests.golden.harness import reference_binary
            reference_binary()
        except Exception as e:
            pytest.skip(f"reference Red unavailable: {e}")
    if not os.path.exists(ref_bin):
        pytest.skip("reference Red binary not built")
    ref_rpt = tmp_path / "ref_rpt"
    ref_rpt.mkdir()
    t0 = time.time()
    subprocess.run([ref_bin, "-gnm", gdir, "-rpt", str(ref_rpt)],
                   check=True, capture_output=True, timeout=600)
    ref_s = time.time() - t0
    t0 = time.time()
    out = run_red(RedConfig(gnm=gdir))
    ours_s = time.time() - t0
    ours = np.zeros(glen, bool)
    for _, regions in out["results"]:
        for s, e in regions:
            ours[s: e + 1] = True
    ref = np.zeros(glen, bool)
    for line in open(ref_rpt / "chr1.rpt"):
        line = line.strip()
        if not line:
            continue
        span = line.split(":")[-1]
        s, e = span.split("-")
        ref[int(s): int(e)] = True
    jacc = (ours & ref).sum() / max(1, (ours | ref).sum())
    print(f"10Mbp red jaccard={jacc:.3f} ours={ours_s:.1f}s ref={ref_s:.1f}s")
    assert jacc > 0.7
    assert ours_s < 3.0 * ref_s + 10.0
