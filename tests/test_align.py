"""Wavefront aligner vs the scalar GlobAlignE oracle (and the C++ original)."""
import subprocess

import numpy as np
import pytest

from meshclust_tpu.ops import align as A
from tests import ref_impl


def _codes(rng, n, n_prob=0.0):
    c = rng.integers(0, 4, size=n).astype(np.uint8)
    if n_prob:
        mask = rng.random(n) < n_prob
        c[mask] = 78
    return c


def test_identical_sequences(rng):
    s = _codes(rng, 50)
    score, alen, match, ident = (np.asarray(x) for x in _run([(s, s)]))
    assert ident[0] == 1.0
    assert alen[0] == 50
    assert score[0] == 50


def _run(pairs):
    import jax.numpy as jnp
    P = len(pairs)
    ba = max(len(a) for a, _ in pairs)
    bb = max(len(b) for _, b in pairs)
    s1 = np.zeros((P, ba), np.uint8)
    s2 = np.zeros((P, bb), np.uint8)
    l1 = np.zeros(P, np.int32)
    l2 = np.zeros(P, np.int32)
    for i, (a, b) in enumerate(pairs):
        s1[i, : len(a)] = a
        s2[i, : len(b)] = b
        l1[i], l2[i] = len(a), len(b)
    score, alen, match, _ = A.batch_align(
        jnp.asarray(s1), jnp.asarray(s2), jnp.asarray(l1),
        jnp.asarray(l2), R=ba + 1, D=ba + bb + 1)
    ident = (np.asarray(match, np.float64)
             / np.maximum(np.asarray(alen, np.float64), 1.0))
    return score, alen, match, ident


@pytest.mark.parametrize("trial", range(4))
def test_random_pairs_match_oracle(rng, trial):
    pairs = []
    for _ in range(12):
        la = int(rng.integers(5, 90))
        lb = int(rng.integers(5, 90))
        pairs.append((_codes(rng, la, 0.05), _codes(rng, lb, 0.05)))
    score, alen, match, ident = (np.asarray(x) for x in _run(pairs))
    for i, (a, b) in enumerate(pairs):
        es, el, em, ei = ref_impl.glob_align(a, b)
        assert score[i] == es, f"pair {i} score"
        assert alen[i] == el, f"pair {i} length"
        assert match[i] == em, f"pair {i} matches"
        assert ident[i] == pytest.approx(ei, rel=1e-12)


def test_similar_pairs_high_identity(rng):
    base = _codes(rng, 200)
    mut = base.copy()
    idx = rng.choice(200, size=10, replace=False)
    mut[idx] = (mut[idx] + 1) % 4
    _, _, _, ident = _run([(base, mut)])
    assert 0.90 <= float(np.asarray(ident)[0]) <= 0.96


def test_batch_helper(rng):
    pairs = [(_codes(rng, int(rng.integers(10, 120))),
              _codes(rng, int(rng.integers(10, 120)))) for _ in range(9)]
    ids = A.align_identity_batch(pairs)
    for i, (a, b) in enumerate(pairs):
        _, _, _, ei = ref_impl.glob_align(a, b)
        assert ids[i] == pytest.approx(ei, rel=1e-12)


CPP_MAIN = r"""
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include "GlobAlignE.h"
using namespace utility;
int main() {
    // read pairs from stdin: len1 len2 then bytes as ints
    int la, lb;
    while (scanf("%d %d", &la, &lb) == 2) {
        std::string a(la, 0), b(lb, 0);
        for (int i = 0; i < la; i++) { int x; scanf("%d", &x); a[i] = (char)x; }
        for (int i = 0; i < lb; i++) { int x; scanf("%d", &x); b[i] = (char)x; }
        GlobAlignE g(a.c_str(), 0, la - 1, b.c_str(), 0, lb - 1, 1, -1, 2, 1);
        printf("%d %d %.17g\n", g.getScore(), g.getLength(), g.getIdentity());
    }
    return 0;
}
"""


@pytest.fixture(scope="module")
def ref_align_bin(tmp_path_factory):
    """Build the reference GlobAlignE as an oracle binary (sources read from
    the read-only reference mount; nothing is copied into the repo)."""
    d = tmp_path_factory.mktemp("refalign")
    (d / "main.cpp").write_text(CPP_MAIN)
    exe = d / "refalign"
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++11",
             "-I", "/root/reference/src/utility",
             str(d / "main.cpp"),
             "/root/reference/src/utility/GlobAlignE.cpp",
             "-o", str(exe)],
            check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        pytest.skip("reference sources/toolchain unavailable")
    return exe


def test_against_reference_binary(rng, ref_align_bin):
    pairs = []
    for _ in range(25):
        la = int(rng.integers(3, 150))
        lb = int(rng.integers(3, 150))
        pairs.append((_codes(rng, la, 0.04), _codes(rng, lb, 0.04)))
    lines = []
    for a, b in pairs:
        lines.append(f"{len(a)} {len(b)}")
        lines.append(" ".join(map(str, a.tolist())))
        lines.append(" ".join(map(str, b.tolist())))
    out = subprocess.run([str(ref_align_bin)], input="\n".join(lines),
                         capture_output=True, text=True, check=True)
    golden = [ln.split() for ln in out.stdout.strip().splitlines()]
    score, alen, match, ident = (np.asarray(x) for x in _run(pairs))
    for i, (gs, gl, gi) in enumerate(golden):
        assert score[i] == int(gs)
        assert alen[i] == int(gl)
        assert ident[i] == pytest.approx(float(gi), rel=1e-12)
