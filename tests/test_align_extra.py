"""Alternate aligners vs compiled reference oracles."""
import subprocess

import numpy as np
import pytest

from meshclust_tpu.ops.align_extra import NeedlemanWunsch, affine_id, lcs_len

AFFINE_MAIN = r"""
#include <cstdio>
#include <string>
#include "AffineId.h"
using namespace utility;
int main() {
    int la, lb;
    while (scanf("%d %d", &la, &lb) == 2) {
        std::string a(la, 0), b(lb, 0);
        for (int i = 0; i < la; i++) { int x; scanf("%d", &x); a[i] = (char)x; }
        for (int i = 0; i < lb; i++) { int x; scanf("%d", &x); b[i] = (char)x; }
        AffineId aid(a.c_str(), 0, la - 1, b.c_str(), 0, lb - 1);
        printf("%.17g\n", aid.getAlign());
    }
    return 0;
}
"""


@pytest.fixture(scope="module")
def affine_bin(tmp_path_factory):
    d = tmp_path_factory.mktemp("affine")
    (d / "main.cpp").write_text(AFFINE_MAIN)
    exe = d / "aff"
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++11", "-I", "/root/reference/src/utility",
             str(d / "main.cpp"),
             "/root/reference/src/utility/AffineId.cpp", "-o", str(exe)],
            check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        pytest.skip("reference sources unavailable")
    return exe


def test_affine_id_matches_reference(rng, affine_bin):
    pairs = [(rng.integers(0, 4, size=int(rng.integers(4, 60))).astype(np.uint8),
              rng.integers(0, 4, size=int(rng.integers(4, 60))).astype(np.uint8))
             for _ in range(20)]
    lines = []
    for a, b in pairs:
        lines.append(f"{len(a)} {len(b)}")
        lines.append(" ".join(map(str, (a + 1).tolist())))  # avoid NUL bytes
        lines.append(" ".join(map(str, (b + 1).tolist())))
    out = subprocess.run([str(affine_bin)], input="\n".join(lines),
                         capture_output=True, text=True, check=True)
    golden = [float(x) for x in out.stdout.split()]
    for (a, b), g in zip(pairs, golden):
        assert affine_id(a + 1, b + 1) == pytest.approx(g, rel=1e-12)


def test_nw_identity_reasonable(rng):
    s = "".join(rng.choice(list("ACGT"), size=60))
    nw = NeedlemanWunsch(s, s, 2, -3, -5, -2)
    a1, a2 = nw.align()
    assert a1 == a2 == s
    assert nw.identity((a1, a2)) == 1.0

    t = list(s)
    t[10] = "A" if t[10] != "A" else "C"
    nw2 = NeedlemanWunsch(s, "".join(t), 2, -3, -5, -2)
    al = nw2.align()
    assert 0.9 < nw2.identity(al) < 1.0


def test_lcs():
    a = np.frombuffer(b"ACGTACGT", dtype=np.uint8)
    b = np.frombuffer(b"AGGTCGT", dtype=np.uint8)
    assert lcs_len(a, a) == 8
    assert lcs_len(a, b) == 6
    assert lcs_len(a, np.frombuffer(b"TTTT", dtype=np.uint8)) == 2
