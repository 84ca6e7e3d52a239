"""Bit-exactness of the glibc rand / libstdc++ random_shuffle emulation.

Compiles tiny C/C++ golden generators with the system toolchain (glibc /
libstdc++ — the same pair the reference binary uses) and compares.
"""
import subprocess
import sys

import pytest

from meshclust_tpu.core.rng import GlibcRand, random_shuffle

C_SRC = r"""
#include <stdio.h>
#include <stdlib.h>
int main(int argc, char**argv) {
    srand(atoi(argv[1]));
    for (int i = 0; i < 200; i++) printf("%d\n", rand());
    return 0;
}
"""

CPP_SRC = r"""
#include <cstdio>
#include <cstdlib>
#include <algorithm>
#include <vector>
struct rng {
    rng() { srand(0); }
    int operator()(int n) const { return rand() % n; }
};
int main(int argc, char** argv) {
    int n = atoi(argv[1]);
    std::vector<int> v;
    for (int i = 0; i < n; i++) v.push_back(i);
    rng gen;
    std::random_shuffle(v.begin(), v.end(), gen);
    for (int x : v) printf("%d\n", x);
    return 0;
}
"""


def _build(tmp_path, name, src, cxx=False):
    srcfile = tmp_path / (name + (".cpp" if cxx else ".c"))
    srcfile.write_text(src)
    exe = tmp_path / name
    cmd = ["g++" if cxx else "gcc", str(srcfile), "-o", str(exe)]
    if cxx:
        cmd.insert(1, "-std=c++11")
    subprocess.run(cmd, check=True, capture_output=True)
    return exe


@pytest.mark.parametrize("seed", [0, 1, 10, 12345])
def test_glibc_rand_matches_system(tmp_path, seed):
    exe = _build(tmp_path, "goldrand", C_SRC)
    out = subprocess.run([str(exe), str(seed)], capture_output=True, check=True)
    golden = [int(x) for x in out.stdout.split()]
    g = GlibcRand(seed)
    ours = [g.rand() for _ in range(200)]
    assert ours == golden


@pytest.mark.parametrize("n", [1, 2, 7, 100, 1000])
def test_random_shuffle_matches_libstdcxx(tmp_path, n):
    exe = _build(tmp_path, "goldshuf", CPP_SRC, cxx=True)
    out = subprocess.run([str(exe), str(n)], capture_output=True, check=True)
    golden = [int(x) for x in out.stdout.split()]
    ours = random_shuffle(list(range(n)), seed=0)
    assert ours == golden
