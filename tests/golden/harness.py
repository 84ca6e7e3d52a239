"""Golden parity harness: build + run the reference meshclust binary.

The reference tree is copied from the read-only mount to a scratch dir and
built there (one missing <limits> include is patched for modern GCC — a
build fix for the oracle binary, not part of our engine).
"""
from __future__ import annotations

import os
import shutil
import subprocess

REF_SRC = "/root/reference"
BUILD_DIR = "/tmp/meshclust_ref_build"
BIN = os.path.join(BUILD_DIR, "src/cluster/meshclust")


def reference_binary() -> str:
    """Return path to the reference meshclust, building it if needed."""
    if os.path.exists(BIN):
        return BIN
    if not os.path.isdir(REF_SRC):
        raise FileNotFoundError(REF_SRC)
    if os.path.isdir(BUILD_DIR):
        shutil.rmtree(BUILD_DIR)
    shutil.copytree(REF_SRC, BUILD_DIR)
    bvec = os.path.join(BUILD_DIR, "src/cluster/src/bvec.cpp")
    with open(bvec) as f:
        src = f.read()
    if "#include <limits>" not in src:
        src = src.replace('#include "bvec.h"',
                          '#include "bvec.h"\n#include <limits>', 1)
        with open(bvec, "w") as f:
            f.write(src)
    subprocess.run(["make"], cwd=BUILD_DIR, check=True,
                   capture_output=True)
    return BIN


def run_reference(fasta: str, out: str, similarity: float = 0.90,
                  kmer=None, iterations=None, delta=None, sample=None,
                  pivot=None, align=False, threads=None,
                  timeout: int = 1200) -> None:
    cmd = [reference_binary(), fasta, "--id", str(similarity),
           "--output", out]
    if kmer is not None:
        cmd += ["--kmer", str(kmer)]
    if iterations is not None:
        cmd += ["--iterations", str(iterations)]
    if delta is not None:
        cmd += ["--delta", str(delta)]
    if sample is not None:
        cmd += ["--sample", str(sample)]
    if pivot is not None:
        cmd += ["--pivot", str(pivot)]
    if align:
        cmd += ["--align"]
    if threads is not None:
        cmd += ["--threads", str(threads)]
    subprocess.run(cmd, check=True, capture_output=True, timeout=timeout)
