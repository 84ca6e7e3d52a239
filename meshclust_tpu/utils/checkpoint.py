"""Checkpoint/resume for trained classifiers and Phase-A centers (SURVEY §5.4).

The reference has no checkpointing — a crashed 9-hour 1M-read run restarts
from zero (its only durable artifact is the final .clstr,
ClusterFactory.cpp:495-520).  Here the two expensive milestones are durable:

  * the trained classifier (TrainedModel: feature normalization bounds +
    GLM weights, the product of Trainer::train's alignment labeling — by far
    the slowest phase on large inputs), and
  * the Phase-A center accumulation (list of (center, members) over point
    indices, valid for the same input set + seed).

Format: one JSON file (tiny — a few KB), no pickle, so checkpoints are
portable and human-inspectable.  A fingerprint of (input sizes, k, cutoff,
seed) guards against resuming against different data.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

_VERSION = 1


def _fingerprint(ps, k: int, cutoff: float, seed: int) -> dict:
    return {
        "n": int(ps.n),
        "k": int(k),
        "cutoff": float(cutoff),
        "seed": int(seed),
        "len_sum": int(np.asarray(ps.lengths, np.int64).sum()),
        "len_first": int(ps.lengths[0]) if ps.n else 0,
        "len_last": int(ps.lengths[-1]) if ps.n else 0,
    }


def save_model(path: str, model, ps, seed: int) -> None:
    """Serialize a TrainedModel (classifier params) to JSON."""
    p = model.params
    blob = {
        "version": _VERSION,
        "kind": "model",
        "fingerprint": _fingerprint(ps, model.k, model.cutoff, seed),
        "k": int(model.k),
        "cutoff": float(model.cutoff),
        "singles": [int(s) for s in p.singles],
        "mins": np.asarray(p.mins, np.float64).tolist(),
        "maxs": np.asarray(p.maxs, np.float64).tolist(),
        "is_sim": np.asarray(p.is_sim, bool).astype(int).tolist(),
        "combos": [[int(c), [int(i) for i in ix]] for c, ix in p.combos],
        "weights": np.asarray(p.weights, np.float64).tolist(),
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(blob, f)
    os.replace(tmp, path)


def load_model(path: str, ps, k: int, cutoff: float, seed: int):
    """Load a TrainedModel if the checkpoint matches this run; else None."""
    from meshclust_tpu.core.trainer import TrainedModel
    from meshclust_tpu.ops import features as F
    try:
        with open(path) as f:
            blob = json.load(f)
    except (OSError, ValueError):
        return None
    if blob.get("kind") != "model" or blob.get("version") != _VERSION:
        return None
    if blob["fingerprint"] != _fingerprint(ps, k, cutoff, seed):
        return None
    feat = F.Feature(ps.V)
    feat.lookup = [int(s) for s in blob["singles"]]
    feat.mins = [float(x) for x in blob["mins"]]
    feat.maxs = [float(x) for x in blob["maxs"]]
    feat.is_sims = [bool(x) for x in blob["is_sim"]]
    feat.is_finalized = [True] * len(feat.lookup)
    feat.combos = [(int(c), list(ix)) for c, ix in blob["combos"]]
    for s in feat.lookup:
        feat.flags |= int(s)
    return TrainedModel(feat, np.asarray(blob["weights"], np.float64),
                        float(blob["cutoff"]), int(blob["k"]))


def save_centers(path: str, centers: List, ps, k: int, cutoff: float,
                 seed: int) -> None:
    """Serialize Phase-A output: [(center_idx, member_idxs), ...]."""
    blob = {
        "version": _VERSION,
        "kind": "centers",
        "fingerprint": _fingerprint(ps, k, cutoff, seed),
        "centers": [[int(c.center), [int(m) for m in c.members]]
                    for c in centers],
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(blob, f)
    os.replace(tmp, path)


def load_centers(path: str, ps, k: int, cutoff: float, seed: int
                 ) -> Optional[List]:
    from meshclust_tpu.core.meanshift import Center
    try:
        with open(path) as f:
            blob = json.load(f)
    except (OSError, ValueError):
        return None
    if blob.get("kind") != "centers" or blob.get("version") != _VERSION:
        return None
    if blob["fingerprint"] != _fingerprint(ps, k, cutoff, seed):
        return None
    return [Center(int(c), [int(m) for m in ms])
            for c, ms in blob["centers"]]
