"""Linear classifier fit/predict (reference GLM + Matrix, SURVEY C11).

The reference "GLM" is one-shot least squares onto +/-1 labels:
    weights = pinv(X^T X) X^T y            (GLM.cpp:19-22)
with a sigmoid+round readout at predict time (GLM.cpp:24-33). pinv is a
Gauss-Jordan inverse of the (square, symmetric) normal matrix
(Matrix.cpp:202-214) — numerically this is plain least squares, which we
compute with numpy's lstsq (float64) for stability; identical up to FP
rounding on non-singular problems.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def train(features: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """features [R, C] (first column 1s), labels [R] in {+1, -1} ->
    weights [C]."""
    X = np.asarray(features, np.float64)
    y = np.asarray(labels, np.float64).reshape(-1)
    XtX = X.T @ X
    Xty = X.T @ y
    try:
        w = np.linalg.solve(XtX, Xty)
    except np.linalg.LinAlgError:
        w = np.linalg.lstsq(X, y, rcond=None)[0]
    return w


def decision(features: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Raw linear score X @ w; classifier positive <=> score >= 0
    (round(sigmoid(s)) == 1 for s >= 0, C++ round-half-away)."""
    return np.asarray(features, np.float64) @ np.asarray(weights, np.float64)


def predict(features: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """{0,1} predictions like GLM::predict (sigmoid + round)."""
    return (decision(features, weights) >= 0.0).astype(np.int64)


def accuracy(labels: np.ndarray, preds_pm1: np.ndarray
             ) -> Tuple[float, float, float]:
    """(accuracy%, sensitivity%, specificity%) like GLM::accuracy
    (GLM.cpp:35-63). Inputs are +/-1 labels and +/-1 predictions."""
    y = np.asarray(labels).reshape(-1)
    p = np.asarray(preds_pm1).reshape(-1)
    pos = y == 1
    neg = ~pos
    acc = 100.0 * (y == p).sum() / y.shape[0]
    sens = 100.0 * ((y == p) & pos).sum() / max(1, pos.sum())
    spec = 100.0 * ((y == p) & neg).sum() / max(1, neg.sum())
    return float(acc), float(sens), float(spec)
