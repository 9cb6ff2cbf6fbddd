"""Threshold evaluation: estimated FDR / FNR / optimal threshold.

Mirrors /root/reference/faster/evaluation.py, with one documented fix: the
reference's FNR has an operator-precedence bug at evaluation.py:43
(``/ self.Lambda * np.sum(self.Counts)`` multiplies instead of dividing by the
total count). We implement the intended formula
``sum(ksi * 1[ksi < S] * counts) / (lambda * sum(counts))``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["Evaluation"]


class Evaluation:
    def __init__(self, lam: float, ksi: np.ndarray, counts: np.ndarray):
        self.lam = float(lam)
        self.ksi = np.asarray(ksi, dtype=np.float64)
        self.counts = np.asarray(counts, dtype=np.float64)

    def fdr(self, threshold: float) -> float:
        """Estimated false discovery rate at a posterior threshold
        (evaluation.py:21-32)."""
        sel = self.ksi >= threshold
        denom = (sel * self.counts).sum()
        if denom == 0:
            return float("nan")
        return float(((1.0 - self.ksi) * sel * self.counts).sum() / denom)

    def fnr(self, threshold: float) -> float:
        """Estimated false negative rate (corrected formula; see module
        docstring)."""
        sel = self.ksi < threshold
        denom = self.lam * self.counts.sum()
        if denom == 0:
            return float("nan")
        return float((self.ksi * sel * self.counts).sum() / denom)

    def frontier(self, n: int = 1000) -> np.ndarray:
        """(threshold, fdr, fnr) rows over a threshold grid
        (evaluation.py:47-55, minus the matplotlib)."""
        ts = np.linspace(0.0, 1.0, n + 1)
        return np.array([[t, self.fdr(t), self.fnr(t)] for t in ts])

    def optimal_threshold(self, alpha: float = 1.0, n: int = 1000) -> float:
        """argmin FDR(s) + alpha * FNR(s); NaN objective treated as 1 + alpha
        (evaluation.py:57-67)."""
        ts = np.linspace(0.0, 1.0, n + 1)
        obj = np.array([self.fdr(t) + alpha * self.fnr(t) for t in ts])
        obj = np.where(np.isnan(obj), 1.0 + alpha, obj)
        return float(ts[int(np.argmin(obj))])
