"""Fellegi-Sunter EM estimation (driver-side numpy).

Same latent-class model as /root/reference/faster/estimation.py:98-158: a
two-class naive-Bayes mixture over discretized agreement patterns, fitted by
EM on the pattern histogram. The sufficient statistics (Counts) come from one
Spark aggregation; the EM itself runs on at most 3^KF * 2^KE rows, so it stays
on the driver.

Deliberate divergences from the reference (documented in SURVEY.md §2 #24):
- Initialization is SEEDED (the reference uses unseeded np.random.dirichlet,
  estimation.py:118-120 — nondeterministic). Same sorted-dirichlet shape.
- We compute the E-step in float64 (the reference uses float32).
"""

from __future__ import annotations

import numpy as np

from .patterns import gamma_matrix, level_cardinalities

__all__ = ["Estimation"]


class Estimation:
    """EM fit of the Fellegi-Sunter model over a pattern histogram.

    Parameters mirror the reference API (estimation.py:16-54): ``k_fuzzy``
    fuzzy variables with 3 levels, ``k_exact`` exact variables with 2 levels,
    ``counts`` the full pattern histogram (length 3^KF * 2^KE, pattern 0 =
    complement row).
    """

    def __init__(self, k_fuzzy: int, k_exact: int, counts: np.ndarray, seed: int = 13):
        counts = np.asarray(counts, dtype=np.float64)
        self.k_fuzzy = k_fuzzy
        self.k_exact = k_exact
        self.counts = counts
        self.gamma = gamma_matrix(k_fuzzy, k_exact)
        if len(counts) != len(self.gamma):
            raise ValueError(
                f"counts has {len(counts)} rows, pattern space has {len(self.gamma)}"
            )
        self.seed = seed
        self.lam: float | None = None
        self.pi: list[list[np.ndarray]] | None = None
        self.converged: bool | None = None
        self.n_iter: int = 0
        self._fitted = False
        self._ksi: np.ndarray | None = None

    # E-step: posterior match probability per pattern (estimation.py:72-96).
    def _match_probability(self) -> np.ndarray:
        k_total = self.k_fuzzy + self.k_exact
        log_prob = np.zeros((2, len(self.gamma)))
        for m in range(2):
            for k in range(k_total):
                log_prob[m] += np.log(self.pi[m][k][self.gamma[:, k]])
        cond = np.exp(log_prob)
        num = self.lam * cond[1]
        return num / (num + (1.0 - self.lam) * cond[0])

    def fit(self, tolerance: float = 1e-4, max_iter: int = 5000) -> "Estimation":
        if self._fitted:
            raise RuntimeError("model already fitted")

        rng = np.random.default_rng(self.seed)
        cards = level_cardinalities(self.k_fuzzy, self.k_exact)

        self.lam = 0.1
        # Sorted dirichlet init, same shape as the reference: non-match class
        # puts more mass on low levels, match class on high levels.
        pi_0 = [-np.sort(-rng.dirichlet(np.arange(1, c * 50 + 1, 50))) for c in cards]
        pi_1 = [np.sort(rng.dirichlet(np.arange(1, c * 50 + 1, 50))) for c in cards]
        self.pi = [pi_0, pi_1]

        total = self.counts.sum()
        self.converged = False
        it = 1
        while not self.converged and it <= max_iter:
            ksi = self._match_probability()

            # M-step closed forms (estimation.py:135-141).
            self.lam = float(np.dot(ksi, self.counts) / total)
            w1 = ksi * self.counts
            w0 = (1.0 - ksi) * self.counts
            d1 = w1.sum()
            d0 = w0.sum()
            new_pi = [[], []]
            for k, c in enumerate(cards):
                col = self.gamma[:, k]
                p0 = np.array([w0[col == l].sum() for l in range(c)]) / d0
                p1 = np.array([w1[col == l].sum() for l in range(c)]) / d1
                new_pi[0].append(p0)
                new_pi[1].append(p1)

            old_flat = np.concatenate([np.concatenate(x) for x in self.pi])
            new_flat = np.concatenate([np.concatenate(x) for x in new_pi])
            if np.max(np.abs(new_flat - old_flat)) < tolerance:
                self.converged = True
            self.pi = new_pi
            it += 1

        self.n_iter = it - 1
        self._fitted = True
        return self

    @property
    def ksi(self) -> np.ndarray:
        """Posterior match probability per pattern (estimation.py:160-177)."""
        if not self._fitted:
            raise RuntimeError("fit() first")
        if self._ksi is None:
            self._ksi = self._match_probability()
        return self._ksi
