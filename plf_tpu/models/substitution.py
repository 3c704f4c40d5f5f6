"""Substitution models: rate matrices, eigensystem, PLF branch matrices.

The reference accelerator consumes pre-computed 64-float branch matrices
and a 16-float eigenvector matrix as opaque inputs (its host fills them
randomly, app/src/host_mem.cpp:190-196) because production RAxML computes
them on the CPU from the substitution model eigendecomposition.  A complete
engine needs the producer side too; this module implements it.

The PLF dataflow (app/src/plf.cpp:29-50) computes, per category ``c``:

    x3 = EVarr^T [ (left_c . x1) * (right_c . x2) ]        (* = Hadamard)

For this to realise Felsenstein pruning, CLVs are kept in **eigen
coordinates**: with a reversible ``Q = U diag(lam) W`` (``W = U^-1``), a
conditional likelihood vector ``L`` (state space) is stored as
``x = W . L``.  Then

    left_c[k, a]  = U[k, a] * exp(lam_a * t_left * r_c)
    EVarr[k, l]   = W[l, k]                       (i.e. W^T)

gives ``left_c . x1 = P(t_left, r_c) . L1`` (state space), the Hadamard
product is the pruning product, and ``EVarr^T`` maps the parent partial
back into eigen coordinates.  Tips enter as ``x_tip = W . e_obs`` (the
RAxML "tipVector") and the root likelihood per site is
``(pi^T U) . x_root``.

Gamma rate heterogeneity uses the standard mean-normalised discretisation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

__all__ = ["SubstitutionModel", "jc69", "hky85", "gtr", "random_gtr",
           "discrete_gamma_rates", "branch_matrices"]

# ACGT index order for DNA convenience helpers.
DNA_STATES = "ACGT"


def _normalise_q(q: np.ndarray, pi: np.ndarray) -> np.ndarray:
    """Scale Q so the expected substitution rate is 1."""
    rate = -np.sum(pi * np.diag(q))
    return q / rate


def _reversible_eigen(q: np.ndarray, pi: np.ndarray):
    """Real eigensystem of a reversible Q via the symmetrised form.

    B = D^{1/2} Q D^{-1/2} (D = diag(pi)) is symmetric; with B = V L V^T:
    U = D^{-1/2} V (right eigenvectors, columns), W = V^T D^{1/2} = U^{-1}.
    """
    d = np.sqrt(pi)
    b = (q * d[:, None]) / d[None, :]
    b = 0.5 * (b + b.T)
    lam, v = np.linalg.eigh(b)
    u = v / d[:, None]
    w = v.T * d[None, :]
    return lam, u, w


@dataclasses.dataclass(frozen=True)
class SubstitutionModel:
    """An eigendecomposed reversible substitution model."""

    pi: np.ndarray           # (S,) stationary frequencies
    eigenvalues: np.ndarray  # (S,)
    u: np.ndarray            # (S, S) right eigenvectors, u[state, eigidx]
    w: np.ndarray            # (S, S) inverse, w[eigidx, state]

    @property
    def states(self) -> int:
        return self.pi.shape[0]

    @property
    def plf_ev(self) -> np.ndarray:
        """The EV array the PLF consumes (stage 3): EVarr[k, l] = W[l, k]."""
        return np.ascontiguousarray(self.w.T.astype(np.float32))

    @property
    def root_vector(self) -> np.ndarray:
        """v with per-site likelihood = v . x_root (eigen coords)."""
        return (self.pi @ self.u).astype(np.float64)

    def p_matrix(self, t: float, rate: float = 1.0) -> np.ndarray:
        """Full transition matrix P[from, to] = (U diag(e^{lam t r}) W)."""
        e = np.exp(self.eigenvalues * t * rate)
        return (self.u * e[None, :]) @ self.w

    def tip_clv(self, states_idx: np.ndarray, categories: int = 4,
                dtype=np.float32) -> np.ndarray:
        """Tip CLV in eigen coordinates, replicated per rate category.

        ``states_idx``: (n,) int array of observed states; values >= S (or
        negative) mean fully ambiguous/gap (likelihood 1 for every state).
        Returns (n, categories, S).
        """
        n = states_idx.shape[0]
        s = self.states
        onehot = np.zeros((n, s), dtype=np.float64)
        valid = (states_idx >= 0) & (states_idx < s)
        onehot[np.arange(n)[valid], states_idx[valid]] = 1.0
        onehot[~valid] = 1.0  # gap/ambiguity: all states possible
        x = onehot @ self.w.T                      # (n, S) eigen coords
        x = np.repeat(x[:, None, :], categories, axis=1)
        return x.astype(dtype)


def _make(qsym: np.ndarray, pi: np.ndarray) -> SubstitutionModel:
    pi = np.asarray(pi, dtype=np.float64)
    pi = pi / pi.sum()
    q = qsym * pi[None, :]
    np.fill_diagonal(q, 0.0)
    np.fill_diagonal(q, -q.sum(axis=1))
    q = _normalise_q(q, pi)
    lam, u, w = _reversible_eigen(q, pi)
    return SubstitutionModel(pi=pi, eigenvalues=lam, u=u, w=w)


def jc69() -> SubstitutionModel:
    """Jukes-Cantor 1969 (equal rates and frequencies)."""
    qsym = np.ones((4, 4)) - np.eye(4)
    return _make(qsym, np.full(4, 0.25))


def hky85(kappa: float = 2.0, pi=None) -> SubstitutionModel:
    """HKY85 with transition/transversion ratio kappa (ACGT order)."""
    if pi is None:
        pi = np.full(4, 0.25)
    qsym = np.ones((4, 4)) - np.eye(4)
    qsym[0, 2] = qsym[2, 0] = kappa  # A<->G
    qsym[1, 3] = qsym[3, 1] = kappa  # C<->T
    return _make(qsym, pi)


def gtr(rates, pi) -> SubstitutionModel:
    """General time-reversible model from S*(S-1)/2 exchangeabilities."""
    pi = np.asarray(pi, dtype=np.float64)
    s = pi.shape[0]
    qsym = np.zeros((s, s))
    qsym[np.triu_indices(s, 1)] = rates
    qsym = qsym + qsym.T
    return _make(qsym, pi)


def random_gtr(states: int = 4, seed: int = 0) -> SubstitutionModel:
    """Random GTR-class model of any state count (e.g. 20 for protein)."""
    rng = np.random.default_rng(seed)
    rates = rng.random(states * (states - 1) // 2) + 0.1
    pi = rng.random(states) + 0.1
    return gtr(rates, pi / pi.sum())


def discrete_gamma_rates(alpha: float, categories: int = 4) -> np.ndarray:
    """Mean-normalised discrete Gamma rates (median discretisation)."""
    from scipy.stats import gamma as _gamma
    c = categories
    quantiles = (2 * np.arange(c) + 1) / (2.0 * c)
    rates = _gamma.ppf(quantiles, a=alpha, scale=1.0 / alpha)
    return (rates * c / rates.sum()).astype(np.float64)


def branch_matrices(model: SubstitutionModel, t: float,
                    rates: Optional[np.ndarray] = None,
                    categories: int = 4) -> np.ndarray:
    """Per-category PLF branch matrix: (C, S, S), [c, k, a].

    ``left[c, k, a] = U[k, a] * exp(lam_a * t * r_c)`` so that contracting
    a child's eigen-coordinate CLV reproduces the full P-matrix action in
    state space (see module docstring).  This is the 64-float ``left``/
    ``right`` input the reference streams per call (host_mem.cpp:232-236).
    """
    if rates is None:
        rates = np.ones((categories,))
    out = np.empty((len(rates), model.states, model.states), dtype=np.float64)
    for c, r in enumerate(rates):
        e = np.exp(model.eigenvalues * t * r)
        out[c] = model.u * e[None, :]
    return out.astype(np.float32)
