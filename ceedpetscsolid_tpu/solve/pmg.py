"""p-multigrid V-cycle preconditioner (reference elasticity.c:524-590).

Multiplicative V-cycle over the p-coarsening level hierarchy with 3
pre/post Chebyshev(Jacobi) smooths per level (PCMGSetNumberSmooth(3),
elasticity.c:589), Gauss-Lobatto coarse-to-fine prolongation with
multiplicity scaling (matops.c:115-157), and a fixed-polynomial coarse
solve. Everything is a fixed LINEAR operation in the input, so the cycle is
a valid stationary preconditioner for the outer CG.

The reference's coarse solve is one GAMG application on the assembled p=1
matrix (elasticity.c:568-585); here the default coarse solve is one V-cycle
of the native smoothed-aggregation AMG (solve/amg.py + csrc/amg.cpp) on the
analytically assembled p=1 CSR (ops/assembly.py), with a heavier Chebyshev
polynomial at p=1 as the matrix-free fallback.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp

from .cg import chebyshev


@dataclass
class MGLevel:
    """Static per-level data; A/diag depend on the current Newton state."""

    apply: Callable         # (v, stash) -> A_l v, BC-masked
    mask: jnp.ndarray       # (nnodes_l, 3) bool constrained
    prolong: Callable | None   # from level l-1 (None at coarsest)
    restrict: Callable | None  # to level l-1


def make_vcycle(
    levels: list[MGLevel],
    smooth_its: int = 3,
    coarse_cheb_its: int = 30,
    coarse_apply=None,
):
    """Returns vcycle(b, stash, diag_invs, bounds, coarse_data) ->
    approx A_fine^{-1} b.

    diag_invs: list of (3, nnodes_l) inverse diagonals per level.
    bounds: list of (lam_min, lam_max) Chebyshev intervals per level.
    coarse_apply: optional (b0, coarse_data) -> x0 coarse solver (e.g. the
    AMG V-cycle of solve/amg.py, the GAMG analog); defaults to a heavy
    Chebyshev polynomial at p=1.
    """
    nlev = len(levels)

    def vcycle(b, stash, diag_invs, bounds, coarse_data=None):
        bs = [None] * nlev
        xs = [None] * nlev
        bs[-1] = b
        # downward: pre-smooth + restrict residual
        for l in range(nlev - 1, 0, -1):
            lvl = levels[l]
            A = lambda v, l=l: levels[l].apply(v, stash)  # noqa: E731
            lo, hi = bounds[l]
            xs[l] = chebyshev(A, bs[l], diag_invs[l], lo, hi, smooth_its)
            r = bs[l] - A(xs[l])
            bc = lvl.restrict(r)
            bs[l - 1] = jnp.where(levels[l - 1].mask, 0.0, bc)
        # coarse solve (elasticity.c:568-585): AMG if provided, else heavy
        # Chebyshev at p=1
        if coarse_apply is not None:
            xs[0] = coarse_apply(bs[0], coarse_data)
            xs[0] = jnp.where(levels[0].mask, 0.0, xs[0])
        else:
            A0 = lambda v: levels[0].apply(v, stash)  # noqa: E731
            lo0, hi0 = bounds[0]
            xs[0] = chebyshev(A0, bs[0], diag_invs[0], lo0, hi0,
                              coarse_cheb_its)
        # upward: prolong + post-smooth
        for l in range(1, nlev):
            lvl = levels[l]
            corr = jnp.where(lvl.mask, 0.0, lvl.prolong(xs[l - 1]))
            x = xs[l] + corr
            A = lambda v, l=l: levels[l].apply(v, stash)  # noqa: E731
            lo, hi = bounds[l]
            xs[l] = chebyshev(A, bs[l], diag_invs[l], lo, hi, smooth_its, x0=x)
        return xs[-1]

    return vcycle
