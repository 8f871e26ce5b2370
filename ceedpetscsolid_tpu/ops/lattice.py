"""Index-free element restriction for structured (box) meshes.

On a canonical box mesh the degree-p node lattice is a tensor grid of shape
(Nz, Ny, Nx) with Nd = p*ed + 1, and element e = (a, b, c) owns the lattice
window [p*a, p*a+p] x [p*b, ...] x [p*c, ...]. The L-vector <-> E-vector
gather/scatter then needs NO index arrays at all:

* gather  = per-axis "unfold": a reshape of the window bodies plus one
  strided slice for the shared tail plane, concatenated;
* scatter = the exact adjoint "fold": reshape-add of the bodies plus a
  shifted add of the tail planes.

Everything is static slices / reshapes / concats — pure bulk memory moves
that XLA fuses and executes at HBM bandwidth. This replaces the row-gather
restriction (ops/structured.py) on box meshes, where XLA's per-row gather
(~12.5 ns/row on TPU) dominates the whole matrix-free operator; measured
~10x faster than row gathers at degree 4.

This is the structured-mesh analog of CeedElemRestriction (reference
src/setuplibceed.c:194-240) specialized to DMPlexCreateBoxMesh-generated
grids (reference src/setupdm.c:49-55). Exodus/unstructured meshes keep the
general entity-row path.

Interface-compatible with both ops/restriction.Restriction (gather /
scatter_add on (ncomp, ...) arrays) and ops/structured.StructuredRestriction
(gather_rows / scatter_rows on node-major rows), with the element-local
column order being PLAIN LATTICE order (x fastest) — callers must build the
gradient GEMM matrices with an identity `col_lattice`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class LatticeRestriction:
    """Gather/scatter between lattice-numbered L-vectors and E-vectors.

    Requires the FE space's node numbering to be lattice order
    (node (i, j, k) -> i + Nx*(j + Ny*k)) and the mesh's element order to be
    lattice order (element (a, b, c) -> a + ex*(b + ey*c)); both hold for
    `mesh.fespace.build_fespace` on canonical box meshes.
    """

    def __init__(self, dims, degree: int):
        ex, ey, ez = (int(d) for d in dims)
        p = int(degree)
        self.dims = (ex, ey, ez)
        self.p = p
        self.P = p + 1
        self.P3 = self.P ** 3
        self.nelem = ex * ey * ez
        self.Nx, self.Ny, self.Nz = p * ex + 1, p * ey + 1, p * ez + 1
        self.num_nodes = self.Nx * self.Ny * self.Nz

    # ------------------------------------------------------------------
    def _unfold(self, u):
        """(num_nodes, C) -> (nelem, P3, C) element windows, lattice order."""
        p, P = self.p, self.P
        ex, ey, ez = self.dims
        C = u.shape[-1]
        a = u.reshape(self.Nz, self.Ny, self.Nx, C)
        # x: (Nz, Ny, Nx, C) -> (Nz, Ny, ex, P, C)
        body = a[:, :, : ex * p].reshape(self.Nz, self.Ny, ex, p, C)
        tail = a[:, :, p::p]                              # (Nz, Ny, ex, C)
        a = jnp.concatenate([body, tail[:, :, :, None, :]], axis=3)
        # y: -> (Nz, ey, P, ex, P, C)
        body = a[:, : ey * p].reshape(self.Nz, ey, p, ex, P, C)
        tail = a[:, p::p]                                 # (Nz, ey, ex, P, C)
        a = jnp.concatenate([body, tail[:, :, None]], axis=2)
        # z: -> (ez, P, ey, P, ex, P, C)
        body = a[: ez * p].reshape(ez, p, ey, P, ex, P, C)
        tail = a[p::p]                                    # (ez, ey, P, ex, P, C)
        a = jnp.concatenate([body, tail[:, None]], axis=1)
        # element-major (ez, ey, ex), local (k, j, i) with i fastest
        a = a.transpose(0, 2, 4, 1, 3, 5, 6)
        return a.reshape(self.nelem, self.P3, C)

    def _fold(self, ve):
        """(nelem, P3, C) -> (num_nodes, C): adjoint of `_unfold` (owner-sum
        over the shared tail planes). Bitwise deterministic.

        Per axis: one body-reshape concat + one strided-index add of the
        interior tail planes (2 materializations/axis; interface nodes sum
        body-then-tail in a fixed order)."""
        p, P = self.p, self.P
        ex, ey, ez = self.dims
        C = ve.shape[-1]
        a = ve.reshape(ez, ey, ex, P, P, P, C).transpose(0, 3, 1, 4, 2, 5, 6)
        # z fold: (ez, P, ey, P, ex, P, C) -> (Nz, ey, P, ex, P, C)
        body = a[:, :p].reshape(ez * p, ey, P, ex, P, C)
        z = jnp.concatenate([body, a[-1:, p]], axis=0)
        z = z.at[p: ez * p: p].add(a[:-1, p])
        # y fold: (Nz, ey, P, ex, P, C) -> (Nz, Ny, ex, P, C)
        body = z[:, :, :p].reshape(self.Nz, ey * p, ex, P, C)
        y = jnp.concatenate([body, z[:, -1:, p]], axis=1)
        y = y.at[:, p: ey * p: p].add(z[:, :-1, p])
        # x fold: (Nz, Ny, ex, P, C) -> (Nz, Ny, Nx, C)
        body = y[:, :, :, :p].reshape(self.Nz, self.Ny, ex * p, C)
        x = jnp.concatenate([body, y[:, :, -1:, p]], axis=2)
        x = x.at[:, :, p: ex * p: p].add(y[:, :, :-1, p])
        return x.reshape(self.num_nodes, C)

    # -- Restriction-compatible interface --------------------------------
    def gather(self, u: jnp.ndarray) -> jnp.ndarray:
        """(ncomp, num_nodes) -> (ncomp, nelem, P3)."""
        return jnp.moveaxis(self._unfold(u.T), -1, 0)

    def scatter_add(self, ve: jnp.ndarray) -> jnp.ndarray:
        """(ncomp, nelem, P3) -> (ncomp, num_nodes), owner-summed."""
        return self._fold(jnp.moveaxis(ve, 0, -1)).T

    def multiplicity(self) -> jnp.ndarray:
        ones = jnp.ones((1, self.nelem, self.P3), dtype=jnp.float32)
        return self.scatter_add(ones)[0]

    # -- StructuredRestriction-compatible interface -----------------------
    # NOTE: element-local column order is plain lattice (x fastest); build
    # the gradient GEMM with col_lattice = arange(P3).
    def gather_rows(self, u_rows: jnp.ndarray) -> jnp.ndarray:
        """(num_nodes, 3) -> (nelem, P3*3) node-major, comps contiguous."""
        return self._unfold(u_rows).reshape(self.nelem, -1)

    def scatter_rows(self, ve: jnp.ndarray) -> jnp.ndarray:
        """(nelem, P3*3) -> (num_nodes, 3) owner-summed."""
        return self._fold(ve.reshape(self.nelem, self.P3, -1))

    # -- pytree protocol: fully static, no array children ------------------
    def tree_flatten(self):
        return (), (self.dims, self.p)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1])


jax.tree_util.register_pytree_node(
    LatticeRestriction,
    lambda r: r.tree_flatten(),
    LatticeRestriction.tree_unflatten,
)
