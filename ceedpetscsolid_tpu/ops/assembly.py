"""Analytic p=1 element-matrix assembly -> CSR (E3f).

Replaces the reference's finite-difference coloring assembly of the coarse
Jacobian (SNESComputeJacobianDefaultColor, src/misc.c:167-173;
DMCreateMatrix, elasticity.c:459-460) with direct analytic assembly: the
pointwise Jacobian tensor K is extracted with 9 unit-gradient applications
of the model's jacobian_qf (same trick as the operator diagonal, E1d) and
contracted with the coarse basis gradients into dense element matrices on
device; the sparse CSR assembly happens host-side (scipy).

BC handling: constrained rows/columns are eliminated and the diagonal set
to 1 (the assembled analog of the solver-level masking).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


def make_element_matrices(jacobian_qf, phys, basis, dtype):
    """Returns fn(qdata, stash) -> (nelem, 3*P3, 3*P3) element matrices.

    DOF ordering within the element: (node i, component c) -> i*3 + c.
    A_e[(i,c1),(j,c2)] = sum_q sum_{d1,d2}
        Bg[d1,q,i] K[c1,d1,c2,d2](q) Bg[d2,q,j]
    """
    P3 = basis.P3
    grad = basis.grad                       # (3, Q3, P3)

    def fn(qdata, stash):
        nelem, Q3 = qdata.shape[1], qdata.shape[2]
        cols = []
        for c2 in range(3):
            row = []
            for d2 in range(3):
                du = jnp.zeros((3, 3, nelem, Q3), dtype)
                du = du.at[c2, d2].set(1.0)
                # ddv[c1, d1, e, q] = K[c1, d1, c2, d2]
                row.append(jacobian_qf(du, qdata, stash, phys))
            cols.append(jnp.stack(row, axis=0))
        K = jnp.stack(cols, axis=0)         # (c2, d2, c1, d1, e, q)
        # tmp[c2, d2, c1, i, e, q] = sum_d1 grad[d1, q, i] K[...]
        tmp = jnp.einsum("aqi,cdxaeq->cdxieq", grad, K)
        # A2[c2, c1, i, j, e] = sum_{q, d2} tmp * grad[d2, q, j]
        A2 = jnp.einsum("cdxieq,dqj->cxije", tmp, grad)
        # element matrix (e, i, c1, j, c2) -> (e, 3P3, 3P3)
        A = jnp.transpose(A2, (4, 2, 1, 3, 0))
        return A.reshape(nelem, 3 * P3, 3 * P3)

    return fn


class CSRAssembler:
    """Fixed-pattern CSR assembly of element matrices (E3f).

    The structural sparsity (union of all element dof pairs, plus the full
    diagonal) is computed ONCE; every refresh only recomputes values via a
    precomputed entry->slot map. A stable pattern across Newton iterations
    is what lets the native AMG hierarchy refresh in place (csrc/amg.cpp)
    and keeps device shapes static.
    """

    def __init__(self, conn: np.ndarray, num_nodes: int, bc_mask: np.ndarray):
        nelem, P3 = conn.shape
        nd = 3 * P3
        n = 3 * num_nodes
        dof = (conn[:, :, None].astype(np.int64) * 3
               + np.arange(3)[None, None, :]).reshape(nelem, nd)
        rows = np.repeat(dof, nd, axis=1).ravel()
        cols = np.tile(dof, (1, nd)).ravel()
        keys = rows * n + cols
        # include the full diagonal so BC unit entries always have a slot
        keys = np.concatenate([keys, np.arange(n, dtype=np.int64) * n
                               + np.arange(n, dtype=np.int64)])
        ukeys, inv = np.unique(keys, return_inverse=True)
        self._inv = inv[: rows.size]
        self._inv_dev = None         # lazy device copy for assemble_values
        self._nnz = ukeys.size
        self._n = n
        urows = (ukeys // n).astype(np.int64)
        ucols = (ukeys % n).astype(np.int32)
        self.indptr = np.zeros(n + 1, np.int64)
        np.add.at(self.indptr, urows + 1, 1)
        self.indptr = np.cumsum(self.indptr)
        self.indices = ucols
        constrained = np.asarray(bc_mask).T.reshape(-1)       # node-major
        # value masks: zero out rows/cols at constrained dofs, add 1 on diag
        self._keep = (~constrained[urows]) & (~constrained[ucols.astype(np.int64)])
        self._bc_diag = np.where(
            (urows == ucols) & constrained[urows], 1.0, 0.0
        )

    def assemble(self, elem_mats: np.ndarray) -> sp.csr_matrix:
        data = np.bincount(
            self._inv,
            weights=np.asarray(elem_mats, dtype=np.float64).ravel(),
            minlength=self._nnz,
        )
        return self._finish(data)

    def _finish(self, data: np.ndarray) -> sp.csr_matrix:
        data = data * self._keep + self._bc_diag
        return sp.csr_matrix(
            (data, self.indices, self.indptr), shape=(self._n, self._n)
        )

    def assemble_values(self, elem_mats) -> "jnp array (nnz,)":
        """DEVICE-side slot reduction: elem_mats (nelem, 3P3, 3P3) device
        array -> (nnz,) CSR value vector, still on device. Cuts the
        per-refresh d2h from nelem*(3P3)^2 entries to nnz (~2x fewer),
        which matters on tunneled chips (~29 MB/s effective d2h)."""
        import jax.numpy as jnp
        from jax.ops import segment_sum

        if self._inv_dev is None:
            self._inv_dev = jnp.asarray(self._inv.astype(np.int32))
        return segment_sum(elem_mats.reshape(-1), self._inv_dev,
                           num_segments=self._nnz)

    def from_values(self, data_host: np.ndarray) -> sp.csr_matrix:
        """Finish assembly from an `assemble_values` result copied to host."""
        return self._finish(np.asarray(data_host, np.float64))


def assemble_csr(elem_mats: np.ndarray, conn: np.ndarray, num_nodes: int,
                 bc_mask: np.ndarray) -> sp.csr_matrix:
    """One-shot convenience wrapper around CSRAssembler."""
    return CSRAssembler(conn, num_nodes, bc_mask).assemble(elem_mats)
