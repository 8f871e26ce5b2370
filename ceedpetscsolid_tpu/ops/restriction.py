"""Element restriction: L-vector <-> E-vector gather / scatter-add.

The CeedElemRestriction analog (reference src/setuplibceed.c:194-240).
On TPU the gather is a `take` and the transpose is a `segment_sum` over the
flattened element index array — both XLA-native, deterministic, and
differentiable. Strided "identity" restrictions of the reference
(src/setuplibceed.c:304-318) are pure reshapes and need no code here.

Unlike the reference, constrained (Dirichlet) DOFs are NOT encoded as
negative indices; boundary conditions are applied by masking at the solver
level (see solve/ and models/boundary docs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Restriction:
    """Gather/scatter between (num_nodes, ncomp) and (nelem, P3, ncomp)."""

    def __init__(self, conn: np.ndarray, num_nodes: int):
        self.conn = jnp.asarray(conn, dtype=jnp.int32)      # (nelem, P3)
        self.num_nodes = int(num_nodes)
        self.nelem, self.P3 = conn.shape

    def gather(self, u: jnp.ndarray) -> jnp.ndarray:
        """L-vector (num_nodes, ncomp) -> E-vector (nelem, P3, ncomp)."""
        return jnp.take(u, self.conn, axis=0)

    def scatter_add(self, ve: jnp.ndarray) -> jnp.ndarray:
        """E-vector (nelem, P3, ncomp) -> L-vector (num_nodes, ncomp), summed."""
        ncomp = ve.shape[-1]
        flat = ve.reshape(-1, ncomp)
        return jax.ops.segment_sum(
            flat, self.conn.reshape(-1), num_segments=self.num_nodes
        )

    def multiplicity(self) -> jnp.ndarray:
        """(num_nodes,) per-node element count."""
        ones = jnp.ones((self.nelem, self.P3, 1), dtype=jnp.float32)
        return self.scatter_add(ones)[:, 0]
