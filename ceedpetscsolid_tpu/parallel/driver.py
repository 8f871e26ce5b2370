"""Distributed Newton/CG driver over a 1-D device mesh.

Mirrors the serial solve path of problem.py but executes every operator
application under shard_map with halo exchange (parallel/dist.py), the
SPMD analog of the reference's rank-per-subdomain MPI execution
(SURVEY "Parallelism strategies"). One Newton iteration — residual,
Jacobi-preconditioned CG, critical-point line search, update — is a single
jitted SPMD computation: the "training step" of this framework.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.basis import Basis3D
from . import dist
from .dist import AXIS, ShardArrays
from .partition import SpacePartition, partition_space, scatter_global_to_owned


def _pad_elements(arr: np.ndarray, part: SpacePartition) -> np.ndarray:
    """(nelem, ...) -> (ndev, nelem_max, ...) zero-padded element data."""
    nelem = arr.shape[0]
    out = np.zeros((part.ndev * part.nelem_max,) + arr.shape[1:], arr.dtype)
    out[:nelem] = arr
    return out.reshape((part.ndev, part.nelem_max) + arr.shape[1:])


@dataclass
class DistributedProblem:
    """Distributes an ElasticityProblem's fine level over ndev devices."""

    problem: "ElasticityProblem"  # noqa: F821
    ndev: int
    devices: list | None = None

    def __post_init__(self):
        prob = self.problem
        fes = prob.fine_space
        self.part = partition_space(fes.conn, fes.num_nodes, self.ndev)
        self.sa = ShardArrays.from_partition(self.part)
        self.basis = prob.factory.fine.basis
        self.model = prob.model
        self.phys = prob.phys
        self.dtype = prob.dtype

        # qdata (10, nelem, Q3) -> (ndev, 10, nelem_max, Q3), zero padding
        qd = np.asarray(prob.qdata)
        nq, nelem, Q3 = qd.shape
        qd_pad = np.zeros((nq, self.part.ndev * self.part.nelem_max, Q3), qd.dtype)
        qd_pad[:, :nelem] = qd
        qd_pad = qd_pad.reshape(nq, self.part.ndev, self.part.nelem_max, Q3)
        self.qdata_sh = jnp.asarray(np.moveaxis(qd_pad, 1, 0))

        self.mask_sh = jnp.asarray(
            scatter_global_to_owned(self.part, np.asarray(prob.bc_mask))
        )
        self.F_sh = jnp.asarray(
            scatter_global_to_owned(self.part, np.asarray(prob.F))
        )

        devs = self.devices or jax.devices()[: self.ndev]
        self.mesh = Mesh(np.array(devs), (AXIS,))
        self._build_step()

    # -- host-side converters ------------------------------------------
    def to_owned(self, u_global: np.ndarray) -> jnp.ndarray:
        arr = scatter_global_to_owned(self.part, np.asarray(u_global))
        return jax.device_put(
            jnp.asarray(arr), NamedSharding(self.mesh, P(AXIS))
        )

    def to_global(self, owned) -> np.ndarray:
        from .partition import gather_owned_to_global

        return gather_owned_to_global(self.part, np.asarray(owned))

    # ------------------------------------------------------------------
    def _build_step(self):
        sa = self.sa
        basis = self.basis
        model = self.model
        phys = self.phys
        ksp_rtol = self.problem.config.ksp_rtol
        ksp_max_it = min(self.problem.config.ksp_max_it, 10_000)

        def elem_residual(ue, qdata):
            du = basis.apply_grad(ue)
            dv, stash = model.residual_qf(du, qdata, phys)
            return basis.apply_grad_T(dv), stash

        def elem_jacobian(due, qdata, stash):
            ddu = basis.apply_grad(due)
            ddv = model.jacobian_qf(ddu, qdata, stash, phys)
            return basis.apply_grad_T(ddv)

        BB = jnp.einsum("aqp,bqp->qpab", basis.grad, basis.grad)

        def elem_diagonal(qdata, stash):
            nelem, Q3 = qdata.shape[1], qdata.shape[2]
            diag_e = jnp.zeros((3, nelem, basis.P3), self.dtype)
            for c2 in range(3):
                for d2 in range(3):
                    du = jnp.zeros((3, 3, nelem, Q3), self.dtype)
                    du = du.at[c2, d2].set(1.0)
                    ddv = model.jacobian_qf(du, qdata, stash, phys)
                    Krow = ddv[c2]
                    contrib = jnp.einsum("qpa,aeq->ep", BB[..., d2], Krow)
                    diag_e = diag_e.at[c2].add(contrib)
            return diag_e

        def body(u, bc_vals, F, mask, qdata, sa):
            """shard_map body: one Newton iteration. Per-shard blocks carry a
            leading axis of 1; qdata/mask/... are (1, ...) views."""
            qd = qdata[0]
            msk = mask

            def residual(uo):
                u_in = jnp.where(msk, bc_vals, uo)
                local = dist.g2l(u_in, sa)
                ue = dist.gather_elements(local, sa)
                ve, stash = elem_residual(ue, qd)
                acc = dist.scatter_elements(ve, sa)
                r = dist.l2g_add(acc, sa)
                return jnp.where(msk, 0.0, r - F), stash

            def jac_apply(v, stash):
                v_in = jnp.where(msk, 0.0, v)
                local = dist.g2l(v_in, sa)
                ue = dist.gather_elements(local, sa)
                ve = elem_jacobian(ue, qd, stash)
                acc = dist.scatter_elements(ve, sa)
                jv = dist.l2g_add(acc, sa)
                return jnp.where(msk, 0.0, jv)

            G, stash = residual(u)

            # Jacobi diagonal (distributed assembly)
            diag_e = elem_diagonal(qd, stash)
            dacc = dist.scatter_elements(diag_e, sa)
            diag = dist.l2g_add(dacc, sa)
            diag = jnp.where(msk, 1.0, diag)
            diag = jnp.where(diag == 0.0, 1.0, diag)   # padded owned slots
            dinv = 1.0 / diag

            # --- PCG (natural norm, distributed dots) ------------------
            b = -G
            x = jnp.zeros_like(b)
            r = b
            z = dinv * r
            rz = dist.ddot(r, z)
            tol = jnp.sqrt(jnp.abs(rz)) * ksp_rtol

            def cond(s):
                x, r, z, p, rz, it = s
                return (jnp.sqrt(jnp.abs(rz)) > tol) & (it < ksp_max_it)

            def bodyf(s):
                x, r, z, p, rz, it = s
                Ap = jac_apply(p, stash)
                alpha = rz / dist.ddot(p, Ap)
                x = x + alpha * p
                r = r - alpha * Ap
                z = dinv * r
                rz2 = dist.ddot(r, z)
                p = z + (rz2 / rz) * p
                return (x, r, z, p, rz2, it + 1)

            x, r, z, p, rz, iters = jax.lax.while_loop(
                cond, bodyf, (x, r, z, r * 0 + z, rz, jnp.int32(0))
            )
            d = x

            # --- critical-point line search (1 secant step) ------------
            g0 = dist.ddot(G, d)
            G1, _ = residual(u + d)
            g1 = dist.ddot(G1, d)
            lam_raw = g0 / (g0 - g1)
            ok = jnp.isfinite(lam_raw) & (lam_raw > 1e-8) & (lam_raw < 1e2)
            lam = jnp.where(ok, lam_raw, 1.0)

            u_new = u + lam * d
            G_new, _ = residual(u_new)
            rnorm_in = dist.dnorm(G)
            rnorm = dist.dnorm(G_new)
            return u_new, rnorm_in, rnorm, iters

        spec = P(AXIS)
        self._step = jax.jit(
            jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=(spec, spec, spec, spec, spec, spec),
                out_specs=(spec, P(), P(), P()),
            )
        )

    # ------------------------------------------------------------------
    def newton_step(self, u_owned, load_increment: float):
        bc = self.to_owned(self.problem.bcs.values(
            self.problem._coords, load_increment
        ).T.astype(np.asarray(u_owned).dtype))
        F = self.F_sh * load_increment
        return self._step(u_owned, bc, F, self.mask_sh, self.qdata_sh, self.sa)

    def solve(self, num_increments=None, max_newton=50, rtol=1e-8):
        """Full load-continuation solve; returns (u_global, info dict)."""
        cfg = self.problem.config
        n_inc = num_increments or cfg.num_increments
        u = self.to_owned(
            np.zeros((3, self.problem.fine_space.num_nodes))
        )
        total_ksp = 0
        total_newton = 0
        rnorm = None
        for inc in range(1, n_inc + 1):
            load = inc / n_inc
            rnorm_entry0 = None
            for _ in range(max_newton):
                u, rnorm_in, rnorm, iters = self.newton_step(u, load)
                total_ksp += int(iters)
                total_newton += 1
                if rnorm_entry0 is None:
                    rnorm_entry0 = max(float(rnorm_in), 1e-300)
                r = float(rnorm)
                if r < 1e-50 or r < rtol * rnorm_entry0:
                    break
        u_np = self.to_global(u)                       # (3, num_nodes)
        bc_vals = self.problem.bcs.values(self.problem._coords, 1.0).T
        mask = np.asarray(self.problem.bc_mask)
        u_np = np.where(mask, bc_vals, u_np)
        return u_np, {
            "newton_iters": total_newton,
            "ksp_iters": total_ksp,
            "rnorm": float(rnorm),
        }
