"""Distributed Newton driver over a 1-D device mesh.

Mirrors the serial solve path of problem.py but executes every operator
application under shard_map with halo exchange (parallel/dist.py), the
SPMD analog of the reference's rank-per-subdomain MPI execution
(SURVEY "Parallelism strategies"). One Newton iteration — residual, CG with
Jacobi or full p-multigrid(+replicated AMG coarse) preconditioning,
critical-point line search, update — is a single jitted SPMD computation:
the "training step" of this framework.

Every mesh-sized array travels as a jit argument (sharded pytrees), so
compiled modules stay small and shapes stay static across Newton steps.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import dist, mg as dmg
from ..models.base import Mat3
from ..ops.structured import grad_gemm_matrices
from .dist import AXIS, ShardArrays
from .partition import (
    SpacePartition,
    gather_owned_to_global,
    partition_space,
    scatter_global_to_owned,
)


@dataclass
class DistributedProblem:
    """Distributes an ElasticityProblem over ndev devices.

    use_mg: p-multigrid-preconditioned CG inside the SPMD step (requires the
    problem to be configured with multigrid != 'none' and a single-operator
    model; composite models fall back to Jacobi).
    """

    problem: "ElasticityProblem"  # noqa: F821
    ndev: int
    devices: list | None = None
    use_mg: bool | None = None

    def __post_init__(self):
        prob = self.problem
        fes = prob.fine_space
        if self.use_mg is None:
            self.use_mg = (
                prob.config.multigrid != "none"
                and len(prob.spaces) > 1
                and not prob.composite
            )
        self.part = partition_space(fes.conn, fes.num_nodes, self.ndev)
        self.sa = ShardArrays.from_partition(self.part)
        self.model = prob.model
        self.phys = prob.phys
        self.dtype = prob.dtype

        # qdata (10, nelem, Q3) -> (ndev, 10, nelem_max, Q3), zero padding
        qd = np.asarray(prob.qdata)
        self.qdata_sh = jnp.asarray(self._pad_qdata(qd))
        self.composite = prob.composite
        if self.composite:
            # reduced-integration pressure operator data (Q=1 qdata +
            # P->1 gradient GEMM, src/setuplibceed.c:404-506)
            self.qdata_p_sh = jnp.asarray(
                self._pad_qdata(np.asarray(prob.qdata_p)))
            pb = prob.pfactory.fine.basis
            self.sgrad_p = grad_gemm_matrices(
                pb, np.arange(pb.P3), prob.dtype)
        else:
            self.qdata_p_sh = None
            self.sgrad_p = None

        self.mask_sh = jnp.asarray(
            scatter_global_to_owned(self.part, np.asarray(prob.bc_mask))
        )
        self.F_sh = jnp.asarray(
            scatter_global_to_owned(self.part, np.asarray(prob.F))
        )

        devs = self.devices or jax.devices()[: self.ndev]
        if len(devs) != self.ndev:
            raise ValueError(
                f"need {self.ndev} devices for ndev={self.ndev}, "
                f"have {len(devs)} (set xla_force_host_platform_device_count)"
            )
        self.mesh = Mesh(np.array(devs), (AXIS,))

        if self.use_mg:
            self.levels = dmg.build_dist_levels(prob, self.part, self.ndev)
            self.level_arrays = tuple(
                {"sa": l.sa, "mask": l.mask, "owned_gid": l.owned_gid}
                for l in self.levels
            )
            # AMG coarse hierarchy: assembled once host-side at u=0 state;
            # refreshed by refresh_amg() per Newton step for nonlinear runs
            self._amg = None
        self._build_step()

    def _pad_qdata(self, qd):
        nq, nelem, Q3 = qd.shape
        out = np.zeros((nq, self.part.ndev * self.part.nelem_max, Q3), qd.dtype)
        out[:, :nelem] = qd
        return np.moveaxis(
            out.reshape(nq, self.part.ndev, self.part.nelem_max, Q3), 1, 0
        )

    # -- host-side converters ------------------------------------------
    def to_owned(self, u_global: np.ndarray) -> jnp.ndarray:
        arr = scatter_global_to_owned(self.part, np.asarray(u_global))
        return jax.device_put(
            jnp.asarray(arr), NamedSharding(self.mesh, P(AXIS))
        )

    def to_global(self, owned) -> np.ndarray:
        return gather_owned_to_global(self.part, np.asarray(owned))

    # ------------------------------------------------------------------
    def refresh_amg(self, u_owned, load: float):
        """FormJacobian analog (misc.c:151-183), SPMD edition: the stash and
        the p=1 element matrices are computed ON DEVICE in a sharded step;
        only the small (nelem, 24, 24) element-matrix blocks come to the
        host, where the fixed-pattern CSR is assembled and the native AMG
        hierarchy refreshed (the coarse matrix is replicated, like the
        reference's effectively-global GAMG coarse solve)."""
        from ..ops.assembly import CSRAssembler
        from ..solve.amg import AMGPreconditioner

        prob = self.problem
        space0 = prob.spaces[0]
        if self._amg is None:
            self._assembler0 = CSRAssembler(
                space0.conn, space0.num_nodes,
                np.asarray(prob._level_mask(space0)),
            )
            self._amg = AMGPreconditioner(self.dtype)
        bc = self.to_owned(prob.bcs.values(
            prob._coords, load).T.astype(np.asarray(u_owned).dtype))
        em_sh = np.asarray(self._emats(u_owned, bc, self.F_sh * load,
                                       self.mask_sh, self.qdata_sh, self.sa))
        nd = em_sh.shape[-1]
        valid = self.part.elem_valid.reshape(-1)
        em = em_sh.reshape(-1, nd, nd)[valid]      # global element order
        self._amg.setup(self._assembler0.assemble(em))
        return self._amg.data

    # ------------------------------------------------------------------
    def _build_step(self):
        sa = self.sa
        prob = self.problem
        model = self.model
        phys = self.phys
        cfg = prob.config
        ksp_rtol = cfg.ksp_rtol or 1e-10
        ksp_max_it = min(cfg.ksp_max_it, 10_000)
        fine_basis = prob.factory.fine.basis
        use_mg = self.use_mg
        composite = self.composite
        Q3f = fine_basis.Q3

        # Per-level single-GEMM gradient operators in PLAIN LATTICE column
        # order (the shard-local conn is lattice-ordered): the same
        # structured hot path as the serial pipeline (ops/structured.py),
        # run per shard like the reference's per-rank CeedOperators
        # (src/matops.c:26-60). Device arrays travel as step args.
        if use_mg:
            levels_static = self.levels
            nlev = len(levels_static)
            bases = [l.basis for l in levels_static]
        else:
            nlev = 1
            bases = [fine_basis]
        self._sgrads = tuple(
            grad_gemm_matrices(b, np.arange(b.P3), self.dtype) for b in bases
        )

        def rows_residual(local, sa_, qd, sk):
            """Single-GEMM residual pipeline on a shard's local E-rows."""
            Kg, KgT = sk
            due = dist.gather_node_rows(local, sa_) @ Kg
            du = Mat3([due[:, k * Q3f:(k + 1) * Q3f] for k in range(9)])
            dv, stash = model.residual_planes(du, qd, phys)
            ve = jnp.concatenate(dv.m, axis=1) @ KgT
            return dist.scatter_node_rows(ve, sa_), stash

        def rows_jacobian(local, sa_, qd, stash, sk, planes, Q3=None):
            Kg, KgT = sk
            Q3 = Q3 or Q3f
            due = dist.gather_node_rows(local, sa_) @ Kg
            ddu = Mat3([due[:, k * Q3:(k + 1) * Q3] for k in range(9)])
            ddv = planes(ddu, qd, stash, phys)
            ve = jnp.concatenate(ddv.m, axis=1) @ KgT
            return dist.scatter_node_rows(ve, sa_)

        def elem_diagonal(qdata, stash, basis, jac_qf):
            BB = jnp.einsum("aqp,bqp->qpab", basis.grad, basis.grad)
            nelem, Q3 = qdata.shape[1], qdata.shape[2]
            diag_e = jnp.zeros((3, nelem, basis.P3), self.dtype)
            for c2 in range(3):
                for d2 in range(3):
                    du = jnp.zeros((3, 3, nelem, Q3), self.dtype)
                    du = du.at[c2, d2].set(1.0)
                    ddv = jac_qf(du, qdata, stash, phys)
                    contrib = jnp.einsum("qpa,aeq->ep", BB[..., d2], ddv[c2])
                    diag_e = diag_e.at[c2].add(contrib)
            return diag_e

        if composite:
            pbasis = prob.pfactory.fine.basis          # P -> 1 reduced
            Q3p_ = pbasis.Q3                           # = 1 + qextra cubed

        def body(u, bc_vals, F, mask, qdata, qdata_p, sa, lvls, amg_data,
                 sgrads, sgrad_p):
            qd = qdata[0]
            qdp = qdata_p[0] if composite else None
            msk = mask

            def residual(uo):
                u_in = jnp.where(msk, bc_vals, uo)
                local = dist.g2l(u_in, sa)
                acc, stash = rows_residual(local, sa, qd, sgrads[-1])
                if composite:
                    Kgp, KgTp = sgrad_p
                    due = dist.gather_node_rows(local, sa) @ Kgp
                    dup = Mat3([due[:, k * Q3p_:(k + 1) * Q3p_]
                                for k in range(9)])
                    dvp, stash_p = model.pressure_residual_planes(
                        dup, qdp, phys)
                    vep = jnp.concatenate(dvp.m, axis=1) @ KgTp
                    acc = acc + dist.scatter_node_rows(vep, sa)
                    stash = (stash, stash_p)
                r = dist.l2g_add(acc, sa)
                return jnp.where(msk, 0.0, r - F), stash

            def jac_apply(v, stash):
                v_in = jnp.where(msk, 0.0, v)
                local = dist.g2l(v_in, sa)
                if composite:
                    acc = rows_jacobian(local, sa, qd, stash[0], sgrads[-1],
                                        model.jacobian_planes)
                    acc = acc + rows_jacobian(
                        local, sa, qdp, stash[1], sgrad_p,
                        model.pressure_jacobian_planes, Q3=Q3p_)
                else:
                    acc = rows_jacobian(local, sa, qd, stash, sgrads[-1],
                                        model.jacobian_planes)
                jv = dist.l2g_add(acc, sa)
                return jnp.where(msk, 0.0, jv)

            G, stash = residual(u)

            if not use_mg:
                if composite:
                    diag_e = elem_diagonal(qd, stash[0], fine_basis,
                                           model.jacobian_qf)
                    diag_p = elem_diagonal(qdp, stash[1], pbasis,
                                           model.pressure_jacobian_qf)
                    diag_e = diag_e + diag_p
                else:
                    diag_e = elem_diagonal(qd, stash, fine_basis,
                                           model.jacobian_qf)
                dacc = dist.scatter_elements(diag_e, sa)
                diag = dist.l2g_add(dacc, sa)
                diag = jnp.where(msk, 1.0, diag)
                diag = jnp.where(diag == 0.0, 1.0, diag)
                dinv = 1.0 / diag
                M = lambda r: dinv * r            # noqa: E731
            else:
                # --- per-level distributed machinery -------------------
                def make_lvl_apply(l):
                    def A(v, lv=lvls[l]):
                        v_in = jnp.where(dist._blk(lv["mask"]), 0.0,
                                         dist._blk(v))[None]
                        local = dist.g2l(v_in, lv["sa"])
                        jv = dist.l2g_add(
                            rows_jacobian(local, lv["sa"], qd, stash,
                                          sgrads[l], model.jacobian_planes),
                            lv["sa"])
                        return jnp.where(lv["mask"], 0.0, jv)

                    return A

                lvl_apply = [make_lvl_apply(l) for l in range(nlev)]
                dinvs, bounds, inv_mults = [], [], [None]
                for l in range(nlev):
                    lv = lvls[l]
                    basis = levels_static[l].basis
                    diag_e = elem_diagonal(qd, stash, basis,
                                           model.jacobian_qf)
                    dacc = dist.scatter_elements(diag_e, lv["sa"])
                    diag = dist.l2g_add(dacc, lv["sa"])
                    diag = jnp.where(lv["mask"], 1.0, diag)
                    diag = jnp.where(diag == 0.0, 1.0, diag)
                    dinvs.append(1.0 / diag)
                    valid = (~dist._blk(lv["mask"]))[None] & \
                        dist._blk(lv["sa"].owned_valid)[None, None, :]
                    lo, hi = dmg.estimate_eigs_dist(
                        lvl_apply[l], dinvs[l], diag.shape, diag.dtype,
                        valid=valid,
                    )
                    bounds.append((lo, hi))
                    if l > 0:
                        ones = jnp.ones(
                            (3,) + tuple(dist._blk(lv["sa"].conn_local).shape),
                            self.dtype,
                        )
                        acc = dist.scatter_elements(ones, lv["sa"])
                        mult = dist.l2g_add(acc, lv["sa"])
                        inv_mults.append(
                            1.0 / jnp.where(mult == 0, 1.0, mult)
                        )

                def prolong_l(l, uc):
                    c2f = levels_static[l].c2f
                    local_c = dist.g2l(uc, lvls[l - 1]["sa"])
                    ue = dist.gather_elements(local_c, lvls[l - 1]["sa"])
                    fe = c2f.apply_interp(ue)
                    acc = dist.scatter_elements(fe, lvls[l]["sa"])
                    out = dist.l2g_add(acc, lvls[l]["sa"]) * inv_mults[l]
                    return jnp.where(lvls[l]["mask"], 0.0, out)

                def restrict_l(l, uf):
                    c2f = levels_static[l].c2f
                    local_f = dist.g2l(uf * inv_mults[l], lvls[l]["sa"])
                    fe = dist.gather_elements(local_f, lvls[l]["sa"])
                    ce = c2f.apply_interp_T(fe)
                    acc = dist.scatter_elements(ce, lvls[l - 1]["sa"])
                    out = dist.l2g_add(acc, lvls[l - 1]["sa"])
                    return jnp.where(lvls[l - 1]["mask"], 0.0, out)

                def coarse_solve(b0):
                    if amg_data is None:
                        return dmg.chebyshev_dist(
                            lvl_apply[0], b0, dinvs[0],
                            bounds[0][0], bounds[0][1], 30,
                        )
                    g = dmg.owned_to_replicated_global(
                        b0, lvls[0]["owned_gid"],
                        levels_static[0].num_nodes,
                    )
                    xf = self._amg.apply(g.T.reshape(-1), amg_data)
                    xg = xf.reshape(-1, 3).T
                    out = dmg.replicated_global_to_owned(
                        xg, lvls[0]["owned_gid"]
                    )
                    return jnp.where(lvls[0]["mask"], 0.0, out)

                def vcycle(bf):
                    bs = [None] * nlev
                    xs = [None] * nlev
                    bs[-1] = bf
                    for l in range(nlev - 1, 0, -1):
                        xs[l] = dmg.chebyshev_dist(
                            lvl_apply[l], bs[l], dinvs[l],
                            bounds[l][0], bounds[l][1], cfg.smooth_its,
                        )
                        r = bs[l] - lvl_apply[l](xs[l])
                        bs[l - 1] = restrict_l(l, r)
                    xs[0] = coarse_solve(bs[0])
                    for l in range(1, nlev):
                        x = xs[l] + prolong_l(l, xs[l - 1])
                        r = bs[l] - lvl_apply[l](x)
                        dx = dmg.chebyshev_dist(
                            lvl_apply[l], r, dinvs[l],
                            bounds[l][0], bounds[l][1], cfg.smooth_its,
                        )
                        xs[l] = x + dx
                    return xs[-1]

                M = vcycle

            # --- PCG (natural norm, distributed dots) ------------------
            b = -G
            x = jnp.zeros_like(b)
            r = b
            z = M(r)
            rz = dist.ddot(r, z)
            tol = jnp.sqrt(jnp.abs(rz)) * ksp_rtol

            def cond(s):
                x, r, z, p, rz, it, ok = s
                return ok & (jnp.sqrt(jnp.abs(rz)) > tol) & (it < ksp_max_it)

            def bodyf(s):
                x, r, z, p, rz, it, ok = s
                Ap = jac_apply(p, stash)
                pAp = dist.ddot(p, Ap)
                good = pAp > 0        # KSP_DIVERGED_INDEFINITE_MAT analog
                alpha = jnp.where(good, rz / pAp, 0.0)
                x = x + alpha * p
                r = r - alpha * Ap
                z = M(r)
                rz2 = dist.ddot(r, z)
                p = z + (rz2 / rz) * p
                return (x, r, z, p, rz2, it + 1, good)

            x, r, z, p, rz, iters, _ok = jax.lax.while_loop(
                cond, bodyf, (x, r, z, z, rz, jnp.int32(0), jnp.bool_(True))
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
        lvls_spec = spec if self.use_mg else None
        qdp_spec = spec if composite else None
        sgp_spec = P() if composite else None
        in_specs = (spec, spec, spec, spec, spec, qdp_spec, spec, lvls_spec,
                    P(), P(), sgp_spec)
        self._step = jax.jit(
            jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=in_specs,
                out_specs=(spec, P(), P(), P()),
            )
        )

        # --- sharded p=1 element-matrix step (AMG numeric refresh) -------
        if use_mg:
            from ..ops.assembly import make_element_matrices

            em_fn = make_element_matrices(
                model.jacobian_qf, phys, bases[0], self.dtype)

            def emats_body(u, bc_vals, F, mask, qdata, sa, sk):
                u_in = jnp.where(mask, bc_vals, u)
                local = dist.g2l(u_in, sa)
                _, stash = rows_residual(local, sa, qdata[0], sk)
                return em_fn(qdata[0], stash)[None]

            emats_sm = jax.jit(
                jax.shard_map(
                    emats_body,
                    mesh=self.mesh,
                    in_specs=(spec, spec, spec, spec, spec, spec, P()),
                    out_specs=spec,
                )
            )
            self._emats = lambda *a: emats_sm(*a, self._sgrads[-1])

    # ------------------------------------------------------------------
    def newton_step(self, u_owned, load_increment: float, amg_data=None):
        prob = self.problem
        bc = self.to_owned(prob.bcs.values(
            prob._coords, load_increment
        ).T.astype(np.asarray(u_owned).dtype))
        F = self.F_sh * load_increment
        lvls = self.level_arrays if self.use_mg else None
        return self._step(u_owned, bc, F, self.mask_sh, self.qdata_sh,
                          self.qdata_p_sh, self.sa, lvls, amg_data,
                          self._sgrads, self.sgrad_p)

    def solve(self, num_increments=None, max_newton=50, rtol=1e-8):
        """Full load-continuation solve; returns (u_global, info dict)."""
        cfg = self.problem.config
        n_inc = num_increments or cfg.num_increments
        u = self.to_owned(np.zeros((3, self.problem.fine_space.num_nodes)))
        total_ksp = 0
        total_newton = 0
        rnorm = None
        amg_data = None
        for inc in range(1, n_inc + 1):
            load = inc / n_inc
            rnorm_entry0 = None
            r_prev = None
            stalls = 0
            for _ in range(max_newton):
                if self.use_mg and (self.model.nonlinear or amg_data is None):
                    # FormJacobian analog: refresh the replicated AMG coarse
                    # hierarchy from the on-device stash; linear problems
                    # assemble exactly once (problem.py does the same).
                    amg_data = self.refresh_amg(u, load)
                u, rnorm_in, rnorm, iters = self.newton_step(
                    u, load, amg_data=amg_data
                )
                total_ksp += int(iters)
                total_newton += 1
                if rnorm_entry0 is None:
                    rnorm_entry0 = max(float(rnorm_in), 1e-300)
                r = float(rnorm)
                if r < 1e-50 or r < rtol * rnorm_entry0:
                    break
                # fp-noise-floor stagnation exit (see solve/newton.py)
                stalls = stalls + 1 if (r_prev is not None
                                        and r > 0.99 * r_prev) else 0
                r_prev = r
                if stalls >= 2:
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
