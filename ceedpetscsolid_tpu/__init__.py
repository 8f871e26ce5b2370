"""ceedpetscsolid_tpu — TPU-native matrix-free solid mechanics framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
CeedPetscSolid mini-app (libCEED + PETSc solid mechanics): steady-state
momentum balance on unstructured high-order hexahedral meshes with linear
elasticity, Neo-Hookean hyperelasticity at small and finite strain (plus a
nearly-incompressible finite-strain variant), solved matrix-free with
Newton-Krylov-p-multigrid.

Architecture (bottom up):
  mesh/      — box + Exodus-II hex meshes, per-degree FE spaces, face sets
  ops/       — quadrature, tensor-product bases, element gather/scatter,
               geometric qdata, the fused E-vector operator pipeline
  models/    — pointwise physics kernels (the libCEED "QFunction" analog),
               vectorized over quadrature-point batches
  solve/     — Newton + critical-point line search, PCG (natural norm),
               Chebyshev smoothing, p-multigrid, coarse solves
  parallel/  — element partitioning + halo exchange over a jax device Mesh
  post/      — strain energy, diagnostics, MMS error, VTU output

Everything on the compute path is functionally pure, statically shaped and
jit-compiled; f64 on CPU for verification, f32 (+f64 reductions) on TPU.
"""

__version__ = "0.1.0"
