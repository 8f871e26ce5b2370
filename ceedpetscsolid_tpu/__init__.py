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


def _enable_compilation_cache():
    """Persistent XLA compilation cache.

    On remote/tunneled TPU backends every jit compile pays a multi-second
    round trip (measured ~10 s each; problem setup triggers ~70 small
    compiles, i.e. ~10 min of pure compile latency per process). The
    on-disk cache makes repeat runs skip all of it. Opt out with
    CPSTPU_NO_CACHE=1."""
    import os

    if os.environ.get("CPSTPU_NO_CACHE"):
        return
    # CPU compiles are cheap and CPU AOT cache reloads spam feature-mismatch
    # warnings: cache accelerator backends only (checked WITHOUT initializing
    # a backend — this runs at import time)
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        return
    import jax

    if str(jax.config.jax_platforms or "").lower() == "cpu":
        return
    if jax.config.jax_compilation_cache_dir:
        return
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/ceedpetscsolid_tpu/xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass          # cache is an optimization, never a failure


_enable_compilation_cache()
