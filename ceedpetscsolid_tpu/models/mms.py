"""Method-of-manufactured-solutions data (reference qfunctions/manufacturedTrue.h,
manufacturedForce.h, src/boundary.c BCMMS).

True solution (manufacturedTrue.h:41-54, boundary.c:40-42):
    u = ( e^{2x} sin 3y cos 4z,  e^{3y} sin 4z cos 2x,  e^{4z} sin 2x cos 3y ) / 1e8

The forcing is the analytic -div(sigma(u*)) for the reference's linear
elasticity constitutive law, transcribed from manufacturedForce.h:55-101
(already includes the 1e8 scaling; multiplied by w*detJ at quadrature).
"""

from __future__ import annotations

import jax.numpy as jnp


def true_solution(xyz: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) coords -> (..., 3) displacement."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    return jnp.stack(
        [
            jnp.exp(2 * x) * jnp.sin(3 * y) * jnp.cos(4 * z),
            jnp.exp(3 * y) * jnp.sin(4 * z) * jnp.cos(2 * x),
            jnp.exp(4 * z) * jnp.sin(2 * x) * jnp.cos(3 * y),
        ],
        axis=-1,
    ) / 1e8


def mms_force(xyz_cm: jnp.ndarray, wdetJ: jnp.ndarray, phys) -> jnp.ndarray:
    """(3, *batch) coordinate planes, (*batch,) wdetJ -> (3, *batch) weighted
    force planes (component-major device layout).

    Verbatim transcription of manufacturedForce.h:62-101.
    """
    x, y, z = xyz_cm[0], xyz_cm[1], xyz_cm[2]
    E, nu = phys.E, phys.nu
    den = (nu * 2.0 - 1.0) * (nu + 1.0)
    sin, cos, exp = jnp.sin, jnp.cos, jnp.exp

    f0 = (
        -(E * (cos(x * 2) * cos(y * 3) * exp(z * 4) * 4.0
               - cos(z * 4) * sin(y * 3) * exp(x * 2) * 8.0) * (nu - 0.5)) / den
        + (E * (cos(z * 4) * sin(y * 3) * exp(x * 2) * 4.5
                + sin(x * 2) * sin(z * 4) * exp(y * 3) * 3.0) * (nu - 0.5)) / den
        + (E * nu * cos(x * 2) * cos(y * 3) * exp(z * 4) * 8.0) / den
        - (E * nu * sin(x * 2) * sin(z * 4) * exp(y * 3) * 6.0) / den
        - (E * cos(z * 4) * sin(y * 3) * exp(x * 2) * (nu - 1.0) * 4.0) / den
    )
    f1 = (
        -(E * (cos(y * 3) * cos(z * 4) * exp(x * 2) * 3.0
               - cos(x * 2) * sin(z * 4) * exp(y * 3) * 2.0) * (nu - 0.5)) / den
        + (E * (cos(x * 2) * sin(z * 4) * exp(y * 3) * 8.0
                + sin(x * 2) * sin(y * 3) * exp(z * 4) * 6.0) * (nu - 0.5)) / den
        + (E * nu * cos(y * 3) * cos(z * 4) * exp(x * 2) * 6.0) / den
        - (E * nu * sin(x * 2) * sin(y * 3) * exp(z * 4) * 12.0) / den
        - (E * cos(x * 2) * sin(z * 4) * exp(y * 3) * (nu - 1.0) * 9.0) / den
    )
    f2 = (
        -(E * (cos(x * 2) * cos(z * 4) * exp(y * 3) * 6.0
               - cos(y * 3) * sin(x * 2) * exp(z * 4) * 4.5) * (nu - 0.5)) / den
        + (E * (cos(y * 3) * sin(x * 2) * exp(z * 4) * 2.0
                + sin(y * 3) * sin(z * 4) * exp(x * 2) * 4.0) * (nu - 0.5)) / den
        + (E * nu * cos(x * 2) * cos(z * 4) * exp(y * 3) * 12.0) / den
        - (E * nu * sin(y * 3) * sin(z * 4) * exp(x * 2) * 8.0) / den
        - (E * cos(y * 3) * sin(x * 2) * exp(z * 4) * (nu - 1.0) * 16.0) / den
    )
    return jnp.stack([f0, f1, f2], axis=0) * wdetJ / 1e8
