"""Implicit vertical mixing.

The Omega-1 use of the batched tridiagonal solvers (base/TriDiagSolvers.h,
doc/design/OmegaV1GoverningEqns.md): backward-Euler vertical diffusion of
tracers and momentum per column, unconditionally stable for any dt*kappa.

For a field phi with interface diffusivity kappa_{k+1/2} on layers of
pseudo-thickness h_k:

    h_k phi_k^{n+1} - dt [ K_{k+1/2} (phi_{k+1}^{n+1} - phi_k^{n+1})
                         - K_{k-1/2} (phi_k^{n+1} - phi_{k-1}^{n+1}) ]
        = h_k phi_k^n,     K_{k+1/2} = kappa_{k+1/2} / dz_{k+1/2}

which is exactly the diffusion-form system (G, H) of
ops/tridiag.diffusion_solve with G_k = dt K_{k+1/2}, H_k = h_k — no-flux
at surface and bottom by construction.
"""

from __future__ import annotations

import jax.numpy as jnp

from omega_tpu.ops import tridiag


def interface_coupling(h, kappa_interface, dt):
    """G_k = dt * kappa_{k+1/2} / dz_{k+1/2}, G_{K-1} = 0.

    h: (..., K) layer thickness; kappa_interface: (..., K-1) or (K-1,)
    diffusivity at interior interfaces [m^2/s].
    """
    dz = 0.5 * (h[..., :-1] + h[..., 1:])
    g_int = dt * kappa_interface / dz
    return jnp.concatenate([g_int, jnp.zeros_like(h[..., :1])], axis=-1)


def implicit_vmix(h, kappa_interface, dt, field, method: str = "pcr"):
    """Backward-Euler vertical diffusion of `field` (..., K).

    Conserves the thickness-weighted column integral sum(h * phi) exactly
    (the matrix row sums equal h)."""
    g = interface_coupling(h, kappa_interface, dt)
    return tridiag.diffusion_solve(g, h, h * field, method=method)


def implicit_vmix_velocity(h_edge, kappa_interface, dt, u,
                           method: str = "pcr"):
    """Same solve for normal velocity on edges with edge thickness."""
    return implicit_vmix(h_edge, kappa_interface, dt, u, method=method)
