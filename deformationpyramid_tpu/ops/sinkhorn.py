"""Log-domain (unbalanced, debiased) Sinkhorn divergence on TPU.

Replaces the reference's geomloss ``SamplesLoss("sinkhorn", p=2, blur, reach)``
dependency (``/root/reference/model/registration.py:543-572``). Semantics:

* cost C(x,y) = ||x-y||^2 / 2  (geomloss p=2 convention),
* entropic blur: epsilon = blur^2,
* unbalanced marginal KL penalty rho = reach^2 (reach=None -> balanced),
* debiased divergence S(a,b) = OT(a,b) - (OT(a,a)+OT(b,b))/2.

Deviation from geomloss internals (documented, benchmark-level parity): a
fixed geometric epsilon-annealing schedule from the point-cloud diameter down
to blur^2 instead of geomloss's multiscale scaling loop. Everything is fully
differentiable jnp — the N^2 softmin matrices at eval sizes (2000 points) fit
on-chip and ride the VPU/MXU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _softmin(eps: Array, C: Array, f: Array) -> Array:
    """softmin_eps over columns: -eps * logsumexp((f - C)/eps) per row."""
    return -eps * jax.nn.logsumexp((f[None, :] - C) / eps, axis=1)


def _cost(x: Array, y: Array) -> Array:
    """C_ij = ||x_i - y_j||^2 / 2 (geomloss p=2)."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-1)
    d = x2 + y2[None, :] - 2.0 * jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    return 0.5 * jnp.maximum(d, 0.0)


def sinkhorn_potentials(x: Array, y: Array, blur: float, reach: float | None,
                        n_iters: int = 20) -> tuple[Array, Array]:
    """Symmetric-update sinkhorn with eps-annealing; returns dual (f, g)."""
    n, m = x.shape[0], y.shape[0]
    loga = jnp.full((n,), -jnp.log(n))
    logb = jnp.full((m,), -jnp.log(m))
    C = _cost(x, y)
    eps_target = blur ** 2
    diam2 = jnp.maximum(jnp.max(C), eps_target)

    # damping for unbalanced OT: lam = rho / (rho + eps)
    def damping(eps):
        if reach is None:
            return 1.0
        rho = reach ** 2
        return rho / (rho + eps)

    f = jnp.zeros((n,))
    g = jnp.zeros((m,))

    def body(i, fg):
        f, g = fg
        # geometric annealing from diameter^2 to blur^2
        frac = i / max(n_iters - 1, 1)
        eps = jnp.exp(jnp.log(diam2) * (1 - frac) + jnp.log(eps_target) * frac)
        lam = damping(eps)
        ft = lam * _softmin(eps, C + eps * logb[None, :] * 0.0, g + eps * logb)
        gt = lam * _softmin(eps, C.T + 0.0, f + eps * loga)
        # symmetric (averaged) updates for stability
        return 0.5 * (f + ft), 0.5 * (g + gt)

    f, g = jax.lax.fori_loop(0, n_iters, body, (f, g))
    # one final sharp update at target eps (standard debiasing practice)
    lam = damping(eps_target)
    f = lam * _softmin(eps_target, C, g + eps_target * logb)
    g = lam * _softmin(eps_target, C.T, f + eps_target * loga)
    return f, g


def _ot_value(x: Array, y: Array, blur: float, reach: float | None,
              n_iters: int) -> Array:
    """<a, f> + <b, g> under uniform weights (balanced); for unbalanced the
    rho-KL transform of the potentials (geomloss value convention)."""
    f, g = sinkhorn_potentials(x, y, blur, reach, n_iters)
    n, m = x.shape[0], y.shape[0]
    if reach is None:
        return jnp.mean(f) + jnp.mean(g)
    rho = reach ** 2
    # unbalanced value: rho * (<a, 1 - e^{-f/rho}> + <b, 1 - e^{-g/rho}>)
    return rho * (jnp.mean(1.0 - jnp.exp(-f / rho))
                  + jnp.mean(1.0 - jnp.exp(-g / rho)))


@functools.partial(jax.jit, static_argnames=("blur", "reach", "n_iters", "debias"))
def sinkhorn_divergence(x: Array, y: Array, blur: float = 0.1,
                        reach: float | None = 1.0, n_iters: int = 20,
                        debias: bool = True) -> Array:
    """Differentiable sinkhorn divergence S_eps(x, y) with uniform weights."""
    val = _ot_value(x, y, blur, reach, n_iters)
    if debias:
        val = val - 0.5 * (_ot_value(x, x, blur, reach, n_iters)
                           + _ot_value(y, y, blur, reach, n_iters))
    return val
