"""Baseline deformation models: NSFP and Nerfies.

Reference parity:
* ``Neural_Prior`` (NSFP, ``/root/reference/model/nets.py:256-292``): plain
  9-layer MLP regressing scene flow.
* ``Nerfies_Deformation`` (``model/nets.py:187-253``): windowed multi-band
  positional encoding with a coarse-to-fine schedule, SE(3)-field warp, and
  per-point Jacobians for the elastic regularizer.

Both keep the torch default ``nn.Linear`` init (U(-1/sqrt(fan_in), ...)) —
neither reference class calls xavier reset.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..geometry import rotations as rot

Array = jax.Array


def _torch_linear_init(key: Array, fan_in: int, fan_out: int) -> dict[str, Array]:
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
    }


# ---------------------------------------------------------------------------
# NSFP (Neural Scene Flow Prior)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NSFPConfig:
    width: int = 128
    n_layers: int = 9  # 1 input + 7 hidden + 1 output (nets.py:262-273)
    act: str = "relu"


def init_nsfp_params(key: Array, cfg: NSFPConfig = NSFPConfig()) -> list[dict]:
    dims = [3] + [cfg.width] * (cfg.n_layers - 1) + [3]
    keys = jax.random.split(key, cfg.n_layers)
    return [_torch_linear_init(k, dims[i], dims[i + 1])
            for i, k in enumerate(keys)]


def nsfp_flow(params: list[dict], x: Array, cfg: NSFPConfig = NSFPConfig()) -> Array:
    """x [N, 3] -> flow [N, 3]; activation on all but the last layer."""
    act = jax.nn.relu if cfg.act == "relu" else jax.nn.sigmoid
    h = x
    for i, p in enumerate(params):
        h = h @ p["w"] + p["b"]
        if i < len(params) - 1:
            h = act(h)
    return h


# ---------------------------------------------------------------------------
# Nerfies deformation field
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NerfiesConfig:
    depth: int = 7
    width: int = 128
    m_bands: int = 6
    k0: int = -3
    max_iter: int = 5000

    @property
    def n_coarse(self) -> float:
        # sliding-window schedule constant N = 0.6 * max_iter (nets.py:203)
        return 0.6 * self.max_iter

    @property
    def dim_in(self) -> int:
        return self.m_bands * 6 + 3


def init_nerfies_params(key: Array, cfg: NerfiesConfig = NerfiesConfig()) -> dict:
    keys = jax.random.split(key, cfg.depth + 3)
    hidden = [_torch_linear_init(keys[i + 1], cfg.width, cfg.width)
              for i in range(cfg.depth - 1)]
    return {
        "input": _torch_linear_init(keys[0], cfg.dim_in, cfg.width),
        "hidden": hidden,
        "w": _torch_linear_init(keys[-2], cfg.width, 3),
        "v": _torch_linear_init(keys[-1], cfg.width, 3),
    }


def nerfies_posenc(pos: Array, it: Array, cfg: NerfiesConfig) -> Array:
    """Windowed multi-band encoding with schedule alpha = m*iter/N.

    Matches ``nets.py:218-240``: bands at 2**(j+k0) * pi with pi = 3.14 (the
    reference's literal), window w_a = (1 - cos(clamp(a-j, 0, 1) pi)) / 2,
    output [pos, sin/cos bands].
    """
    pi = 3.14
    j = jnp.arange(cfg.m_bands, dtype=jnp.float32)
    a = cfg.m_bands * jnp.asarray(it, jnp.float32) / cfg.n_coarse
    w_a = (1.0 - jnp.cos(jnp.clip(a - j, 0.0, 1.0) * pi)) / 2.0  # [m]
    mul = 2.0 ** (j + cfg.k0) * pi                                # [m]
    ang = pos[..., :, None] * mul                                  # [N, 3, m]
    enc = jnp.concatenate([
        jnp.sin(ang[..., 0, :]) * w_a, jnp.cos(ang[..., 0, :]) * w_a,
        jnp.sin(ang[..., 1, :]) * w_a, jnp.cos(ang[..., 1, :]) * w_a,
        jnp.sin(ang[..., 2, :]) * w_a, jnp.cos(ang[..., 2, :]) * w_a,
    ], axis=-1)
    return jnp.concatenate([pos, enc], axis=-1)


def nerfies_warp(params: dict, x: Array, it: Array,
                 cfg: NerfiesConfig = NerfiesConfig()) -> Array:
    """SE(3)-field warp (``nets.py:242-253``): per-point screw motion."""
    fea = nerfies_posenc(x, it, cfg)
    fea = jax.nn.relu(fea @ params["input"]["w"] + params["input"]["b"])
    for p in params["hidden"]:
        fea = jax.nn.relu(fea @ p["w"] + p["b"])
    w = fea @ params["w"]["w"] + params["w"]["b"]
    v = fea @ params["v"]["w"] + params["v"]["b"]
    theta = jnp.sqrt(jnp.maximum(jnp.sum(w * w, axis=-1, keepdims=True), 1e-12))
    w = w / theta
    v = v / theta
    R, t = rot.exp_se3(w, v, theta)
    return jnp.einsum("nij,nj->ni", R, x) + t[..., 0]


def nerfies_jacobian(params: dict, x: Array, it: Array,
                     cfg: NerfiesConfig = NerfiesConfig()) -> Array:
    """Per-point warp Jacobian [N, 3, 3].

    The reference differentiates the batch-sum (``nets.py:213-215``) which,
    because each output point depends only on its own input, equals the
    per-point Jacobian; here computed directly with vmapped forward-mode.
    """

    def warp_one(xi):
        return nerfies_warp(params, xi[None], it, cfg)[0]

    return jax.vmap(jax.jacfwd(warp_one))(x)
