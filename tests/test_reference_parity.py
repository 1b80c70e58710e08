"""Numerical parity against the reference's own torch modules.

These tests import the reference implementation (read-only at
/root/reference) and compare outputs with identical weights/inputs. They
skip when the reference tree or torch is unavailable — they are a
development-time oracle, not a runtime dependency.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")

torch = pytest.importorskip("torch")
if REF not in sys.path:
    sys.path.insert(0, REF)


def _np(x):
    return x.detach().cpu().numpy()


def test_rotation_parity_all_formats():
    from model import rigid_body as ref

    from deformationpyramid_tpu.geometry import rotations as ours

    rng = np.random.default_rng(0)
    r3 = rng.normal(size=(32, 3)).astype(np.float32) * 0.7
    r4 = rng.normal(size=(32, 4)).astype(np.float32)
    r6 = rng.normal(size=(32, 6)).astype(np.float32)

    # euler
    got = np.asarray(ours.euler_to_SO3(jnp.array(r3)))
    want = _np(ref.euler_to_SO3(torch.from_numpy(r3)))
    assert np.allclose(got, want, atol=1e-5)

    # axis-angle via exp_so3 (reference normalizes outside)
    t = torch.from_numpy(r3)
    theta = torch.norm(t, dim=-1, keepdim=True)
    want = _np(ref.exp_so3(t / theta, theta))
    got = np.asarray(ours.axis_angle_to_SO3(jnp.array(r3)))
    assert np.allclose(got, want, atol=1e-5)

    # quaternion with sign-fixed normalization (reference nets.py:154-157)
    tq = torch.from_numpy(r4)
    s = (tq * tq).sum(1)
    qn = tq / ref._copysign(torch.sqrt(s), tq[:, 0])[:, None]
    want = _np(ref.quaternion_to_SO3(qn))
    got = np.asarray(ours.quaternion_to_SO3(ours.normalize_quaternion(jnp.array(r4))))
    assert np.allclose(got, want, atol=1e-4)

    # 6D
    want = _np(ref._6d_to_SO3(torch.from_numpy(r6)))
    got = np.asarray(ours.sixd_to_SO3(jnp.array(r6)))
    assert np.allclose(got, want, atol=1e-5)

    # exp_se3
    w = r3 / np.linalg.norm(r3, axis=-1, keepdims=True)
    v = rng.normal(size=(32, 3)).astype(np.float32)
    th = np.abs(rng.normal(size=(32, 1)).astype(np.float32))
    R_ref, t_ref = ref.exp_se3(torch.from_numpy(w), torch.from_numpy(v),
                               torch.from_numpy(th))
    R_got, t_got = ours.exp_se3(jnp.array(w), jnp.array(v), jnp.array(th))
    assert np.allclose(np.asarray(R_got), _np(R_ref), atol=1e-5)
    assert np.allclose(np.asarray(t_got), _np(t_ref), atol=1e-5)


@pytest.mark.parametrize("motion,fmt", [
    ("SE3", "axis_angle"), ("SE3", "euler"), ("SE3", "quaternion"),
    ("SE3", "6D"), ("Sim3", "euler"), ("sflow", "axis_angle"),
])
def test_ndplayer_forward_parity(motion, fmt):
    """Same weights -> same warp, reference NDPLayer vs our level_warp."""
    from model.nets import NDPLayer

    from deformationpyramid_tpu.models.pyramid import NDPConfig, level_warp

    depth, width, k0, m_level = 3, 32, -8, 2
    torch.manual_seed(0)
    layer = NDPLayer(depth=depth, width=width, k0=k0, m=m_level,
                     rotation_format=fmt, motion=motion,
                     nonrigidity_est=False).eval()

    # copy torch weights into our param layout
    cfg = NDPConfig(m=1, k0=k0, depth=depth, width=width,
                    rotation_format=fmt, motion=motion)
    p = {
        "input": {"w": jnp.array(_np(layer.input[0].weight).T),
                  "b": jnp.array(_np(layer.input[0].bias))},
        "hidden": {"w": jnp.array(np.stack(
            [_np(l.weight).T for l in layer.mlp.pts_linears])),
            "b": jnp.array(np.stack(
                [_np(l.bias) for l in layer.mlp.pts_linears]))},
        "trn": {"w": jnp.array(_np(layer.trn_branch.weight).T),
                "b": jnp.array(_np(layer.trn_branch.bias))},
    }
    if motion in ("SE3", "Sim3"):
        p["rot"] = {"w": jnp.array(_np(layer.rot_brach.weight).T),
                    "b": jnp.array(_np(layer.rot_brach.bias))}
    if motion == "Sim3":
        p["scale"] = {"w": jnp.array(_np(layer.s_branch.weight).T),
                      "b": jnp.array(_np(layer.s_branch.bias))}

    x = np.random.default_rng(1).normal(size=(64, 3)).astype(np.float32) * 0.4
    with torch.no_grad():
        want, _ = layer(torch.from_numpy(x))
    # our level index: freq = 2**(level+1+k0) must equal 2**(m_level+k0)
    got, _ = level_warp(p, jnp.array(x), m_level - 1, cfg)
    assert np.allclose(np.asarray(got), _np(want), atol=2e-5), \
        np.abs(np.asarray(got) - _np(want)).max()


def test_chamfer_parity_vs_torch_bruteforce():
    """Our chamfer == the reference formula computed with plain torch."""
    from deformationpyramid_tpu.ops.chamfer import truncated_chamfer

    rng = np.random.default_rng(2)
    x = rng.normal(size=(120, 3)).astype(np.float32)
    y = rng.normal(size=(150, 3)).astype(np.float32)
    tx, ty = torch.from_numpy(x), torch.from_numpy(y)
    d = ((tx[:, None] - ty[None]) ** 2).sum(-1)
    for trunc in (1e9, 1.0, 0.5):
        cham_x = d.min(1).values
        cham_y = d.min(0).values
        cham_x = torch.where(cham_x >= trunc, torch.zeros_like(cham_x), cham_x)
        cham_y = torch.where(cham_y >= trunc, torch.zeros_like(cham_y), cham_y)
        want = (cham_x.sqrt().sum() / len(x) + cham_y.sqrt().sum() / len(y)).item()
        got = float(truncated_chamfer(jnp.array(x), jnp.array(y), trunc=trunc))
        assert abs(got - want) < 1e-5, (trunc, got, want)


def test_nerfies_posenc_parity():
    from model.nets import Nerfies_Deformation

    from deformationpyramid_tpu.models.baselines import NerfiesConfig, nerfies_posenc

    torch.manual_seed(0)
    net = Nerfies_Deformation(depth=3, width=16, max_iter=100)
    cfg = NerfiesConfig(depth=3, width=16, max_iter=100)
    x = np.random.default_rng(3).normal(size=(20, 3)).astype(np.float32)
    for it in (0, 30, 99):
        want = _np(net.posenc(torch.from_numpy(x), it))
        got = np.asarray(nerfies_posenc(jnp.array(x), it, cfg))
        assert np.allclose(got, want, atol=1e-5), it
