"""Full-config e2e parity oracle: reference torch loop vs our solver.

VERDICT r1 item 3: the shrunken-config oracle
(test_e2e_reference_parity.py) proves the loop shape; THIS test pins the
REAL NDP configuration (config/NDP.yaml: m=9, k0=-8, depth=3, width=128,
iters=500, samples=2000) on many synthetic pairs x seeds and asserts the
mean EPE gap is tight (<=2% relative).

Runtime: each reference torch run at the full config costs ~370 s on this
1-core CPU, so the default protocol (8 pairs x 2 seeds, symmetric) is
~100 min of ref time plus ours. It is gated behind RUN_FULL_PARITY=1 and
meant to be driven INCREMENTALLY via scripts/run_full_parity.py (one ref
cell per invocation, checkpointed JSONL ledger); running this test in one
piece only makes sense with PARITY_PAIRS/PARITY_SEEDS shrunk (e.g.
PARITY_PAIRS=2 PARITY_SEEDS=1 ~= 15 min). The measured result + paired
confidence interval is recorded in docs/PARITY.md.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent"),
    pytest.mark.skipif(os.environ.get("RUN_FULL_PARITY") != "1",
                       reason="set RUN_FULL_PARITY=1 (slow: ~100 min of "
                              "torch ref runs at the default protocol; "
                              "shrink via PARITY_PAIRS/PARITY_SEEDS or "
                              "drive incrementally with "
                              "scripts/run_full_parity.py)"),
]
torch = pytest.importorskip("torch")

N_PAIRS = int(os.environ.get("PARITY_PAIRS", "8"))
N_SEEDS = int(os.environ.get("PARITY_SEEDS", "2"))
# our side costs ~0.15 s/run on-chip vs ~370 s/run for the torch ref, so
# extra ours seeds are free statistical power: the paired estimator
# d_p = mean_s ours(p,s) - mean_s ref(p,s) stays valid with asymmetric
# seed counts and the ours-side noise term of var(d_p) shrinks as 1/S_ours
# (the round-5 ledger protocol: 16 pairs x 4 ref seeds x 16+ ours seeds,
# snapshot/full_parity_r5.jsonl, docs/PARITY.md)
N_SEEDS_OURS = int(os.environ.get("PARITY_SEEDS_OURS", str(N_SEEDS)))
N_PTS = int(os.environ.get("PARITY_POINTS", "2000"))
# VERDICT r3 weak #1: the gate must cover the PRODUCTION path — every
# shipped surface defaults the two-kernel fused iteration ON (on TPU), and
# the fused kernels measurably shift convergence. Default 1; PARITY_FUSED=0
# reproduces the r2/r3 unfused protocol.
FUSED = os.environ.get("PARITY_FUSED", "1") == "1"

FULL = dict(m=9, k0=-8, depth=3, width=128, iters=500, lr=0.01,
            samples=2000, max_break_count=15, break_threshold_ratio=0.001)


class edict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    __setattr__ = dict.__setitem__


def _reference_epe(src, tgt, flow_gt, seed):
    from test_e2e_reference_parity import _install_stubs

    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from model.registration import Registration

    torch.manual_seed(seed)
    cfg = edict(dict(FULL, device=torch.device("cpu"),
                     deformation_model="NDP", w_reg=0.0,
                     rotation_format="axis_angle", motion_type="SE3"))
    reg = Registration(cfg)
    reg.load_pcds(src.copy(), tgt.copy())
    warped, _, _ = reg.register(timer=None)
    return float(np.linalg.norm(
        (warped.detach().numpy() - src) - flow_gt, axis=1).mean())


def test_full_config_registration_parity():
    from deformationpyramid_tpu.data.synthetic import make_pair
    from deformationpyramid_tpu.models.pyramid import NDPConfig
    from deformationpyramid_tpu.solve.registration import SolverConfig, register_pair

    scfg = SolverConfig(
        pyramid=NDPConfig(m=FULL["m"], k0=FULL["k0"], depth=FULL["depth"],
                          width=FULL["width"]),
        iters=FULL["iters"], lr=FULL["lr"],
        max_break_count=FULL["max_break_count"],
        break_threshold_ratio=FULL["break_threshold_ratio"],
        samples=FULL["samples"], use_pallas=False,
        use_fused_iteration=FUSED)
    ours_jit = jax.jit(lambda k, s, t: register_pair(k, s, t, scfg))

    diffs, epe_ref, epe_ours, epe_init = [], [], [], []
    for p in range(N_PAIRS):
        src, tgt, flow_gt = make_pair(n=N_PTS, seed=p, deform=0.12)
        epe_init.append(np.linalg.norm(flow_gt, axis=1).mean())
        pr, po = [], []
        for s in range(N_SEEDS):
            pr.append(_reference_epe(src, tgt, flow_gt, seed=s))
        for s in range(N_SEEDS_OURS):
            warped, _ = ours_jit(jax.random.key(p * 100 + s),
                                 jnp.array(src), jnp.array(tgt))
            po.append(float(np.linalg.norm(
                (np.asarray(warped) - src) - flow_gt, axis=1).mean()))
        diffs.append(float(np.mean(po)) - float(np.mean(pr)))
        epe_ref += pr
        epe_ours += po

    mean_ref = float(np.mean(epe_ref))
    mean_ours = float(np.mean(epe_ours))
    mean_init = float(np.mean(epe_init))
    # PAIRED statistics: per-run EPE noise across seeds is ~10x any
    # systematic gap (measured: per-run spread 0.002-0.9 cm vs means
    # ~0.25 cm, snapshot/full_parity_r3.jsonl), so a grand-mean gap
    # threshold has no statistical power; pair per-cloud and bound the
    # mean difference by its own 95% t-CI plus a 2% systematic allowance.
    d = np.array(diffs)
    se = d.std(ddof=1) / np.sqrt(len(d)) if len(d) > 1 else 0.0
    t975 = {2: 12.71, 4: 3.182, 8: 2.365, 16: 2.131}.get(len(d), 2.365)
    ci95 = t975 * se
    print(f"\nfull-config parity: init EPE {mean_init*100:.3f} cm, "
          f"ref {mean_ref*100:.3f} cm, ours {mean_ours*100:.3f} cm, "
          f"paired diff {d.mean()*100:+.3f} +- {ci95*100:.3f} cm (95% CI) "
          f"over {len(epe_ref)}+{len(epe_ours)} runs")
    # both converge hard
    assert mean_ref < 0.35 * mean_init, (mean_init, mean_ref)
    assert mean_ours < 0.35 * mean_init, (mean_init, mean_ours)
    # metric-level parity: the paired difference must be consistent with
    # zero within noise + a 2% systematic allowance
    assert abs(d.mean()) <= ci95 + 0.02 * mean_ref, (
        d.mean(), ci95, mean_ref)
