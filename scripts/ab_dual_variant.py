"""A/B harness: dual-sweep kernel v1 ([M,3] columns) vs v2 (transpose-free).

Checks bit-parity of all four outputs on random clouds, then times a
fori_loop of back-to-back sweeps per variant (the solver calls the sweep
once per Adam iteration, so loop-of-sweeps is the faithful microbench).

Usage: python scripts/ab_dual_variant.py [N] [ITERS]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from deformationpyramid_tpu.ops.knn import nn_argmin_dual_pallas, nn_argmin_xla

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 400


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)

    # ---- correctness: v1 vs XLA reference (v2 is parked — VMEM-capped)
    o1 = jax.jit(lambda a, b: nn_argmin_dual_pallas(a, b, variant="v1"))(x, y)
    sq_ref, idx_ref = nn_argmin_xla(x, y)
    print("idx vs XLA mismatches:", int((np.asarray(idx_ref) != np.asarray(o1[1])).sum()))

    # v3/v4 (packed): indices may flip only on near-ties (v3 ~1.2e-4
    # relative mantissa truncation; v4 additionally the bf16x3 matmul's
    # ~1.5e-5-absolute rounding); returned distances are rebuilt exactly
    # from the gathers.
    for variant, tol in (("v3", 3e-4), ("v4", 1e-3), ("v4h", 3e-4)):
        o3 = jax.jit(
            lambda a, b, v=variant: nn_argmin_dual_pallas(a, b, variant=v)
        )(x, y)
        for nme, a, b, da, db in [("x2y", o1[1], o3[1], o1[0], o3[0]),
                                  ("y2x", o1[3], o3[3], o1[2], o3[2])]:
            a, b = np.asarray(a), np.asarray(b)
            da, db = np.asarray(da), np.asarray(db)
            flips = a != b
            rel = np.abs(db[flips] - da[flips]) / np.maximum(da[flips], 1e-30)
            print(f"{variant} {nme}: {int(flips.sum())} near-tie flips, "
                  f"max rel dist gap {rel.max() if flips.any() else 0.0:.2e}")
            assert not flips.any() or rel.max() < tol, \
                f"{variant} flipped a non-near-tie"
    print("parity OK")

    # ---- timing: loop-of-sweeps per variant
    def make(variant, tn):
        @jax.jit
        def run(x1, y1):
            def body(i, c):
                _, ix, _, iy = nn_argmin_dual_pallas(c, y1, tn=tn,
                                                     variant=variant)
                return c + 1e-12 * ix[:, None].astype(jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body, x1)
        return run

    for variant in ("v1", "v3", "v4", "v4h"):
        for tn in (512, 1024):
            f = make(variant, tn)
            try:
                np.asarray(f(x, y))  # compile + 1 run
            except Exception as e:
                print(f"{variant} tn={tn}: FAILED ({str(e)[:160]})",
                      flush=True)
                continue
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f(x, y))
                reps.append((time.perf_counter() - t0) / ITERS * 1e3)
            print(f"{variant} tn={tn}: {sorted(reps)[1]:.4f} ms/sweep "
                  f"(reps {' '.join(f'{r:.4f}' for r in reps)})", flush=True)


if __name__ == "__main__":
    main()
