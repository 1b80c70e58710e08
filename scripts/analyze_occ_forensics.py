"""Round-5 occlusion forensics (VERDICT r4 #6 + #1 decomposition).

Reads the paired NeCo-on / NeCo-off / oracle-filter pairs.jsonl ledgers
plus the inlier_thr sweep dirs and prints markdown tables:

  1. per-pair forensics on the pairs where NeCo-on LOSES (EPE delta > 0):
     keep-rate, IR_pre -> IR, n_landmarks, EPE on/off
  2. the headroom decomposition: NeCo vs oracle-ceiling vs coverage
  3. the inlier_thr operating-point sweep (val-occ)

Usage:
  python scripts/analyze_occ_forensics.py \
      [--on snapshot/onchip_r5/lndp_occ_4cm/4DLoMatch-Occ.pairs.jsonl] \
      [--off snapshot/onchip_r5/lndp_occ_4cm_nn/4DLoMatch-Occ.pairs.jsonl] \
      [--oracle snapshot/onchip_r5/lndp_occ_oracle/4DLoMatch-Occ.pairs.jsonl] \
      [--sweep-glob 'snapshot/onchip_r5/thr_*/val-occ.pairs.jsonl']
"""
from __future__ import annotations

import argparse
import glob
import json
import os


def load(path: str) -> dict[str, dict]:
    rows = {}
    with open(path) as f:
        for ln in f:
            row = json.loads(ln)
            rows[row["name"]] = row
    return rows


def mean(rows, key):
    vals = [r[key] for r in rows if key in r]
    return sum(vals) / len(vals) if vals else float("nan")


def main():
    base = "snapshot/onchip_r5"
    ap = argparse.ArgumentParser()
    ap.add_argument("--on", default=f"{base}/lndp_occ_4cm/4DLoMatch-Occ.pairs.jsonl")
    ap.add_argument("--off", default=f"{base}/lndp_occ_4cm_nn/4DLoMatch-Occ.pairs.jsonl")
    ap.add_argument("--oracle",
                    default=f"{base}/lndp_occ_oracle/4DLoMatch-Occ.pairs.jsonl")
    ap.add_argument("--sweep-glob",
                    default=f"{base}/thr_*/val-occ.pairs.jsonl")
    args = ap.parse_args()

    on = load(args.on)
    off = load(args.off)
    names = sorted(set(on) & set(off))
    print(f"paired pairs: {len(names)}")

    # --- 1. losers ---
    losers = [n for n in names if on[n]["full-epe"] > off[n]["full-epe"]]
    wins = len(names) - len(losers)
    print(f"\nNeCo-on wins {wins}/{len(names)}; "
          f"{len(losers)} losers:\n")
    print("| pair | EPE on | EPE off | delta | keep% | IR_pre | IR_post | n_ldmk |")
    print("|---|---|---|---|---|---|---|---|")
    for n in sorted(losers, key=lambda n: off[n]["full-epe"] - on[n]["full-epe"]):
        r = on[n]
        keep = 100.0 * r["n_landmarks"] / max(r["n_matches_pre"], 1)
        print(f"| {n} | {r['full-epe']:.3f} | {off[n]['full-epe']:.3f} | "
              f"{r['full-epe'] - off[n]['full-epe']:+.3f} | {keep:.1f} | "
              f"{r['IR_pre']:.3f} | {r['IR']:.3f} | {int(r['n_landmarks'])} |")
    keep_all = [100.0 * on[n]["n_landmarks"] / max(on[n]["n_matches_pre"], 1)
                for n in names]
    keep_all.sort()
    print(f"\nkeep-rate over all pairs: min {keep_all[0]:.1f}% / "
          f"median {keep_all[len(keep_all) // 2]:.1f}% / max {keep_all[-1]:.1f}%")

    # --- 2. headroom decomposition ---
    if os.path.exists(args.oracle):
        orc = load(args.oracle)
        common = sorted(set(names) & set(orc))
        on_epe = mean([on[n] for n in common], "full-epe")
        off_epe = mean([off[n] for n in common], "full-epe")
        orc_epe = mean([orc[n] for n in common], "full-epe")
        print(f"\nheadroom decomposition over {len(common)} pairs "
              f"(full-EPE means):")
        print(f"  no filter        : {off_epe:.3f} cm")
        print(f"  NeCo filter      : {on_epe:.3f} cm")
        print(f"  GT-oracle filter : {orc_epe:.3f} cm")
        print(f"  -> NeCo's remaining headroom (on - oracle): "
              f"{on_epe - orc_epe:+.3f} cm")
        print(f"  -> coverage-bound floor (oracle itself)   : {orc_epe:.3f} cm")
        for key in ("occ-epe", "vis-epe", "IR", "n_landmarks"):
            print(f"  {key}: off {mean([off[n] for n in common], key):.3f} | "
                  f"on {mean([on[n] for n in common], key):.3f} | "
                  f"oracle {mean([orc[n] for n in common], key):.3f}")

    # --- 3. threshold sweep ---
    sweeps = sorted(glob.glob(args.sweep_glob))
    if sweeps:
        print("\ninlier_thr sweep (val-occ):\n")
        print("| thr | full-EPE | occ-EPE | IR | NRFMR | n_ldmk | keep% |")
        print("|---|---|---|---|---|---|---|")
        for path in sweeps:
            thr = path.split("thr_")[1].split("/")[0]
            rows = list(load(path).values())
            keep = 100.0 * mean(rows, "n_landmarks") / max(
                mean(rows, "n_matches_pre"), 1e-9)
            print(f"| {thr} | {mean(rows, 'full-epe'):.3f} | "
                  f"{mean(rows, 'occ-epe'):.3f} | {mean(rows, 'IR'):.3f} | "
                  f"{mean(rows, 'NRFMR'):.3f} | "
                  f"{mean(rows, 'n_landmarks'):.0f} | {keep:.1f} |")


if __name__ == "__main__":
    main()
