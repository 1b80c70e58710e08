"""Regenerate every fabricated data split under data/split/ (gitignored).

The canonical generation parameters live HERE so a wiped workspace can
rebuild byte-identical suites (numpy Generator streams are stable for a
fixed seed). Splits:

* 4DMatch-F    — 100 pairs, reference-like clustered sizes 1.5k-28k,
                 partial overlap 0.85 (the benchmark-shaped workload;
                 reference ``eval_nolearned.py:59`` split naming).
* 4DLoMatch-F  — 100 pairs, partial overlap 0.40 (the low-overlap
                 companion split, 4DLoMatch's <45% overlap regime;
                 UNIFORM dropout — a sparsity regime, kept for r2/r3
                 comparability).
* 4DLoMatch-Occ — 100 pairs, partial 0.40 with SPATIALLY-COHERENT culls
                 (half-space / contiguous patch, data/synthetic.py): the
                 true occlusion regime where landmark guidance must beat
                 plain chamfer NDP (VERDICT r3 #1).
* train / val  — 32 / 8 pairs at a single 6k size cluster (one compile
                 bucket) for the docs/LEARNING.md matcher+NeCo pipeline.
* train-occ / val-occ — same sizes, coherent occlusion at partial 0.55,
                 so the matcher/NeCo can be fine-tuned for the occluded
                 regime if plain weights don't transfer.
* train-occ-b / val-occ-b — fresh seeds at the EVAL regime (partial
                 0.40, coherent): NeCo's training split. NeCo must train
                 on pairs its frozen matcher has NOT been fine-tuned on —
                 on train-occ the matcher memorizes its own split
                 (pre-filter IR 0.996-0.998 at 4 cm) leaving no negative
                 labels, while on held-out pairs it emits the eval-like
                 3-20% outliers the balanced BCE needs (round-4 NeCo
                 diagnostic, docs/LEARNING.md).

Usage: python scripts/make_suites.py [root=data/split]
"""
import sys

from deformationpyramid_tpu.data.synthetic import write_4dmatch_suite


def main(root: str = "data/split") -> None:
    n = len(write_4dmatch_suite(root, "4DMatch-F"))
    n += len(write_4dmatch_suite(root, "4DLoMatch-F", partial=0.40, seed=1))
    n += len(write_4dmatch_suite(root, "4DLoMatch-Occ", partial=0.40, seed=2,
                                 occlusion="coherent"))
    n += len(write_4dmatch_suite(root, "train", n_pairs=32,
                                 size_clusters=(6000,), seed=7))
    n += len(write_4dmatch_suite(root, "val", n_pairs=8,
                                 size_clusters=(6000,), seed=71))
    n += len(write_4dmatch_suite(root, "train-occ", n_pairs=32,
                                 size_clusters=(6000,), seed=8,
                                 partial=0.55, occlusion="coherent"))
    n += len(write_4dmatch_suite(root, "val-occ", n_pairs=8,
                                 size_clusters=(6000,), seed=81,
                                 partial=0.55, occlusion="coherent"))
    n += len(write_4dmatch_suite(root, "train-occ-b", n_pairs=48,
                                 size_clusters=(6000,), seed=12,
                                 partial=0.40, occlusion="coherent"))
    n += len(write_4dmatch_suite(root, "val-occ-b", n_pairs=8,
                                 size_clusters=(6000,), seed=13,
                                 partial=0.40, occlusion="coherent"))
    # train-occ-c — matcher fine-tune split AT THE EVAL REGIME (partial
    # 0.40, coherent; VERDICT r4 weak #4: the r4 fine-tune ran at 0.55
    # while eval is 0.40). Fresh seed, disjoint from train-occ-b so NeCo's
    # training split stays held-out w.r.t. this matcher.
    n += len(write_4dmatch_suite(root, "train-occ-c", n_pairs=32,
                                 size_clusters=(6000,), seed=14,
                                 partial=0.40, occlusion="coherent"))
    # 3DMatch path (VERDICT r4 #4): rigid training pairs in the 4DMatch
    # layout (train_matcher consumes them unchanged) + a 3DMatch-format
    # rigid fragment suite for the RANSAC registration-recall eval
    n += len(write_4dmatch_suite(root, "train-3dm", n_pairs=32,
                                 size_clusters=(6000,), seed=21,
                                 partial=0.70, occlusion="coherent",
                                 rigid=True))
    n += len(write_4dmatch_suite(root, "val-3dm", n_pairs=8,
                                 size_clusters=(6000,), seed=22,
                                 partial=0.70, occlusion="coherent",
                                 rigid=True))
    from deformationpyramid_tpu.data.synthetic import (
        write_3dmatch_suite, write_3dmatch_train_suite)

    # train-3dm-b — 3DMatch fine-tune split AT THE EVAL REGIME (same
    # fragment generative process as the 3DMatch eval suite: double-sided
    # half-space crops, arbitrary-axis rotations 0.1-0.6 rad, noise 2 mm;
    # the original train-3dm's z-only <=0.2 rad single-crop regime left the
    # matcher OOD at eval — IR 0.120, recall 0.65). Seeds disjoint from the
    # eval suite's 23.
    n += len(write_3dmatch_train_suite(root, "train-3dm-b", n_pairs=32,
                                       seed=24))
    n += len(write_3dmatch_train_suite(root, "val-3dm-b", n_pairs=8,
                                       seed=25))
    # train-3dm-c — disjoint NeCo training split under the regime-matched
    # matcher (mirrors the occ path's train-occ-b/train-occ-c separation:
    # NeCo must see match distributions from pairs the matcher did NOT
    # train on, else its training inputs are unrealistically clean)
    n += len(write_3dmatch_train_suite(root, "train-3dm-c", n_pairs=32,
                                       seed=26))
    info = write_3dmatch_suite(root, "3DMatch", n_pairs=20, seed=23)
    print(f"wrote {n} pairs under {root}/ + 3DMatch info {info}")


if __name__ == "__main__":
    main(*sys.argv[1:])
