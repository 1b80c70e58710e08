"""Combine a matcher checkpoint with an existing NeCo head into one
landmark-model checkpoint (the {"matcher", "neco"} layout eval_supervised
loads).

NeCo consumes only the 6D match coordinates (match/outlier_rejection.py) —
not matcher features — so a fine-tuned matcher can be A/B'd under the
previously trained head without retraining it (VERDICT r4 #1 coverage
attack: isolate the matcher-coverage axis from the NeCo axis).

Usage: combine_landmark.py <matcher.npz> <landmark_with_neco.npz> <out.npz>
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # pure host-side weight surgery

from deformationpyramid_tpu.match.config_loader import landmark_config_from_yaml
from deformationpyramid_tpu.match.landmark import (LandmarkConfig,
                                                   init_landmark_model)
from deformationpyramid_tpu.utils.checkpoint import load_pytree, save_pytree
from deformationpyramid_tpu.utils.config import load_config


def main() -> None:
    matcher_path, neco_path, out_path = sys.argv[1:4]
    cfg = load_config("config/LNDP.yaml")
    ldmk_yaml = cfg.get("ldmk_config")
    if ldmk_yaml and os.path.exists(ldmk_yaml):
        lcfg = landmark_config_from_yaml(ldmk_yaml)
    else:
        lcfg = LandmarkConfig()
    template = init_landmark_model(jax.random.key(0), lcfg)
    matcher = load_pytree(matcher_path, template["matcher"])
    combined = load_pytree(neco_path, template)
    save_pytree(out_path, {"matcher": matcher, "neco": combined["neco"]})
    print(f"wrote {out_path} (matcher from {matcher_path}, "
          f"neco from {neco_path})")


if __name__ == "__main__":
    main()
