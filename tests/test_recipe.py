"""Two-stage recipe END-TO-END demonstration gate (SURVEY.md §4.1-§4.2;
VERDICT r3 item 1): DRN's signature mechanism — stage-2 IoU-head
rescoring — must actually IMPROVE recall on a held-out val split, not
just have all its plumbing unit-tested.

Runs scripts/recipe_demo.py's harness at 1 epoch per stage on the
synthetic_recipe config (4096 train examples, held-out 4096-example val
split, width 128): enough signal that the direction is decisive (the
committed full-depth trail lives in logs/recipe_demo_r4.log).
"""

import importlib.util
import os

import pytest

_DEMO = os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "recipe_demo.py")


def _load_demo():
    spec = importlib.util.spec_from_file_location("recipe_demo", _DEMO)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_two_stage_recipe_improves_recall(tmp_path):
    demo = _load_demo()
    results = demo.run_demo(config="synthetic_recipe", stage1_epochs=1,
                            stage2_epochs=1, workdir=str(tmp_path),
                            stage2_iou_only=True, seed=0)

    s1 = demo.r1_mean(results["stage1"])
    s1_untrained = demo.r1_mean(results["stage1_rescore_untrained"])
    s2 = demo.r1_mean(results["stage2_rescore"])

    # The recipe's whole point: trained-IoU rescoring beats the stage-1
    # match-only scores on held-out data (observed margin ≈ +2.8 R@1
    # mean; assert half of it so CPU-codegen drift can't flake this).
    assert s2 > s1 + 1.0, (s1, s2, results)

    # …and beats rescoring with an UNTRAINED IoU head by a clear margin:
    # the trained head's gain is signal, not the (direction-unguaranteed)
    # jitter a random head injects into the ranking.
    assert s2 > s1_untrained + 1.0, (s1_untrained, s2)

    # Frozen grounding heads (iou_only): the stage-2 params without
    # rescoring reproduce stage 1 exactly — the gain IS the rescoring.
    for k, v in results["stage1"].items():
        assert abs(results["stage2_plain"][k] - v) < 1e-3, k

    # The improvement shows where rescoring should show: the strictest
    # IoU threshold (downweighting badly-regressed top candidates).
    assert (results["stage2_rescore"]["R@1,IoU=0.7"]
            > results["stage1"]["R@1,IoU=0.7"] + 1.0)
