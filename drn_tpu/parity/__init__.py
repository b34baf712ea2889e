"""Reference-parity harness (SURVEY.md §8 step 9).

The BASELINE target is bit-parity R@1/R@5 against the reference PyTorch
checkpoint. The harness has three parts:

  * `torch_model.TorchDRNParity` — a PyTorch model architecturally identical
    to the flax `drn_tpu.models.DRN` (same ops, same SAME-padding rules,
    same masked-BiLSTM semantics). It defines the *conversion schema*: a
    reference checkpoint is first remapped onto this schema's state_dict
    names, after which `convert` + `compare` do the rest. (The reference
    mount was empty — SURVEY.md §0 — so the remapping table for the real
    checkpoint is left as the single TODO that needs the artifact.)
  * `convert.torch_state_to_flax` — state_dict → flax params pytree.
  * `compare.compare_models` — runs both on the same inputs and reports
    per-tensor max-abs-diff for final outputs and key intermediates.
"""

from drn_tpu.parity.convert import torch_state_to_flax  # noqa: F401
