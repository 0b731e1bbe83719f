"""Per-task CaRA starting hyper-parameters for the FGVC suite.

The reference names FGVC in its README (``README.rst:48``) but ships
neither a loader nor a hyper-parameter table (SURVEY.md section 2.3) — the
VTAB table (``image_classification/vtab_config.py``) has 19 tuned rows,
FGVC has none.  These rows are therefore FRAMEWORK DEFAULTS, not reference
values: they follow the conventions of the published FGVC PEFT protocol
(VPT / NOAH: full train split, 100 epochs, AdamW + cosine, batch 64/
eval 256 — the same optimizer protocol as ``vit_cp.py:185-188``) with
CaRA-specific knobs set to the VTAB table's natural-image regime
(lambda-init ~N(1, small), moderate delta scale, weight-dropout 0.1; the
heavier-augmented full-split FGVC runs usually prefer a slightly larger
rank, hence the ``dim`` column).  A real-data sweep should treat every
column as tunable; ``cli/sweep.py --suite fgvc`` automates that.
"""

from __future__ import annotations

import dataclasses
from typing import Dict


@dataclasses.dataclass(frozen=True)
class FgvcHParams:
    init_mean: float
    init_std: float
    scale: float
    seed: int
    lr: float = 1e-3
    epochs: int = 100
    dim: int = 32
    weight_dropout: float = 0.1


# (init_mean, init_std, scale, seed, lr) per task.  Scales sit in the
# 1-10 band the VTAB natural-image tasks use; birds/dogs (fine pose
# variation) get the gentler end, cars/flowers (stronger texture cues)
# the stronger deltas.
_TABLE = {
    "cub2011":         (1.0, 0.02, 1.0, 42, 1e-3),
    "nabirds":         (1.0, 0.02, 1.0, 42, 1e-3),
    "oxford_flowers":  (1.0, 0.02, 10.0, 42, 1e-3),
    "stanford_dogs":   (1.2, 0.05, 1.0, 42, 5e-4),
    "stanford_cars":   (1.0, 0.0, 10.0, 42, 1e-3),
}

FGVC_HPARAMS: Dict[str, FgvcHParams] = {
    name: FgvcHParams(*vals) for name, vals in _TABLE.items()
}


def get_fgvc_hparams(task: str) -> FgvcHParams:
    return FGVC_HPARAMS[task]
