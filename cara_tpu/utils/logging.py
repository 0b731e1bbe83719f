"""Observability: JSON-lines stdout metrics + optional wandb.

Keeps the reference's metric surface (SURVEY.md section 5): per-batch loss,
epoch, val_acc, and the method-specific lambda diagnostics (mean/std/hist of
``CP_R1``/``CP_R2``, ``image_classification/vit_cp.py:30-44``) — behind a
pluggable logger instead of a hard wandb dependency.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Dict, Optional

import numpy as np


class MetricLogger:
    """stdout JSON-lines logger; optionally tees to wandb if available."""

    def __init__(self, use_wandb: bool = False, wandb_kwargs: Optional[Dict] = None,
                 stream=None, enabled: bool = True):
        self.enabled = enabled
        self.stream = stream or sys.stdout
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore

                self._wandb = wandb.init(**(wandb_kwargs or {}))
            except Exception as exc:  # wandb not installed / offline
                print(f"[cara_tpu] wandb unavailable ({exc}); using stdout only",
                      file=sys.stderr)

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        if not self.enabled:
            return
        rec = {k: _to_scalar(v) for k, v in metrics.items()}
        if step is not None:
            rec["step"] = int(step)
        rec["ts"] = round(time.time(), 3)
        self.stream.write(json.dumps(rec) + "\n")
        self.stream.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def lambda_stats(self, cara_params, histogram: bool = False) -> Dict[str, Any]:
        """CP-weight diagnostics (vit_cp.py:30-44 equivalents): mean/std of
        the lambda vectors, plus optional 16-bin histograms (the stdout
        analog of the reference's wandb.Histogram telemetry)."""
        if "experts" in cara_params and "R1" not in cara_params:
            # MoE tree (models.moe): stats pool over all experts' lambdas.
            cara_params = cara_params["experts"]
        if "R1" not in cara_params:
            # LoRA trees have no CP weights — report the delta-factor
            # norms instead (the analogous drift diagnostic).
            out = {}
            for site, ab in sorted(cara_params.items()):
                if isinstance(ab, dict) and "b" in ab:
                    out[f"{site}_b_norm"] = float(
                        np.linalg.norm(np.asarray(ab["b"])))
            return out
        r1 = np.asarray(cara_params["R1"])
        r2 = np.asarray(cara_params["R2"])
        out: Dict[str, Any] = {
            "r1_mean": float(r1.mean()), "r1_std": float(r1.std()),
            "r2_mean": float(r2.mean()), "r2_std": float(r2.std()),
        }
        if histogram:
            for name, arr in (("r1", r1), ("r2", r2)):
                counts, edges = np.histogram(arr, bins=16)
                out[f"{name}_hist"] = {
                    "counts": counts.tolist(),
                    "min": float(edges[0]), "max": float(edges[-1]),
                }
            if self._wandb is not None:
                import wandb  # type: ignore

                self._wandb.log({"R1": wandb.Histogram(r1),
                                 "R2": wandb.Histogram(r2)})
        return out

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()


def _to_scalar(v):
    if isinstance(v, bool):  # float(True) == 1.0 would mangle JSON booleans
        return v
    try:
        return float(v)
    except (TypeError, ValueError):
        return v
