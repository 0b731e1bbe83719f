"""Checkpointing: single-artifact model export + mid-training resume.

Reference semantics preserved (SURVEY.md section 5):

* "one file restores everything": the reference saves the **full**
  ``state_dict`` (frozen backbone + CP params + head) keyed on best val
  accuracy, deleting the previous best
  (``image_classification/vit_cp.py:63-66``), filename
  ``vit_{dataset}_{acc}_seed_{seed}``.  We keep the convention with ``.npz``.
* ``--evaluate=<path>`` restores that single artifact (``vit_cp.py:168-173``).

New capabilities the reference lacks:

* **adapter-only export** (CP factors + head — ~100KB instead of ~350MB),
* **mid-training resume** via orbax (step, trainable params, optimizer state
  — the reference never saves optimizer state, SURVEY.md section 5),
  good enough for preemptible TPU VMs.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# --- flat npz <-> nested pytree -------------------------------------------


def flatten_tree(tree, prefix="") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    elif tree is None:
        pass
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree


# --- single-artifact model checkpoints ------------------------------------


def save_model(
    path: str,
    params: Dict[str, Any],
    cara_params: Optional[Dict[str, Any]] = None,
    meta: Optional[Dict[str, Any]] = None,
) -> None:
    """Full-model single file (backbone + head [+ adapter])."""
    flat = flatten_tree({"params": params})
    if cara_params is not None:
        flat.update(flatten_tree({"cara": cara_params}))
    if meta is not None:
        flat["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def load_model(path: str) -> Tuple[Dict, Optional[Dict], Dict]:
    """Returns (params, cara_params_or_None, meta)."""
    z = np.load(path)
    flat = {k: z[k] for k in z.files if k != "__meta__"}
    meta = {}
    if "__meta__" in z.files:
        meta = json.loads(bytes(z["__meta__"].tolist()).decode())
    tree = unflatten_tree(flat)
    return tree.get("params", {}), tree.get("cara"), meta


def save_adapter(
    path: str,
    cara_params: Dict[str, Any],
    head: Optional[Dict[str, Any]] = None,
    meta: Optional[Dict[str, Any]] = None,
) -> None:
    """Adapter-only artifact: CP factors (+ classifier head)."""
    flat = flatten_tree({"cara": cara_params})
    if head is not None:
        flat.update(flatten_tree({"head": head}))
    if meta is not None:
        flat["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def is_adapter_checkpoint(path: str) -> bool:
    """True for adapter-only artifacts (a ``cara/`` subtree but no
    ``params/`` backbone)."""
    with np.load(path) as z:
        return (any(k.startswith("cara/") for k in z.files)
                and not any(k.startswith("params/") for k in z.files))


def load_adapter(path: str) -> Tuple[Dict, Optional[Dict], Dict]:
    z = np.load(path)
    flat = {k: z[k] for k in z.files if k != "__meta__"}
    meta = {}
    if "__meta__" in z.files:
        meta = json.loads(bytes(z["__meta__"].tolist()).decode())
    tree = unflatten_tree(flat)
    return tree.get("cara", {}), tree.get("head"), meta


def infer_cara_cfg(cara_params, meta, scale=None, cp_order=None):
    """Rebuild the :class:`CaraConfig` a loaded adapter tree was trained
    with, from the artifact meta (``loop.fit`` records
    ``dataclasses.asdict(cara_cfg)``).

    Handles both the plain factor tree and the MoE ``{"experts","router"}``
    tree (``models.moe``): rank comes from the (possibly expert-stacked)
    R1's last axis, the routing config from meta with the router shape as
    fallback.  Raises when the delta scale is neither recorded nor given —
    per-task scales span 0.1-100 (``vtab_config.py``) and a silent 1.0
    default would mis-apply the adapter.
    """
    from cara_tpu.config import CaraConfig
    from cara_tpu.models import adapter as adapter_lib
    from cara_tpu.models import bitfit as bitfit_lib
    from cara_tpu.models import ssf as ssf_lib
    from cara_tpu.models import vpt as vpt_lib
    from cara_tpu.models.fact import detect_method
    from cara_tpu.models.lora import is_lora_params

    moe = "router" in cara_params and "experts" in cara_params
    meta_method = str(meta.get("method", ""))
    if meta_method.startswith("vpt") or vpt_lib.is_vpt_params(cara_params):
        return CaraConfig(
            method=meta_method or vpt_lib.detect_method(cara_params),
            scale=1.0, weight_dropout=0.0,
            vpt_tokens=int(cara_params["prompts"].shape[1]))
    if meta_method == "ssf" or ssf_lib.is_ssf_params(cara_params):
        return CaraConfig(method="ssf", scale=1.0, weight_dropout=0.0)
    if meta_method == "bitfit" or bitfit_lib.is_bitfit_params(cara_params):
        return CaraConfig(method="bitfit", scale=1.0, weight_dropout=0.0)
    if (meta_method in ("adapter", "adaptformer")
            or adapter_lib.is_adapter_params(cara_params)):
        method = meta_method or adapter_lib.detect_method(cara_params)
        if scale is None:
            if "scale" in meta:
                scale = float(meta["scale"])
            elif method == "adapter":
                scale = 1.0  # Houlsby adapters are unscaled by definition
            else:
                raise ValueError(
                    "adaptformer checkpoint records no delta scale and "
                    "none was given — the parallel-branch scale (official "
                    "default 0.1) changes the forward; pass scale= "
                    "explicitly")
        return CaraConfig(
            method=method, scale=scale, weight_dropout=0.0,
            rank=int(cara_params["mlp_down"]["kernel"].shape[-1]),
            adapter_dropout=float(meta.get("adapter_dropout", 0.0)))
    fact = meta_method.startswith("fact") or (
        not moe and detect_method(cara_params) is not None)
    lora = meta_method == "lora" or (
        not moe and not fact and is_lora_params(cara_params))
    if scale is None:
        if "scale" not in meta:
            raise ValueError(
                "checkpoint records no delta scale and none was given; "
                "refusing to default to 1.0 (a wrong scale silently "
                "mis-applies the adapter)")
        scale = float(meta["scale"])
    if fact:
        method = meta.get("method") or detect_method(cara_params)
        return CaraConfig(
            method=method, scale=scale,
            rank=int(cara_params["U"].shape[-1]),
            fact_core_rank=(int(cara_params["C"].shape[0])
                            if "C" in cara_params else 0),
            weight_dropout=float(meta.get("weight_dropout", 0.0)),
            weight_dropout_impl=str(
                meta.get("weight_dropout_impl", "element")))
    if lora:
        return CaraConfig(
            method="lora", scale=scale,
            rank=int(cara_params["qkv"]["a"].shape[-1]),
            weight_dropout=float(meta.get("weight_dropout", 0.0)),
            weight_dropout_impl=str(
                meta.get("weight_dropout_impl", "element")))
    r1 = cara_params["experts"]["R1"] if moe else cara_params["R1"]
    kw = dict(
        rank=int(r1.shape[-1]), scale=scale,
        cp_order=int(cp_order if cp_order is not None
                     else meta.get("cp_order", 4)),
        weight_dropout=float(meta.get("weight_dropout", 0.1)))
    if moe:
        kw.update(
            moe_experts=int(meta.get(
                "moe_experts", cara_params["router"]["kernel"].shape[-1])),
            moe_top_k=int(meta.get("moe_top_k", 2)),
            moe_aux_coef=float(meta.get("moe_aux_coef", 0.01)),
            weight_dropout_impl=str(meta.get("weight_dropout_impl",
                                             "rank")))
    return CaraConfig(**kw)


class BestCheckpointKeeper:
    """Best-accuracy rotation with the reference filename convention
    (save new best, delete previous — ``vit_cp.py:61-66``).

    Writes happen on a background thread by default (``async_io=True``):
    the ~350 MB full-model ``np.savez`` costs seconds of otherwise-idle
    training-thread time per new best.  Callers pass HOST arrays
    (``loop.fit`` already ``jax.device_get``s before updating — the
    device->host gather has to be synchronous anyway, only the disk write
    overlaps).  ``wait()`` joins the in-flight write; ``update`` joins any
    previous write first, so rotation order is preserved and at most one
    write is ever in flight.
    """

    def __init__(self, out_dir: str, dataset: str, seed: int,
                 async_io: bool = True):
        self.out_dir = out_dir
        self.dataset = dataset
        self.seed = seed
        self.best_acc = 0.0
        self.best_path: Optional[str] = None
        self.async_io = async_io
        self._thread = None

    def wait(self) -> None:
        """Block until the in-flight background write (if any) lands."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def _write(self, new_path, params, cara_params, meta, old_path) -> None:
        save_model(new_path, params, cara_params, meta)
        if old_path and os.path.exists(old_path):
            os.remove(old_path)

    def update(self, acc: float, params, cara_params, meta=None) -> Optional[str]:
        if acc <= self.best_acc:
            return None
        self.wait()
        self.best_acc = acc
        new_path = os.path.join(
            self.out_dir,
            f"vit_{self.dataset}_{round(acc, 5)}_seed_{self.seed}.npz",
        )
        os.makedirs(self.out_dir, exist_ok=True)
        full_meta = {**(meta or {}), "acc": acc, "seed": self.seed}
        old_path = self.best_path
        self.best_path = new_path
        if self.async_io:
            import threading

            self._thread = threading.Thread(
                target=self._write,
                args=(new_path, params, cara_params, full_meta, old_path),
                daemon=True)
            self._thread.start()
        else:
            self._write(new_path, params, cara_params, full_meta, old_path)
        return new_path


# --- mid-training resume (orbax) ------------------------------------------


def save_train_state(ckpt_dir: str, step: int, state, extra=None,
                     keep_last: int = 3) -> None:
    """Orbax save of the resumable state (trainable + optimizer + step).

    Keeps only the newest ``keep_last`` snapshots: a 100-epoch run saving
    every N steps would otherwise accumulate hundreds of step dirs, and
    resume only ever reads the newest one (``latest_step``).  Older dirs
    are pruned AFTER the new save lands, so a crash mid-save never leaves
    the directory empty.  ``keep_last=0`` disables pruning."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    if extra is not None:
        with open(os.path.join(path, "extra.json"), "w") as f:
            json.dump(extra, f)
    if keep_last > 0:
        import shutil

        steps = sorted(
            int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
            if d.startswith("step_") and d.split("_")[1].isdigit())
        for old in steps[:-keep_last]:
            shutil.rmtree(
                os.path.join(ckpt_dir, f"step_{old:08d}"),
                ignore_errors=True)


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
        if d.startswith("step_")
    ]
    return max(steps) if steps else None


def restore_train_state(ckpt_dir: str, step: int, template):
    """Restore into the structure of ``template`` (from ``init_train_state``)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=jax.device_get(template))
    extra = None
    extra_path = os.path.join(path, "extra.json")
    if os.path.exists(extra_path):
        with open(extra_path) as f:
            extra = json.load(f)
    return restored, extra
