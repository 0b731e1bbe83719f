"""On-device kernel-knob autotuning cache.

The megakernel tile knobs (images per attention program ``attn_bb``,
m-rows per MLP program ``mlp_bm`` — ``models/vit.py``) default to values
swept by hand on one v5e chip.  Other TPU generations (v4's 128 MB VMEM
vs v5e's, v6e's larger MXU throughput ratio) and other geometries may
prefer different tiles.  The reference has no analog (its "kernels" are
cuBLAS calls, SURVEY.md section 2 native-code note) — this is
TPU-framework infrastructure: measure once per (device kind, geometry)
on the actual chip, persist, and let the in-model heuristics consult the
measurement before falling back to the hand-tuned default.

Flow:

* ``python -m cara_tpu.cli.tune --model ... --mode train-element`` sweeps
  the knob grid by rebuilding the production train/eval step per config
  on the live device and writes the winners here.
* ``models/vit.py`` ``_mlp_bm``/``_attn_bb`` call :func:`lookup` when
  their env override is ``auto``; a cache hit beats the heuristic, env
  vars (``CARA_MLP_BM``/``CARA_ATTN_BB``) beat everything.

Cache file: ``$CARA_TUNE_CACHE`` or ``~/.cache/cara_tpu/tune.json`` —
a flat ``{"<knob>|<key>": {"value": int, "ms": float, ...}}`` dict.
Lookups are trace-time only (knob functions run during jit tracing), so
the one-time JSON read is never on a step's hot path.

Shipped defaults: the package also carries ``tune_defaults.json`` — a
snapshot of winners measured on known hardware (currently one v5e chip),
so a fresh environment starts from measured tiles instead of the
heuristics.  Precedence: env override > the user's local cache > shipped
defaults > heuristic.  ``freeze_defaults()`` (or
``cli/tune.py --freeze-defaults``) re-snapshots the merged cache into
the package file after new sweeps.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Dict, Optional

_LOCK = threading.Lock()
_CACHE: Optional[Dict[str, dict]] = None
_CACHE_PATH: Optional[tuple] = None


def cache_path() -> str:
    return os.environ.get(
        "CARA_TUNE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "cara_tpu",
                     "tune.json"))


def defaults_path() -> str:
    """Packaged winners snapshot (see module docstring).  Set
    ``CARA_TUNE_DEFAULTS`` to another file, or to the empty string / "0"
    to disable shipped defaults entirely."""
    return os.environ.get(
        "CARA_TUNE_DEFAULTS",
        os.path.join(os.path.dirname(__file__), "tune_defaults.json"))


def device_kind() -> str:
    """Stable identifier for the tuning target, e.g. ``TPU v5 lite``.

    Falls back to the backend name when no device enumerates (so lookups
    on odd backends still key consistently instead of raising)."""
    import jax

    try:
        return jax.devices()[0].device_kind
    except Exception:
        return jax.default_backend()


def mlp_key(use_elem: bool, n: Optional[int], e: Optional[int],
            hidden: Optional[int], train: bool = True,
            b: Optional[int] = None, dev: Optional[str] = None) -> str:
    # train and eval compile different kernels (the VJP's saved residuals
    # change the VMEM budget, and the rank-dropout TRAIN path prefers a
    # different tile than eval), and the optimal tile shifts with the
    # trace-time batch, so winners are cached per (mode, batch) as well as
    # geometry.  Under data-parallel shard_map the per-shard batch differs
    # from the tuned global one — such lookups miss and fall back to the
    # heuristic (tune at your per-trace batch to cover them).
    dev = dev if dev is not None else device_kind()
    # The token axis is NORMALIZED to the sublane multiple: vit_forward
    # carries the stream padded (197 -> 200, _stream_pad_eligible) and
    # _mlp_bm keys on the runtime x.shape[1], while cli/tune records at
    # the nominal seq_len — rounding both means one entry serves either
    # caller (existing cache files are migrated, tools/migrate docs).
    if n is not None:
        n = -(-int(n) // 8) * 8
    return (f"{dev}|n={n}|e={e}|h={hidden}|elem={bool(use_elem)}"
            f"|train={bool(train)}|b={b}")


def attn_key(npad: int, e: int, train: bool = True,
             b: Optional[int] = None, elem: bool = True,
             dev: Optional[str] = None) -> str:
    # See mlp_key: separate winners per (mode, batch) and geometry.
    # ``elem`` distinguishes the element-weight-dropout train kernel from
    # the plain one (it is always False at eval — use_elem is train-gated).
    dev = dev if dev is not None else device_kind()
    return (f"{dev}|npad={npad}|e={e}|train={bool(train)}|b={b}"
            f"|elem={bool(elem)}")


def dense_impl_key(e: int, hidden: int, train: bool = True,
                   dev: Optional[str] = None) -> str:
    """Key for the PATH-LEVEL winner (``dense_impl``: 0 = xla, 1 = fused)
    per (device, geometry, mode).  Eval flips to XLA dense at ViT-H scale
    (benchmarks/RESULTS.md "ViT-H/14": 50.6 vs 55.1 ms — the megakernel
    m-tiles stop amortizing the weight streams) while every measured
    train geometry prefers the fused VJPs; ``resolve_dense_impl``
    consults this before its working-set heuristic."""
    dev = dev if dev is not None else device_kind()
    return f"{dev}|e={e}|h={hidden}|train={bool(train)}"


def _read(path: str) -> Dict[str, dict]:
    try:
        with open(path) as f:
            raw = json.load(f)
        if isinstance(raw, dict):
            return {k: v for k, v in raw.items() if isinstance(v, dict)}
    except (OSError, ValueError):
        pass
    return {}


def _load() -> Dict[str, dict]:
    global _CACHE, _CACHE_PATH
    path = cache_path()
    dpath = defaults_path()
    key = (path, dpath)
    with _LOCK:
        if _CACHE is not None and _CACHE_PATH == key:
            return _CACHE
        # Shipped defaults first; the user's local measurements override.
        data = _read(dpath) if dpath not in ("", "0") else {}
        data.update(_read(path))
        _CACHE, _CACHE_PATH = data, key
        return data


def reset() -> None:
    """Drop the in-memory cache (tests; or after an external write)."""
    global _CACHE, _CACHE_PATH
    with _LOCK:
        _CACHE, _CACHE_PATH = None, None


def lookup(knob: str, key: str) -> Optional[int]:
    rec = _load().get(f"{knob}|{key}")
    if rec is None:
        return None
    try:
        return int(rec["value"])
    except (KeyError, TypeError, ValueError):
        return None


def record(knob: str, key: str, value: int, extra: Optional[dict] = None
           ) -> None:
    """Persist a tuned winner (read-modify-write under the process lock;
    last writer wins across processes — tuning runs are manual/serial)."""
    path = cache_path()
    with _LOCK:
        data: Dict[str, dict] = {}
        try:
            with open(path) as f:
                data = json.load(f)
            if not isinstance(data, dict):
                data = {}
        except (OSError, ValueError):
            pass
        rec = {"value": int(value)}
        if extra:
            rec.update(extra)
        data[f"{knob}|{key}"] = rec
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
    reset()


def freeze_defaults(out: Optional[str] = None) -> str:
    """Snapshot the merged view (shipped defaults + local cache) into the
    package defaults file, making locally measured winners part of the
    framework for environments without this host's ``~/.cache``."""
    out = out or defaults_path()
    if out in ("", "0"):
        raise ValueError("shipped defaults are disabled "
                         "(CARA_TUNE_DEFAULTS=%r)" % out)
    data = dict(_load())
    tmp = out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    os.replace(tmp, out)
    reset()
    return out
