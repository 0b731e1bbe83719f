"""SSF: scale-and-shift feature adaptation as a first-class method.

SSF ("Scaling & Shifting Your Features: A New Baseline for Efficient
Model Tuning", Lian et al., NeurIPS 2022) inserts a per-channel affine
``y = gamma * x + beta`` after every operation of the frozen transformer
and trains only the (gamma, beta) pairs.  It is one of the published
PEFT baselines the CaRA paper compares against (the reference repo
implements only CaRA, ``src/cara/cara.py``); this module adds it with
the framework's uniform method contract — same training loop / freeze
semantics (``image_classification/vit_cp.py:176-182``), same checkpoint /
merge / export / serving stack.

Insertion points (the paper's "after every linear / LN" placement, over
this ViT's op list): patch-embed projection, per block {ln1, qkv, proj,
ln2, fc1, fc2}, and the final norm.  Parameter tree (block entries
layer-stacked so geometry checks are trivial):

    {"blocks": {"ln1": {"g": (L, E), "b": (L, E)}, "qkv": (L, 3E) x2,
                "proj": (L, E) x2, "ln2": (L, E) x2,
                "fc1": (L, hid) x2, "fc2": (L, E) x2},
     "embed": {"g": (E,), "b": (E,)}, "norm": {"g": (E,), "b": (E,)}}
                                                    [+ "ln_pre"]

Init follows the official SSF release: ``gamma ~ N(1, 0.02)``,
``beta ~ N(0, 0.02)`` — near- (not exactly) identity at step 0, which is
the published method's behavior.

TPU-native application (the SSF paper's own "re-parameterization"
observation, taken further): because every insertion point directly
follows a linear op, the affine folds EXACTLY into that op's weights —
``gamma*(Wx + b) + beta == (W*gamma)x + (gamma*b + beta)``, and for
LayerNorm ``gamma*(x_hat*s + b) + beta == x_hat*(s*gamma) +
(gamma*b + beta)``.  :func:`apply_ssf` performs that fold IN-TRACE on
the frozen pytree, so the forward runs the PLAIN path — fused Pallas
megakernels, GSPMD/TP sharding, pipeline stages all unchanged — while
gradients flow through the fold to (gamma, beta).  The extra cost is one
scaled copy of the block weights per step (~2 HBM round-trips of the
backbone, well under 1 ms at ViT-B on v5e).  For int8-quantized
backbones gamma folds into the per-output-channel dequant scale (the
codes ``q`` stay untouched), so SSF composes with w8/w8a8 serving too.
:func:`merge_ssf` reuses the same fold for merged export (exact — eval
SSF has no stochastic parts).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from cara_tpu.config import ViTConfig

LINEAR_SITES = ("qkv", "proj", "fc1", "fc2")
LN_SITES = ("ln1", "ln2")


def ssf_param_shapes(model: ViTConfig) -> Dict:
    """Nested dict of per-site channel widths ({"g", "b"} pairs)."""
    L, e, hid = model.depth, model.embed_dim, model.hidden_dim
    width = {"qkv": 3 * e, "proj": e, "fc1": hid, "fc2": e,
             "ln1": e, "ln2": e}
    shapes = {
        "blocks": {site: {"g": (L, w), "b": (L, w)}
                   for site, w in width.items()},
        "embed": {"g": (e,), "b": (e,)},
        "norm": {"g": (e,), "b": (e,)},
    }
    if model.ln_pre:
        shapes["ln_pre"] = {"g": (e,), "b": (e,)}
    return shapes


def init_ssf_params(
    rng: jax.Array, model: ViTConfig, cara, dtype=jnp.float32
) -> Dict:
    """Official-release init: gamma ~ N(1, .02), beta ~ N(0, .02)."""
    del cara  # uniform signature with the other method inits
    shapes = ssf_param_shapes(model)
    flat = []

    def collect(tree, path):
        if "g" in tree and "b" in tree and not isinstance(tree["g"], dict):
            flat.append((path, tree))
            return
        for k, v in tree.items():
            collect(v, path + (k,))

    collect(shapes, ())
    keys = jax.random.split(rng, 2 * len(flat))
    out: Dict = {}
    for i, (path, pair) in enumerate(flat):
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = {
            "g": 1.0 + 0.02 * jax.random.normal(keys[2 * i], pair["g"],
                                                dtype),
            "b": 0.02 * jax.random.normal(keys[2 * i + 1], pair["b"], dtype),
        }
    return out


def identity_ssf_params(model: ViTConfig, dtype=jnp.float32) -> Dict:
    """gamma = 1, beta = 0 everywhere — forward == frozen backbone exactly
    (test anchor; the published init is near-identity, not identity)."""

    def build(tree):
        if "g" in tree and "b" in tree and not isinstance(tree["g"], dict):
            return {"g": jnp.ones(tree["g"], dtype),
                    "b": jnp.zeros(tree["b"], dtype)}
        return {k: build(v) for k, v in tree.items()}

    return build(ssf_param_shapes(model))


def is_ssf_params(tree) -> bool:
    return (isinstance(tree, dict)
            and "blocks" in tree and "norm" in tree and "embed" in tree
            and isinstance(tree.get("norm"), dict)
            and set(tree["norm"]) == {"g", "b"}
            and isinstance(tree["blocks"], dict)
            and set(LINEAR_SITES + LN_SITES) <= set(tree["blocks"]))


def _fold_linear(site_params: Dict, g, b) -> Dict:
    """gamma*(Wx + bias) + beta == (W*gamma)x + (gamma*bias + beta).

    Handles int8-quantized kernels ({"q", "scale"} dicts, models/quant.py):
    gamma folds into the per-output-channel dequant scale.
    """
    kern = site_params["kernel"]
    bias = site_params["bias"]
    gb = g.astype(bias.dtype)
    new_bias = gb * bias + b.astype(bias.dtype)
    if isinstance(kern, dict):  # quantized: scale is (..., 1, out)
        kq = dict(kern)
        sc = kern["scale"]
        kq["scale"] = sc * g.astype(sc.dtype)[..., None, :]
        return {"kernel": kq, "bias": new_bias}
    return {"kernel": kern * g.astype(kern.dtype)[..., None, :],
            "bias": new_bias}


def apply_ssf(params: Dict, ssf: Dict) -> Dict:
    """Frozen pytree + (gamma, beta) tree -> folded pytree (in-trace).

    Shared by the differentiated forward (gradients reach gamma/beta
    through the fold) and merged export (:func:`merge_ssf`).
    """
    bp = dict(params["blocks"])
    sb = ssf["blocks"]
    for site in LINEAR_SITES:
        bp[site] = _fold_linear(bp[site], sb[site]["g"], sb[site]["b"])
    for ln in LN_SITES:
        g, b = sb[ln]["g"], sb[ln]["b"]
        sc, bi = bp[f"{ln}_scale"], bp[f"{ln}_bias"]
        bp[f"{ln}_scale"] = sc * g.astype(sc.dtype)
        bp[f"{ln}_bias"] = bi * g.astype(bi.dtype) + b.astype(bi.dtype)
    out = dict(params)
    out["blocks"] = bp
    out["embed"] = _fold_linear(params["embed"], ssf["embed"]["g"],
                                ssf["embed"]["b"])
    g, b = ssf["norm"]["g"], ssf["norm"]["b"]
    nrm = params["norm"]
    out["norm"] = {
        "scale": nrm["scale"] * g.astype(nrm["scale"].dtype),
        "bias": nrm["bias"] * g.astype(nrm["bias"].dtype)
        + b.astype(nrm["bias"].dtype),
    }
    if "ln_pre" in ssf:
        if "ln_pre" not in out:
            raise ValueError(
                "SSF tree carries ln_pre factors but the model has no "
                "ln_pre — was it trained with a different model config?")
        g, b = ssf["ln_pre"]["g"], ssf["ln_pre"]["b"]
        lp = params["ln_pre"]
        out["ln_pre"] = {
            "scale": lp["scale"] * g.astype(lp["scale"].dtype),
            "bias": lp["bias"] * g.astype(lp["bias"].dtype)
            + b.astype(lp["bias"].dtype),
        }
    return out


def merge_ssf(params: Dict, ssf: Dict, model: ViTConfig, cara) -> Dict:
    """Exact merged export — SSF folds into the adjacent linear/LN ops."""
    del model, cara
    return apply_ssf(params, ssf)
