"""Checkpoint save/load for param/optimizer pytrees.

Capability parity with the reference's checkpoint policy (train.py:222-251
save_checkpoint, train.py:138-190 get_model): checkpoints carry
``{epoch, SROCC, model_state_dict[, pref_module_state_dict, optimizer]}``
with a best.pth/latest.pth naming policy, plus the pretraining gates that
drop ViT and/or DiffNet subtrees on load (train.py:163-177).

Storage: a single ``.npz`` per checkpoint — flattened pytree leaves keyed by
their tree path. Self-contained, fast on network filesystems, and directly
inspectable; orbax is unnecessary at this model scale (~44M params).
"""

from __future__ import annotations

import json
import os
import re
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

MODEL_STATE_DICT = "model_state_dict"
PREF_MODULE_STATE_DICT = "pref_module_state_dict"

_SEP = "|"  # path separator in flattened keys (not valid in our key names)


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    else:
        out[prefix.rstrip(_SEP)] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


def save_checkpoint(output_dir: str, filename: str, models: Dict[str, Dict],
                    epoch: int, srocc: float,
                    opt_state=None, extra_meta: Optional[Dict] = None) -> str:
    """Write a checkpoint. ``models`` maps state-dict name (MODEL_STATE_DICT,
    PREF_MODULE_STATE_DICT) -> param pytree."""
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, filename)

    flat: Dict[str, np.ndarray] = {}
    for model_name, tree in models.items():
        if tree is None:
            continue
        for k, v in _flatten(tree).items():
            flat[f"{model_name}{_SEP}{k}"] = v
    if opt_state is not None:
        leaves, treedef = jax.tree_util.tree_flatten(opt_state)
        for i, leaf in enumerate(leaves):
            flat[f"__opt__{_SEP}{i}"] = np.asarray(leaf)

    meta = {"epoch": int(epoch), "SROCC": float(srocc),
            "time": time.time(), **(extra_meta or {})}
    flat["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)

    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Read a checkpoint -> {meta, model trees by name, opt leaves}."""
    with np.load(path, allow_pickle=False) as npz:
        flat = {k: npz[k] for k in npz.files}
    meta = json.loads(bytes(flat.pop("__meta__", np.frombuffer(b"{}", np.uint8))).decode())

    models: Dict[str, Dict[str, np.ndarray]] = {}
    opt_leaves = {}
    for key, value in flat.items():
        name, rest = key.split(_SEP, 1)
        if name == "__opt__":
            opt_leaves[int(rest)] = value
        else:
            models.setdefault(name, {})[rest] = value

    out: Dict[str, Any] = {"epoch": meta.get("epoch", 0), "SROCC": meta.get("SROCC", -1.0),
                           "meta": meta}
    for name, sub in models.items():
        out[name] = _unflatten(sub)
    if opt_leaves:
        out["__opt_leaves__"] = [opt_leaves[i] for i in sorted(opt_leaves)]
    return out


def restore_opt_state(template_opt_state, leaves):
    """Rebuild an optimizer state pytree from stored leaves using a freshly
    initialized state of the same structure as the template."""
    flat_template, treedef = jax.tree_util.tree_flatten(template_opt_state)
    if len(flat_template) != len(leaves):
        raise ValueError("Optimizer state structure mismatch on restore.")
    leaves = [jnp.asarray(l).astype(t.dtype) if hasattr(t, "dtype") else l
              for t, l in zip(flat_template, leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def apply_pretraining_gates(model_state: Dict, allow_vit: bool = True,
                            allow_diffnet: bool = True, log=None) -> Dict:
    """Drop ViT and/or DiffNet+predictor subtrees from a loaded state dict
    (reference pretraining gates, train.py:163-177)."""
    state = dict(model_state)
    if not allow_vit:
        if log:
            log("Not loading transformer weights from checkpoint.")
        state.pop("vit", None)
    if not allow_diffnet:
        if log:
            log("Not loading diffnet weights from checkpoint.")
        state.pop("quality_decoder", None)
        state.pop("q_predictor", None)
        state.pop("diff_scale", None)
    return state


def merge_params(params: Dict, loaded: Dict, strict: bool = False, log=None,
                 stats: Optional[Dict[str, int]] = None,
                 _path: str = "") -> Dict:
    """Strict-then-relaxed state-dict merge (reference load_model,
    modules/utils.py:81-91): leaves present in ``loaded`` with matching shapes
    overwrite ``params``; mismatches warn (or raise when strict).

    ``stats`` (optional dict) accumulates ``merged`` / ``kept`` leaf counts
    so callers can detect a merge that silently matched nothing (e.g. a
    wrong-config checkpoint in the serving path)."""
    out = {}

    def _count(name):
        if stats is not None:
            stats[name] = stats.get(name, 0) + 1

    for key, value in params.items():
        path = f"{_path}{key}."
        if key not in loaded:
            if strict:
                raise KeyError(f"Missing checkpoint key: {path}")
            out[key] = value
            if stats is not None:
                n = (len(jax.tree_util.tree_leaves(value))
                     if isinstance(value, dict) else 1)
                stats["kept"] = stats.get("kept", 0) + n
            continue
        lv = loaded[key]
        if isinstance(value, dict):
            out[key] = merge_params(value, lv, strict=strict, log=log,
                                    stats=stats, _path=path)
        else:
            lv = jnp.asarray(lv)
            if lv.shape != jnp.shape(value):
                msg = f"Shape mismatch for {path}: {lv.shape} vs {jnp.shape(value)}"
                if strict:
                    raise ValueError(msg)
                if log:
                    log(f"[WARNING] {msg}; keeping initialized value.")
                out[key] = value
                _count("kept")
            else:
                out[key] = lv.astype(jnp.asarray(value).dtype)
                _count("merged")
    return out
