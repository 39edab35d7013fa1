"""Optimizer / LR-schedule factory + freeze masks.

Capability parity with the reference's get_optimizer_scheduler
(train.py:26-119: SGD/Adam/AdamW; lambda/cosine/multistep schedules with
per-epoch or per-batch stepping; grad-clip 1.0 at train.py:317-322) and the
fine-grained freeze machinery (backbone.py:62-106, vtamiq.py:81-92,
freeze_dicts in train_config.py:245-262).

TPU-first freeze design: instead of toggling requires_grad, a 0/1 mask pytree
multiplies gradients AND updates inside the jitted step — the mask is data,
so freeze/unfreeze at an epoch boundary does not retrace or rebuild optimizer
state (torch's lazy adam state for newly-unfrozen params is equivalent to our
moments having decayed to ~0 while masked).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def make_lr_schedule(global_config: Dict, steps_per_epoch: int) -> Callable:
    """LR schedule over optimizer-update count (one update per batch).

    With scheduler_step_per_batch=False the schedule advances once per epoch
    (reference semantics: scheduler.step() at epoch end, train.py:578)."""
    lr = global_config["optimizer_learning_rate"]
    per_batch = global_config["scheduler_step_per_batch"]
    num_epochs = global_config["num_epochs"]
    kind = global_config["scheduler_type"]

    num_steps = num_epochs * (steps_per_epoch if per_batch else 1)
    num_steps = max(1, num_steps)

    if kind == "lambda":
        goal = global_config["optimizer_learning_rate_decay_lambda_goal"]
        ratio = goal ** (1.0 / num_steps)
        base = lambda s: lr * (ratio ** s)
    elif kind == "cosine":
        alpha = global_config["optimizer_learning_rate_decay_cosine"]
        base = optax.cosine_decay_schedule(lr, decay_steps=num_steps, alpha=alpha)
    elif kind == "multistep":
        gamma = global_config["optimizer_learning_rate_decay_multistep"]
        milestones = list(global_config["optimizer_decay_after_n_epochs"])
        if per_batch:
            raise NotImplementedError("multistep scheduler does not support per-batch stepping.")

        def base(s):
            s = jnp.asarray(s)
            factor = jnp.prod(jnp.where(jnp.asarray(milestones) <= s, gamma, 1.0))
            return lr * factor
    else:
        raise ValueError(f"Unexpected scheduler_type [{kind}].")

    if per_batch:
        return lambda count: base(count)
    return lambda count: base(count // max(1, steps_per_epoch))


def make_optimizer(global_config: Dict, steps_per_epoch: int) -> optax.GradientTransformation:
    """clip-by-global-norm(1.0) -> {SGD | Adam | AdamW}(schedule)."""
    schedule = make_lr_schedule(global_config, steps_per_epoch)
    name = global_config["optimizer"]
    wd = global_config["optimizer_weight_decay"]

    if name == "SGD":
        opt = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(schedule, momentum=global_config["optimizer_sgd_momentum"],
                      nesterov=global_config["optimizer_sgd_nesterov"]),
        )
    elif name == "Adam":
        opt = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.adam(schedule),
        )
    elif name == "AdamW":
        opt = optax.adamw(schedule, weight_decay=wd)
    else:
        raise ValueError(f"Unexpected optimizer [{name}].")

    return optax.chain(optax.clip_by_global_norm(1.0), opt), schedule


# --------------------------------------------------------------------------
# freeze masks
# --------------------------------------------------------------------------

def _mask_subtree(tree, value: float):
    return jax.tree_util.tree_map(lambda _: value, tree)


def build_freeze_mask(params: Dict, freeze_state: bool,
                      freeze_dict: Optional[Dict] = None) -> Dict:
    """1.0 = trainable, 0.0 = frozen; mirrors VTAMIQ.set_freeze_state +
    VisionTransformerBackbone.set_freeze_state semantics.

    freeze_dict keys (all default True like freeze_dict_vtamiq/-_vit,
    train_config.py:245-262): freeze_dict_vit{freeze_encoder,
    freeze_encoder_adapters, freeze_encoder_layerscale, freeze_embeddings_patch,
    freeze_embeddings_cls_token, freeze_embeddings_extra_tokens,
    freeze_embeddings_pos, freeze_embeddings_scale}, freeze_quality_decoder,
    freeze_q_predictor.
    """
    if not freeze_state:
        return _mask_subtree(params, 1.0)

    fd = freeze_dict or {}
    fd_vit = fd.get("freeze_dict_vit", {})

    def flag(d, key, default=True):
        return d.get(key, default)

    mask = _mask_subtree(params, 1.0)

    vit_p = params.get("vit", {})
    vit_m = mask.get("vit", {})

    if flag(fd_vit, "freeze_encoder"):
        for lname, layer in vit_p.get("encoder", {}).get("layers", {}).items():
            lmask = _mask_subtree(layer, 0.0)
            # LayerScale and adapters stay trainable unless frozen explicitly
            if not flag(fd_vit, "freeze_encoder_layerscale", False):
                if "ls1" in layer:
                    lmask["ls1"] = jnp.asarray(1.0)
                    lmask["ls2"] = jnp.asarray(1.0)
            if not flag(fd_vit, "freeze_encoder_adapters", False):
                if "adapters" in layer:
                    lmask["adapters"] = _mask_subtree(layer["adapters"], 1.0)
            vit_m["encoder"]["layers"][lname] = lmask
        vit_m["encoder"]["final_ln"] = _mask_subtree(
            vit_p["encoder"]["final_ln"], 0.0)

    emb_p = vit_p.get("embeddings", {})
    emb_m = vit_m.get("embeddings", {})
    if flag(fd_vit, "freeze_embeddings_patch") and "patch" in emb_p:
        emb_m["patch"] = _mask_subtree(emb_p["patch"], 0.0)
    if flag(fd_vit, "freeze_embeddings_cls_token") and "cls_token" in emb_p:
        emb_m["cls_token"] = jnp.asarray(0.0)
    if flag(fd_vit, "freeze_embeddings_extra_tokens") and "extra_tokens" in emb_p:
        emb_m["extra_tokens"] = jnp.asarray(0.0)
    if flag(fd_vit, "freeze_embeddings_pos") and "pos_embeddings" in emb_p:
        emb_m["pos_embeddings"] = jnp.asarray(0.0)
    if flag(fd_vit, "freeze_embeddings_scale", False) and "scale_embeddings" in emb_p:
        emb_m["scale_embeddings"] = jnp.asarray(0.0)

    if flag(fd, "freeze_quality_decoder", False) and "quality_decoder" in params:
        mask["quality_decoder"] = _mask_subtree(params["quality_decoder"], 0.0)
    if flag(fd, "freeze_q_predictor", False) and "q_predictor" in params:
        mask["q_predictor"] = _mask_subtree(params["q_predictor"], 0.0)
    # NOTE: the reference threads freeze_w_predictor through freeze_dict_vtamiq
    # (train_config.py:261) but its set_freeze_state never reads it
    # (vtamiq.py:81-92) — the flag is dead there. We honor it (docs/PARITY.md).
    if flag(fd, "freeze_w_predictor", False) and "pref_module" in params:
        mask["pref_module"] = _mask_subtree(params["pref_module"], 0.0)

    return mask


def apply_mask(tree, mask):
    return jax.tree_util.tree_map(lambda t, m: t * m, tree, mask)


def count_trainable(mask) -> int:
    leaves = jax.tree_util.tree_leaves(mask)
    return int(sum(jnp.sum(jnp.asarray(m) > 0) for m in leaves))
