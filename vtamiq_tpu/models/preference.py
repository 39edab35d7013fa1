"""Preference mapping for pairwise training.

Capability parity with the reference PreferenceModule
(modules/vtamiq/common.py:5-15) and the default sigmoid path
(train.py:297-301). Note the reference's ``nn.Parameter(torch.Tensor(weight))``
constructor is buggy for float input; the intended behavior (learnable scalar
scale on the quality difference, JOD-style init) is implemented here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_preference_params(weight: float = 6.0):
    """weight=6 approximately maps sigmoid outputs onto JOD-unit preferences
    (train_config.py:264-266)."""
    return {"p": jnp.asarray(weight, jnp.float32)}


def preference_forward(params, q1, q2):
    """P(prefer image 1) = sigmoid(p * (q2 - q1)); lower q = better quality."""
    return jax.nn.sigmoid(params["p"] * (q2 - q1)).reshape(-1)


def preference_sigmoid(q1, q2):
    """Parameter-free default: sigmoid(q1 - q2) (train.py:301)."""
    return jax.nn.sigmoid(q1 - q2).reshape(-1)
