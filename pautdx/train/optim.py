"""Optimizers with param-group learning rates + schedules.

Reproduces the reference's training idiom (SURVEY.md §2.4/§5.6): AdamW with
per-module param groups (encoder lr / transformer 2-5x / heads 3x, e.g.
`SignalSequenceDetection/train.py`, `temp_dfine_over_improved.py:389-410`),
global-norm grad clip 1.0, cosine or reduce-on-plateau schedules, and the
3-phase freeze schedules of `train_hybrid.py:93-106` via zero-lr masks.

Plateau/freeze control without recompiles: the jitted step multiplies the
optimizer's update pytree by per-group scales passed as runtime scalars
(update scaling == lr scaling for AdamW, including its lr-multiplied decay).
"""

from __future__ import annotations

import fnmatch
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def label_params(params, group_patterns: Dict[str, Sequence[str]],
                 default: str = "default"):
    """Label each param leaf by the first glob group matching its path."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(path) -> str:
        return "/".join(getattr(k, "key", str(k)) for k in path)

    labels = {}
    for path, _ in flat:
        p = path_str(path)
        lab = default
        for name, patterns in group_patterns.items():
            if any(fnmatch.fnmatch(p, pat) or p.startswith(pat.rstrip("*"))
                   for pat in patterns):
                lab = name
                break
        labels[p] = lab

    def to_label(path, _):
        return labels[path_str(path)]

    return jax.tree_util.tree_map_with_path(to_label, params)


def make_optimizer(learning_rate: float = 6e-4,
                   weight_decay: float = 0.015,
                   clip_norm: float = 1.0,
                   schedule: Optional[Callable[[int], float]] = None,
                   group_lr_mults: Optional[Dict[str, float]] = None,
                   group_patterns: Optional[Dict[str, Sequence[str]]] = None,
                   params=None,
                   b1: float = 0.9, b2: float = 0.999) -> optax.GradientTransformation:
    """AdamW + clip, optionally with per-group lr multipliers.

    With ``group_lr_mults``, ``group_patterns`` and ``params`` are required
    to build the multi_transform labeling.
    """
    lr = schedule if schedule is not None else learning_rate

    def adamw(mult: float = 1.0):
        if callable(lr):
            group_lr = lambda step: lr(step) * mult  # noqa: E731
        else:
            group_lr = lr * mult
        return optax.adamw(group_lr, b1=b1, b2=b2, weight_decay=weight_decay)

    if group_lr_mults:
        assert params is not None and group_patterns is not None
        labels = label_params(params, group_patterns)
        transforms = {name: adamw(mult) for name, mult in group_lr_mults.items()}
        transforms.setdefault("default", adamw(1.0))
        opt = optax.multi_transform(transforms, labels)
    else:
        opt = adamw(1.0)
    return optax.chain(optax.clip_by_global_norm(clip_norm), opt)


def zero_frozen_grads(trainable) -> optax.GradientTransformation:
    """Zero frozen-leaf gradients BEFORE global-norm clipping.

    ``chain(clip_by_global_norm, multi_transform({...: set_to_zero}))``
    lets frozen-leaf gradients inflate the global norm and over-shrink
    the surviving updates (for the temporal v1 variant the frozen
    class/bbox-head grads can dominate the denominator). Zeroing first
    reproduces torch's ``requires_grad=False`` semantics, where frozen
    params never contribute to the clip norm.

    ``trainable``: a pytree matching the params, with bool leaves
    (True = trains) or string labels (``"frozen"`` = frozen).
    """
    def keep(m):
        return m is True or (isinstance(m, str) and m != "frozen")

    def update_fn(updates, state, params=None):
        del params
        z = jax.tree_util.tree_map(
            lambda g, m: g if keep(m) else jnp.zeros_like(g),
            updates, trainable)
        return z, state

    return optax.GradientTransformation(
        lambda params: optax.EmptyState(), update_fn)


def cosine_schedule(base_lr: float, total_steps: int,
                    warmup_steps: int = 0, final_scale: float = 0.01
                    ) -> Callable[[int], float]:
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0 if warmup_steps else base_lr,
        peak_value=base_lr,
        warmup_steps=warmup_steps,
        decay_steps=max(total_steps, 1),
        end_value=base_lr * final_scale,
    )


class ReduceLROnPlateau:
    """Host-side plateau controller -> an lr scale fed to the jitted step.

    Torch ``ReduceLROnPlateau`` parity (factor/patience/min_lr); the scale
    multiplies the optimizer's update pytree so no recompilation happens.
    """

    def __init__(self, factor: float = 0.5, patience: int = 3,
                 min_scale: float = 1e-3, mode: str = "min"):
        self.factor = factor
        self.patience = patience
        self.min_scale = min_scale
        self.mode = mode
        self.best: Optional[float] = None
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        improved = (self.best is None
                    or (metric < self.best if self.mode == "min"
                        else metric > self.best))
        if improved:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.bad_epochs = 0
        return self.scale


def scale_updates(updates, scale: jnp.ndarray):
    """Multiply an update pytree by a runtime scalar (lr scaling)."""
    return jax.tree_util.tree_map(lambda u: u * scale, updates)


def ema_update(ema_params, params, decay: float = 0.999):
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)
