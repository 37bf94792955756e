"""Canonical training recipes — the reference's hyperparameters as data.

One place for every training configuration the reference scatters across
its `train*.py` scripts (SURVEY.md §5.6): signal_length 320 (FPD 360),
seq_len 50, AdamW lr 6e-4-1e-3 / wd 0.01-0.015, clip 1.0, param-group
multipliers (encoder 1x / transformer 2-5x / heads 3x), cosine or
plateau schedules, thresholds 0.5 (signals) / 0.3 (D-FINE), and the
3-phase HybridModel freeze schedule (`train_hybrid.py:93-106`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

from pautdx.losses import (
    detection_loss, detection_position_loss, enhanced_position_loss,
    seq_detector_loss, two_stage_loss,
)


@dataclasses.dataclass(frozen=True)
class Recipe:
    """A named training configuration."""

    name: str
    learning_rate: float = 6e-4
    weight_decay: float = 0.015
    clip_norm: float = 1.0
    epochs: int = 20
    batch_size: int = 8
    seq_len: int = 50
    scheduler: str = "plateau"             # plateau | cosine
    plateau_patience: int = 3
    early_stop_patience: int = 5
    threshold: float = 0.5
    group_lr_mults: Optional[Dict[str, float]] = None
    group_patterns: Optional[Dict[str, Sequence[str]]] = None
    objective: str = "detection"

    def make_objective(self) -> Callable:
        return OBJECTIVES[self.objective]


def _obj_detection(out, batch):
    prob = out["prob"] if isinstance(out, dict) else out
    return detection_loss(prob, batch["labels"], batch.get("sample_mask"))


def _obj_detection_position(out, batch):
    return detection_position_loss(out, batch["labels"], batch["positions"],
                                   batch.get("sample_mask"))


def _obj_two_stage(out, batch):
    return two_stage_loss(out, batch["labels"], batch["positions"],
                          batch.get("sample_mask"))


def _obj_position_only(out, batch):
    loss, aux = enhanced_position_loss(out["positions"], batch["positions"],
                                       batch["labels"])
    return loss, aux


def _obj_seq_detector(out, batch):
    labels = batch["labels"].astype("int32") if hasattr(
        batch["labels"], "astype") else batch["labels"]
    return seq_detector_loss(out, labels, batch["positions"],
                             batch.get("sample_mask"))


OBJECTIVES: Dict[str, Callable] = {
    "detection": _obj_detection,
    "detection_position": _obj_detection_position,
    "two_stage": _obj_two_stage,
    "enhanced_position": _obj_position_only,
    "seq_detector": _obj_seq_detector,
}


# -- the reference's recipes -------------------------------------------------

RECIPES: Dict[str, Recipe] = {
    # `train_detection.py`: AdamW 6e-4 / wd 0.015, BCE only, 20 epochs
    "detection": Recipe("detection", objective="detection"),
    # `training.py`: BCE + 0.5 masked SmoothL1, ONNX-era 3-output models
    "detection_position": Recipe("detection_position", learning_rate=1e-3,
                                 weight_decay=0.01,
                                 objective="detection_position"),
    # `enhanced_position_training.py`: FocalL1 + IoU + length + consistency
    "enhanced_position": Recipe("enhanced_position", learning_rate=5e-4,
                                objective="enhanced_position"),
    # `two_stage_train.py`
    "two_stage": Recipe("two_stage", learning_rate=1e-3, weight_decay=0.01,
                        objective="two_stage",
                        group_lr_mults={"encoder": 1.0, "default": 3.0},
                        group_patterns={"encoder": ["ms_encoder*"]}),
    # `SignalSequenceDetection/train.py`: 3 param groups, cosine
    "seq_detector": Recipe("seq_detector", learning_rate=5e-4,
                           scheduler="cosine", objective="seq_detector",
                           group_lr_mults={"encoder": 1.0,
                                           "transformer": 2.0,
                                           "default": 3.0},
                           group_patterns={"encoder": ["encoder*"],
                                           "transformer": ["transformer*"]}),
}


@dataclasses.dataclass(frozen=True)
class SNRCurriculum:
    """SNR curriculum: converge on a high-SNR tier first, then fine-tune
    on the (low-SNR) target tier.

    The round-3 training-dynamics finding (PROGRESS.md, SIGNAL_BASELINE
    sweep): per-signal BCE trained COLD on echoes at/below the noise
    floor pins at the chance-BCE floor for all epochs — plateau decay
    then locks the lr down before the weak-echo gradient is ever found
    (hard tier: accuracy 0.8322 all-negative, AUC 0.538). A few epochs
    of high-SNR pretraining teach the echo template, which transfers
    below the noise floor: hard-tier AUC 0.538 -> 0.920, F1 0 -> 0.72
    (SIGNAL_BASELINE.json ``hard_curriculum``). The reference trains
    each difficulty once from scratch and has no equivalent
    (`signals/improved_multisignal/train_detection.py:96-216`); this is
    new capability.

    ``run`` chains two ``Trainer.fit`` stages over the same state.
    ``pretrain``/``target`` are ``(train_batches_fn, val_batches_fn)``
    pairs as ``Trainer.fit`` takes them; ``plateau_factory`` builds a
    FRESH controller per stage (the controller is stateful — reusing one
    would carry the easy tier's best-loss into the hard tier and decay
    the lr immediately).
    """

    pretrain_epochs: int = 4
    epochs: int = 20

    def run(self, trainer, state, pretrain, target, *,
            plateau_factory: Optional[Callable] = None,
            log: Callable[[str], None] = print, **fit_kwargs):
        pre_tr, pre_va = pretrain
        tgt_tr, tgt_va = target
        if self.pretrain_epochs > 0:
            log(f"curriculum: {self.pretrain_epochs} high-SNR pretrain "
                f"epochs")
            state = trainer.fit(
                state, pre_tr, pre_va, epochs=self.pretrain_epochs,
                plateau=plateau_factory() if plateau_factory else None,
                log=log, **fit_kwargs)
        return trainer.fit(
            state, tgt_tr, tgt_va, epochs=self.epochs,
            plateau=plateau_factory() if plateau_factory else None,
            log=log, **fit_kwargs)


@dataclasses.dataclass(frozen=True)
class HybridPhases:
    """The 3-phase HybridModel schedule (`train_hybrid.py:93-106`):
    phase 1 trains detection only, phase 2 freezes detection and trains
    the position path, phase 3 trains jointly. Realized as per-phase
    param-group lr masks (0.0 == frozen)."""

    detection_epochs: int = 8
    position_epochs: int = 8
    joint_epochs: int = 4

    def phase_masks(self) -> Tuple[Dict[str, float], ...]:
        det = {"detection": 1.0, "position": 0.0, "default": 0.0}
        pos = {"detection": 0.0, "position": 1.0, "default": 0.0}
        joint = {"detection": 1.0, "position": 1.0, "default": 1.0}
        return det, pos, joint

    @staticmethod
    def group_patterns() -> Dict[str, Sequence[str]]:
        return {"detection": ["detection*"],
                "position": ["position*"]}
