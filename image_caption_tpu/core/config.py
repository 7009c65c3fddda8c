"""Config system.

The reference drives everything with plain Python dicts defined at the bottom of each
training script (e.g. /root/reference/scripts/train_vit_transformer.py:482-508) and
read with ``config.get(key, default)`` everywhere; the dict is embedded verbatim in
checkpoints and inference rebuilds the model from it.  We keep that exact dict surface
(same key names, same defaults) so users of the reference can switch without touching
their configs, but expose typed helpers on top.
"""

from __future__ import annotations

import copy
from typing import Any, Dict

# ---------------------------------------------------------------------------
# Reference-compatible default configs
# ---------------------------------------------------------------------------

_VIT_DEFAULTS: Dict[str, Any] = {
    # data
    "data_dir": "data",
    "vocab_path": "data/vocab.json",
    "image_dir": "data/images",
    "batch_size": 32,
    "num_workers": 4,
    "max_len": 52,
    # model (reference: train_vit_transformer.py config dict)
    "model_type": "vit_transformer",
    "d_model": 512,
    "nhead": 8,
    "num_decoder_layers": 6,
    "dim_feedforward": 2048,
    "dropout": 0.1,
    "pretrained_vit": True,
    # training
    "num_epochs": 30,
    "learning_rate": 1e-4,
    "weight_decay": 0.0,
    "grad_clip": 5.0,
    "unfreeze_epoch": 10,
    "encoder_lr_factor": 0.1,
    "checkpoint_dir": "checkpoints/vit_transformer",
    "use_tensorboard": True,
    "log_dir": "runs/vit_transformer",
    "save_every": 5,
    "seed": 42,
}

_GRID_DEFAULTS: Dict[str, Any] = {
    **_VIT_DEFAULTS,
    "model_type": "grid_transformer",
    "backbone": "resnet101",
    "num_encoder_layers": 6,
    "pretrained_cnn": True,
    "unfreeze_epoch": 5,  # reference: train_grid_transformer.py unfreezes CNN at epoch 5
    "cnn_lr_factor": 0.1,
    "checkpoint_dir": "checkpoints/grid_transformer",
    "log_dir": "runs/grid_transformer",
}


def default_vit_config(**overrides: Any) -> Dict[str, Any]:
    cfg = copy.deepcopy(_VIT_DEFAULTS)
    cfg.update(overrides)
    return cfg


def default_grid_config(**overrides: Any) -> Dict[str, Any]:
    cfg = copy.deepcopy(_GRID_DEFAULTS)
    cfg.update(overrides)
    return cfg


# ---------------------------------------------------------------------------
# Optimized-training presets (reference: utils/optimizations.py:528-579
# get_optimized_config light/medium/heavy tiers)
# ---------------------------------------------------------------------------

_OPT_TIERS: Dict[str, Dict[str, Any]] = {
    "light": {
        "label_smoothing": 0.1,
        "learning_rate": 3e-4,
        "weight_decay": 0.01,
        "warmup_steps": 2000,
        "min_lr": 1e-6,
        "use_ema": True,
        "ema_decay": 0.999,
        "use_r_drop": False,
        "r_drop_alpha": 0.0,
        "accumulation_steps": 1,
        "grad_clip": 1.0,
        "early_stopping_patience": 7,
        "use_augmentation": True,
    },
    "medium": {
        "label_smoothing": 0.1,
        "learning_rate": 3e-4,
        "weight_decay": 0.01,
        "warmup_steps": 2000,
        "min_lr": 1e-6,
        "use_ema": True,
        "ema_decay": 0.999,
        "use_r_drop": True,
        "r_drop_alpha": 0.5,
        "accumulation_steps": 2,
        "grad_clip": 1.0,
        "early_stopping_patience": 7,
        "use_augmentation": True,
    },
    "heavy": {
        "label_smoothing": 0.15,
        "learning_rate": 5e-4,
        "weight_decay": 0.05,
        "warmup_steps": 4000,
        "min_lr": 1e-6,
        "use_ema": True,
        "ema_decay": 0.9995,
        "use_r_drop": True,
        "r_drop_alpha": 1.0,
        "accumulation_steps": 4,
        "grad_clip": 1.0,
        "early_stopping_patience": 10,
        "use_augmentation": True,
    },
}


def get_optimized_config(level: str = "medium") -> Dict[str, Any]:
    """Preset optimization-trick tiers, mirroring optimizations.py:528-579."""
    if level not in _OPT_TIERS:
        raise ValueError(f"unknown optimization level {level!r}; choose from {sorted(_OPT_TIERS)}")
    return copy.deepcopy(_OPT_TIERS[level])


# ---------------------------------------------------------------------------
# SCST preset (reference: train_vit_transformer_scst_optimized.py:567-609)
# ---------------------------------------------------------------------------

def default_scst_config(model_type: str = "vit_transformer", **overrides: Any) -> Dict[str, Any]:
    base = default_vit_config() if model_type == "vit_transformer" else default_grid_config()
    if model_type == "grid_transformer":
        base["num_encoder_layers"] = 3  # reference SCST grid config:578-583
    base.update(
        {
            "batch_size": 16,
            "learning_rate": 5e-6,
            "weight_decay": 0.01,
            "accumulation_steps": 2,
            "grad_clip": 1.0,
            "use_ema": True,
            "ema_decay": 0.9999,
            "warmup_ratio": 0.1,
            "early_stopping_patience": 8,
            "reward_type": "cider",
            "pretrained_checkpoint": f"checkpoints/{model_type.split('_')[0]}_transformer/best_model.pth",
            "checkpoint_dir": f"checkpoints/{model_type.split('_')[0]}_transformer_scst",
            "num_epochs": 10,
        }
    )
    base.update(overrides)
    return base
