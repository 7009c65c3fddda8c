"""ViT + Transformer optimized XE training (label smoothing, AdamW, warmup-cosine
per step, EMA, optional R-Drop, grad accumulation, strong augmentation, early
stopping).

TPU-native counterpart of /root/reference/scripts/train_vit_transformer_optimized.py
(config :586-629).
"""

from _common import apply_args, parse_args, print_config

from image_caption_tpu.train.driver import fit


def train_optimized(config, smoke=None, resume_from=None):
    return fit(config, regime="optimized", smoke=smoke, resume_from=resume_from)


if __name__ == "__main__":
    args = parse_args("Train ViT+Transformer captioning (optimized XE)")
    config = {
        "data_dir": "data",
        "vocab_path": "data/vocab.json",
        "batch_size": 32,
        "num_workers": 8,
        "max_len": 52,
        "model_type": "vit_transformer",
        "d_model": 512,
        "nhead": 8,
        "num_decoder_layers": 6,
        "dim_feedforward": 2048,
        "dropout": 0.1,
        "pretrained_vit": True,
        "num_epochs": 30,
        "learning_rate": 3e-4,
        "weight_decay": 0.01,
        "warmup_steps": 2000,
        "min_lr": 1e-6,
        "grad_clip": 1.0,
        "label_smoothing": 0.1,
        "use_ema": True,
        "ema_decay": 0.999,
        "use_r_drop": False,
        "r_drop_alpha": 0.5,
        "accumulation_steps": 1,
        "use_augmentation": True,
        "early_stopping_patience": 7,
        "unfreeze_epoch": 10,
        "encoder_lr_factor": 0.1,
        "checkpoint_dir": "checkpoints/vit_transformer_optimized",
        "use_tensorboard": True,
        "log_dir": "runs/vit_transformer_optimized",
        "save_every": 5,
        "seed": 42,
    }
    config = apply_args(config, args)
    print_config(config)
    from image_caption_tpu.utils.logging import profiler_trace

    with profiler_trace(args.profile):
        train_optimized(config, smoke=args.smoke, resume_from=args.resume)
