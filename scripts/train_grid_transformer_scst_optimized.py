"""Grid + Transformer SCST RL fine-tuning.

TPU-native counterpart of
/root/reference/scripts/train_grid_transformer_scst_optimized.py (config :567-621;
note the reference SCST grid config uses num_encoder_layers: 3, :578-583).
"""

from _common import apply_args, parse_args, print_config

from image_caption_tpu.train.driver import fit_scst


def train_scst_optimized(config, smoke=None, resume_from=None):
    return fit_scst(config, smoke=smoke, resume_from=resume_from)


if __name__ == "__main__":
    args = parse_args("SCST fine-tune Grid+Transformer (CIDEr reward)")
    config = {
        "data_dir": "data",
        "vocab_path": "data/vocab.json",
        "batch_size": 16,
        "num_workers": 8,
        "max_len": 52,
        "model_type": "grid_transformer",
        "backbone": "resnet101",
        "d_model": 512,
        "nhead": 8,
        "num_encoder_layers": 3,
        "num_decoder_layers": 6,
        "dim_feedforward": 2048,
        "dropout": 0.1,
        "pretrained_cnn": True,
        "pretrained_checkpoint": "checkpoints/grid_transformer/best_model.ckpt",
        "num_epochs": 10,
        "learning_rate": 5e-6,
        "weight_decay": 0.01,
        "warmup_ratio": 0.1,
        "grad_clip": 1.0,
        "accumulation_steps": 2,
        "use_ema": True,
        "ema_decay": 0.9999,
        "use_augmentation": True,
        "early_stopping_patience": 8,
        "reward_type": "cider",
        "checkpoint_dir": "checkpoints/grid_transformer_scst",
        "use_tensorboard": True,
        "log_dir": "runs/grid_transformer_scst",
        "seed": 42,
    }
    config = apply_args(config, args)
    print_config(config)
    from image_caption_tpu.utils.logging import profiler_trace

    with profiler_trace(args.profile):
        train_scst_optimized(config, smoke=args.smoke, resume_from=args.resume)
