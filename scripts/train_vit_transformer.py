"""ViT + Transformer XE baseline training.

TPU-native counterpart of /root/reference/scripts/train_vit_transformer.py
(config dict surface :482-508 preserved: same keys, same defaults).
"""

from _common import apply_args, parse_args, print_config

from image_caption_tpu.train.driver import fit


def train(config, smoke=None, resume_from=None):
    return fit(config, regime="base", smoke=smoke, resume_from=resume_from)


if __name__ == "__main__":
    args = parse_args("Train ViT+Transformer captioning (XE)")
    config = {
        # data
        "data_dir": "data",
        "vocab_path": "data/vocab.json",
        "batch_size": 32,
        "num_workers": 4,
        "max_len": 52,
        # model
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
        "grad_clip": 5.0,
        "unfreeze_epoch": 10,
        "encoder_lr_factor": 0.1,
        "checkpoint_dir": "checkpoints/vit_transformer",
        "use_tensorboard": True,
        "log_dir": "runs/vit_transformer",
        "save_every": 5,
        "seed": 42,
    }
    config = apply_args(config, args)
    print_config(config)
    from image_caption_tpu.utils.logging import profiler_trace

    with profiler_trace(args.profile):
        train(config, smoke=args.smoke, resume_from=args.resume)
