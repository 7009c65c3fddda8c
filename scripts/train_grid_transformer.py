"""Grid(ResNet-101) + Transformer XE baseline training.

TPU-native counterpart of /root/reference/scripts/train_grid_transformer.py
(config :437-462: plain Adam, CNN unfreeze at epoch 5 with lr x0.1).
"""

from _common import apply_args, parse_args, print_config

from image_caption_tpu.train.driver import fit


def train(config, smoke=None, resume_from=None):
    return fit(config, regime="base", smoke=smoke, resume_from=resume_from)


if __name__ == "__main__":
    args = parse_args("Train Grid+Transformer captioning (XE)")
    config = {
        "data_dir": "data",
        "vocab_path": "data/vocab.json",
        "batch_size": 32,
        "num_workers": 4,
        "max_len": 52,
        "model_type": "grid_transformer",
        "backbone": "resnet101",
        "d_model": 512,
        "nhead": 8,
        "num_encoder_layers": 6,
        "num_decoder_layers": 6,
        "dim_feedforward": 2048,
        "dropout": 0.1,
        "pretrained_cnn": True,
        "num_epochs": 30,
        "learning_rate": 1e-4,
        "grad_clip": 5.0,
        "unfreeze_epoch": 5,
        "cnn_lr_factor": 0.1,
        "checkpoint_dir": "checkpoints/grid_transformer",
        "use_tensorboard": True,
        "log_dir": "runs/grid_transformer",
        "save_every": 5,
        "seed": 42,
    }
    config = apply_args(config, args)
    print_config(config)
    from image_caption_tpu.utils.logging import profiler_trace

    with profiler_trace(args.profile):
        train(config, smoke=args.smoke, resume_from=args.resume)
