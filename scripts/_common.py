"""Shared CLI plumbing for the training/inference scripts.

Keeps the reference's config-dict surface (each script defines its dict at the
bottom and passes it to a train function) while adding a few flags the reference
lacked: ``--smoke`` (tiny end-to-end run), ``--data-dir``, ``--epochs``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(description: str):
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--data-dir", default=None, help="dataset dir containing *_data.json + vocab.json")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument(
        "--smoke", nargs="?", const=2, default=None, type=int,
        help="run N train steps/epoch with a tiny model (default 2) to exercise the full pipeline",
    )
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--resume", default=None, help="checkpoint path for deterministic mid-run resume")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the run into DIR")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE", dest="overrides",
        help="override any config key (value is python-literal-eval'd, falling back to string); repeatable",
    )
    return p.parse_args()


def apply_args(config: dict, args) -> dict:
    if args.cpu:
        from image_caption_tpu.utils.platform import force_cpu

        force_cpu()
    if args.data_dir:
        config["data_dir"] = args.data_dir
        config["vocab_path"] = os.path.join(args.data_dir, "vocab.json")
    if args.epochs:
        config["num_epochs"] = args.epochs
    if args.batch_size:
        config["batch_size"] = args.batch_size
    if args.checkpoint_dir:
        config["checkpoint_dir"] = args.checkpoint_dir
    if args.smoke is not None:
        # Smoke runs must not clobber real checkpoints/logs: redirect any
        # output dirs the user didn't explicitly pass to a scratch location.
        import tempfile

        scratch = tempfile.mkdtemp(prefix="ict_smoke_")
        if not args.checkpoint_dir:
            config["checkpoint_dir"] = os.path.join(scratch, "checkpoints")
        config["log_dir"] = os.path.join(scratch, "runs")
        config.update(
            num_epochs=min(config.get("num_epochs", 2), 2),
            batch_size=4,
            d_model=64,
            nhead=4,
            num_decoder_layers=2,
            dim_feedforward=128,
            warmup_steps=2,
            pretrained_vit=False,
            pretrained_cnn=False,
        )
        if config.get("model_type") == "grid_transformer":
            config.update(num_encoder_layers=1, resnet_stages=(1, 1, 1, 1))
        else:
            config.update(vit_layers=2, vit_hidden=64, vit_heads=4, vit_mlp=128)
    for kv in getattr(args, "overrides", []):
        key, _, raw = kv.partition("=")
        if not _:
            raise SystemExit(f"--set expects KEY=VALUE, got {kv!r}")
        import ast

        try:
            config[key] = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            config[key] = raw
    return config


def print_config(config: dict):
    print("=" * 60)
    print("config:")
    for k, v in sorted(config.items()):
        print(f"  {k}: {v}")
    print("=" * 60)
