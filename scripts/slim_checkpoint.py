"""Slim a training checkpoint to its inference payload.

Training checkpoints carry full resume state (raw_params, opt_state, EMA
shadow) — roughly 4-5x the inference payload.  For archival/demo artifacts only
``params`` (EMA already baked in at save time, like the reference's best-model
save, train_vit_transformer_optimized.py:527-541), ``batch_stats`` and the
embedded config/scores are needed: ``scripts/inference.py`` rebuilds the model
from exactly these keys.

Usage: python scripts/slim_checkpoint.py ckpt [ckpt ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEEP = ("step", "epoch", "params", "batch_stats", "best_cider", "scores", "config", "host_state")


def slim(path: str) -> None:
    from image_caption_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    before = os.path.getsize(path)
    ck = load_checkpoint(path)
    dropped = sorted(set(ck) - set(KEEP))
    if not dropped:
        print(f"{path}: already slim ({before / 1e6:.0f} MB)")
        return
    save_checkpoint(path, {k: ck[k] for k in KEEP if k in ck})
    after = os.path.getsize(path)
    print(f"{path}: {before / 1e6:.0f} -> {after / 1e6:.0f} MB (dropped {', '.join(dropped)})")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    for p in sys.argv[1:]:
        slim(p)
