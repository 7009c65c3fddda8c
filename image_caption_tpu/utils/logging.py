"""Training observability: meters, metric history + plots, TB writer, profiler.

Reference equivalents: ``AverageMeter`` (train_vit_transformer.py:22-38),
``MetricsHistory.plot_and_save``/``plot_all_metrics_combined`` (:41-154), the
8-panel ``RLMetricsHistory`` (train_vit_transformer_scst_optimized.py:57-163),
TensorBoard scalars guarded by ``use_tensorboard`` (:335-338), tqdm progress.
Additions the reference lacks (SURVEY §5): step-time / throughput meters and
``jax.profiler`` trace hooks.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, List, Optional


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class ThroughputMeter:
    """samples/sec + step-time percentiles over a sliding window."""

    def __init__(self, window: int = 100):
        self.window = window
        self.times: List[float] = []
        self.samples: List[int] = []
        self._last: Optional[float] = None

    def tick(self, batch_size: int):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            self.samples.append(batch_size)
            if len(self.times) > self.window:
                self.times.pop(0)
                self.samples.pop(0)
        self._last = now

    @property
    def samples_per_sec(self) -> float:
        t = sum(self.times)
        return sum(self.samples) / t if t > 0 else 0.0

    @property
    def p50_step_ms(self) -> float:
        if not self.times:
            return 0.0
        s = sorted(self.times)
        return s[len(s) // 2] * 1000.0


class MetricsHistory:
    """Per-epoch metric curves; plots PNG dashboards like the reference."""

    def __init__(self, keys: Optional[List[str]] = None):
        self.history: Dict[str, List[float]] = defaultdict(list)
        self.keys = keys

    def append(self, **metrics: float):
        for k, v in metrics.items():
            self.history[k].append(float(v))

    def save_json(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(dict(self.history), f, indent=2)

    def plot_and_save(self, out_dir: str, title: str = "Training Metrics"):
        """Grid of per-metric curves -> training_metrics.png (reference :60-119)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return  # headless-safe: metrics JSON still saved
        keys = [k for k, v in self.history.items() if v]
        if not keys:
            return
        n = len(keys)
        cols = min(n, 3)
        rows = (n + cols - 1) // cols
        fig, axes = plt.subplots(rows, cols, figsize=(5 * cols, 3.5 * rows), squeeze=False)
        for i, k in enumerate(keys):
            ax = axes[i // cols][i % cols]
            ax.plot(range(1, len(self.history[k]) + 1), self.history[k])
            ax.set_title(k)
            ax.set_xlabel("epoch")
            ax.grid(True, alpha=0.3)
        fig.suptitle(title)
        fig.tight_layout()
        os.makedirs(out_dir, exist_ok=True)
        fig.savefig(os.path.join(out_dir, "training_metrics.png"), dpi=100)
        plt.close(fig)

    def plot_combined(self, out_dir: str, keys: Optional[List[str]] = None):
        """Single-axes overlay -> evaluation_metrics_combined.png (:121-154)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        keys = keys or [k for k in ("CIDEr", "METEOR", "ROUGE_L") if k in self.history]
        if not keys:
            return
        fig, ax = plt.subplots(figsize=(8, 5))
        for k in keys:
            ax.plot(range(1, len(self.history[k]) + 1), self.history[k], label=k, marker="o", ms=3)
        ax.set_xlabel("epoch")
        ax.legend()
        ax.grid(True, alpha=0.3)
        ax.set_title("Evaluation Metrics")
        fig.tight_layout()
        os.makedirs(out_dir, exist_ok=True)
        fig.savefig(os.path.join(out_dir, "evaluation_metrics_combined.png"), dpi=100)
        plt.close(fig)


class RLMetricsHistory(MetricsHistory):
    """SCST observability: the reference's 8-panel RL dashboard + text summary
    (train_vit_transformer_scst_optimized.py:57-163), same ``add`` signature and
    ``plot_and_save(save_path)`` surface, on top of MetricsHistory's JSON dump."""

    def add(self, epoch, sample_reward, greedy_reward, advantage, scores, lr):
        self.history["epoch"].append(float(epoch))
        self.append(
            sample_reward=sample_reward,
            greedy_reward=greedy_reward,
            advantage=advantage,
            lr=lr,
            CIDEr=scores.get("CIDEr", 0.0),
            METEOR=scores.get("METEOR", 0.0),
            ROUGE_L=scores.get("ROUGE_L", 0.0),
        )

    def plot_and_save(self, save_path: str):  # noqa: D401 - reference surface
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return  # headless-safe
        h = self.history
        epochs = h["epoch"]
        if not epochs:
            return
        fig, axes = plt.subplots(2, 4, figsize=(20, 10))
        fig.suptitle("SCST + Optimizations Training Metrics", fontsize=16)

        def panel(ax, series, title, ylabel):
            for key, style, label in series:
                ax.plot(epochs, h[key], style, marker="o", ms=3, label=label)
            ax.set_xlabel("Epoch")
            ax.set_ylabel(ylabel)
            ax.set_title(title)
            ax.legend()
            ax.grid(True)

        panel(axes[0, 0], [("sample_reward", "b-", "Sample Reward"),
                           ("greedy_reward", "r-", "Greedy Reward")],
              "Reward Comparison", "Reward (CIDEr)")
        panel(axes[0, 1], [("advantage", "g-", "Advantage")], "Average Advantage", "Advantage")
        axes[0, 1].axhline(y=0, color="k", linestyle="--", alpha=0.5)
        panel(axes[0, 2], [("CIDEr", "g-", "CIDEr")], "CIDEr Score (Validation)", "Score")
        panel(axes[0, 3], [("lr", "y-", "LR")], "Learning Rate Schedule", "Learning Rate")
        panel(axes[1, 0], [("METEOR", "m-", "METEOR")], "METEOR Score", "Score")
        panel(axes[1, 1], [("ROUGE_L", "c-", "ROUGE-L")], "ROUGE-L Score", "Score")
        panel(axes[1, 2], [("CIDEr", "g-", "CIDEr"), ("METEOR", "m-", "METEOR"),
                           ("ROUGE_L", "c-", "ROUGE-L")], "All Metrics", "Score")

        axes[1, 3].axis("off")
        summary = (
            "Training Summary\n"
            "================\n"
            f"Total Epochs: {len(epochs)}\n"
            f"Best CIDEr: {max(h['CIDEr']):.4f}\n"
            f"Best METEOR: {max(h['METEOR']):.4f}\n"
            f"Best ROUGE-L: {max(h['ROUGE_L']):.4f}\n"
            f"Final LR: {h['lr'][-1]:.2e}\n"
        )
        axes[1, 3].text(0.1, 0.5, summary, fontsize=12, family="monospace",
                        verticalalignment="center")
        fig.tight_layout()
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        fig.savefig(save_path, dpi=150)
        plt.close(fig)


class Logger:
    """print + optional TensorBoard scalars (+ metrics JSONL)."""

    def __init__(self, log_dir: Optional[str] = None, use_tensorboard: bool = False):
        self.writer = None
        self.jsonl_path = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self.jsonl_path = os.path.join(log_dir, "metrics.jsonl")
            if use_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self.writer = SummaryWriter(log_dir)
                except Exception as e:
                    print(f"note: tensorboard unavailable ({e})")

    def scalar(self, tag: str, value: float, step: int):
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")

    def close(self):
        if self.writer is not None:
            self.writer.close()


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace scope (SURVEY §5: the reference has no profiling)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
