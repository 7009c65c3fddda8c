"""Benchmark: batched greedy decode throughput (captions/sec/chip).

Measures the full inference path on the flagship grid model (ResNet-101 + 6-layer
Transformer encoder + 6-layer decoder, d_model 512 — the reference's best model,
CIDEr ~1.67): encode -> KV-cached greedy decode to max_len 52, batch 256, bf16.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the BASELINE.json north star is >=2,000 captions/sec on a v5e-8 slice
=> 250 captions/sec/chip.  vs_baseline = measured / 250.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from image_caption_tpu.data.transforms import eval_preprocess
    from image_caption_tpu.decode import engine
    from image_caption_tpu.models.runtime import build_module

    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 256
    max_len = 52
    config = dict(
        model_type="grid_transformer", d_model=512, nhead=8, num_encoder_layers=6,
        num_decoder_layers=6, dim_feedforward=2048, dropout=0.1, max_len=max_len,
    )
    module = build_module(109, config)
    rng = jax.random.PRNGKey(0)
    variables = module.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 4), jnp.int32), jnp.array([4], jnp.int32),
    )

    images_u8 = np.random.default_rng(0).integers(0, 255, size=(batch, 256, 256, 3), dtype=np.uint8)

    @jax.jit
    def caption_batch(variables, images_u8):
        imgs = eval_preprocess(images_u8)
        memory = module.apply(variables, imgs, method=module.encode)
        # end_id=-1 never matches, so the decode always runs the full max_len
        # steps — worst-case honest throughput (random-init weights would
        # otherwise emit <end> early and inflate the number).
        return engine.greedy_decode(
            module, variables, memory, start_id=107, end_id=-1, max_len=max_len
        )

    # warmup / compile
    toks = caption_batch(variables, images_u8)
    toks.block_until_ready()

    # timed runs
    runs = 5
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        caption_batch(variables, images_u8).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    captions_per_sec = batch / (sum(times) / runs)

    # p50 per-image caption latency, b=1 (BASELINE.md tracked metric):
    # the same jitted path at batch 1 — what a single interactive request sees.
    img1 = images_u8[:1]
    caption_batch(variables, img1).block_until_ready()  # compile b=1
    lat = []
    for _ in range(10):
        t0 = time.perf_counter()
        caption_batch(variables, img1).block_until_ready()
        lat.append(time.perf_counter() - t0)
    p50_b1_ms = float(np.median(lat)) * 1e3

    baseline_per_chip = 2000.0 / 8.0
    # MFU accounting: throughput must be physically consistent with the chip
    # (utils/flops.py; a number implying >100% of peak is a measurement bug).
    from image_caption_tpu.utils import flops as F

    device_kind = jax.devices()[0].device_kind
    fpc = F.decode_flops("grid_transformer", config, gen_len=max_len)
    achieved = fpc * captions_per_sec
    mfu = F.mfu(fpc, captions_per_sec, device_kind)
    print(
        json.dumps(
            {
                "metric": "captions/sec/chip (batched greedy, grid model, b=%d)" % batch,
                "value": round(captions_per_sec, 2),
                "unit": "captions/sec",
                "vs_baseline": round(captions_per_sec / baseline_per_chip, 3),
                "p50_ms_per_caption_b1": round(p50_b1_ms, 3),
                "p50_ms_per_caption_amortized_b%d" % batch: round(dt * 1e3 / batch, 4),
                "device": device_kind,
                "gflops_per_caption": round(fpc / 1e9, 2),
                "achieved_tflops": round(achieved / 1e12, 2),
                "mfu": round(mfu, 3) if mfu is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
