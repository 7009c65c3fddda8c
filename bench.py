"""Benchmark: batched greedy decode throughput (captions/sec/chip).

Measures the full inference path on the flagship grid model (ResNet-101 + 6-layer
Transformer encoder + 6-layer decoder, d_model 512 — the reference's best model,
CIDEr ~1.67): encode -> KV-cached greedy decode to max_len 52, batch 256, bf16.

Timing method (see utils/timing.py): on this tunneled backend
``block_until_ready`` does NOT wait for device execution, so the benchmark
chains k dependent decode iterations inside one jitted fori_loop (each
iteration's input is perturbed by the previous iteration's token checksum) and
times a true scalar fetch for two values of k — the slope is pure device time,
with the ~35-40 ms tunnel round trip and dispatch cost cancelled.  MFU is
reported against the chip's bf16 peak so an impossible number is self-flagging.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
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
    from image_caption_tpu.utils import flops as F
    from image_caption_tpu.utils.timing import device_time

    # Default b=64: the measured throughput sweet spot (PERF.md — 4x the batch
    # costs 4.5x the time at these shapes, so b=64 beats b=256 on caps/sec).
    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 64
    # --model vit_transformer benches the ViT captioner (196 memory tokens =>
    # ~4x the grid model's cross-KV traffic per decode step); the headline
    # (driver default) stays the flagship grid model.
    model_type = (
        sys.argv[sys.argv.index("--model") + 1] if "--model" in sys.argv else "grid_transformer"
    )
    max_len = 52
    config = dict(
        model_type=model_type, d_model=512, nhead=8, num_encoder_layers=6,
        num_decoder_layers=6, dim_feedforward=2048, dropout=0.1, max_len=max_len,
    )
    module = build_module(109, config)
    rng = jax.random.PRNGKey(0)
    variables = module.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 4), jnp.int32), jnp.array([4], jnp.int32),
    )
    # Production inference weight stream: bf16 pre-cast of every param the
    # model consumes in bf16 anyway — bit-identical tokens (tests/
    # test_precision.py), half the 101 MB/step decoder weight read.
    from image_caption_tpu.utils.precision import bf16_inference_variables

    variables = bf16_inference_variables(variables)

    def body(i, s, variables, images_u8):
        """fori_loop body: scalar carry -> scalar carry, full decode inside.
        variables/images arrive as jit ARGUMENTS (closure constants of this
        size overflow the tunnel's remote_compile request — utils/timing.py)."""
        imgs = eval_preprocess(images_u8) + s * 1e-30  # carry dep: sequential exec
        memory = module.apply(variables, imgs, method=module.encode)
        # end_id=-1 never matches, so the decode always runs the full
        # max_len steps — worst-case honest throughput.
        tokens = engine.greedy_decode(
            module, variables, memory, start_id=107, end_id=-1, max_len=max_len
        )
        return s * 1e-9 + jnp.sum(tokens).astype(jnp.float32)

    from image_caption_tpu.utils.timing import chain_scalar

    rng_np = np.random.default_rng(0)
    images_u8 = rng_np.integers(0, 255, size=(batch, 256, 256, 3), dtype=np.uint8)
    per_decode = device_time(
        body, variables, jnp.asarray(images_u8), iters=(2, 6), reps=3
    )
    captions_per_sec = batch / per_decode

    # b=1: true device latency (slope) + end-to-end including the tunnel RTT
    img1 = jnp.asarray(images_u8[:1])
    b1_device = device_time(body, variables, img1, iters=(2, 10), reps=3)
    run1 = chain_scalar(body)
    e2e = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run1(jnp.float32(0.0), jnp.int32(1), variables, img1))
        e2e.append(time.perf_counter() - t0)
    b1_e2e_ms = float(np.median(e2e)) * 1e3

    baseline_per_chip = 2000.0 / 8.0
    device_kind = jax.devices()[0].device_kind
    fpc = F.decode_flops(model_type, config, gen_len=max_len)
    mfu = F.mfu(fpc, captions_per_sec, device_kind)
    model_tag = "grid model" if model_type == "grid_transformer" else "vit model"
    print(
        json.dumps(
            {
                "metric": "captions/sec/chip (batched greedy, %s, b=%d)" % (model_tag, batch),
                "value": round(captions_per_sec, 2),
                "unit": "captions/sec",
                "vs_baseline": round(captions_per_sec / baseline_per_chip, 3),
                "ms_per_batch_device": round(per_decode * 1e3, 2),
                "p50_ms_per_caption_b1_device": round(b1_device * 1e3, 3),
                "p50_ms_per_caption_b1_e2e_tunnel": round(b1_e2e_ms, 1),
                "device": device_kind,
                "gflops_per_caption": round(fpc / 1e9, 2),
                "achieved_tflops": round(fpc * captions_per_sec / 1e12, 2),
                "mfu": round(mfu, 3) if mfu is not None else None,
                "timing": "chained-iteration slope w/ value fetch (block_until_ready is a no-op on this tunneled backend)",
            }
        )
    )


if __name__ == "__main__":
    main()
