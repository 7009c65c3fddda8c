"""Train steps: XE (all variants), SCST, EMA, checkpoint roundtrip — on a tiny
grid model end-to-end (synthetic batch -> augment -> forward/backward -> update)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_caption_tpu.models.runtime import build_module
from image_caption_tpu.train import steps as S
from image_caption_tpu.train.optim import EMA, label_params_by_prefix, make_optimizer
from image_caption_tpu.train.scst import get_reference_captions, make_reward
from image_caption_tpu.train.schedules import warmup_cosine_schedule

VOCAB, PAD, START, END = 23, 0, 20, 21


def tiny_module():
    cfg = dict(
        model_type="grid_transformer", d_model=32, nhead=4, num_decoder_layers=2,
        num_encoder_layers=1, dim_feedforward=64, dropout=0.1, max_len=60,
        resnet_stages=(1, 1, 1, 1),
    )
    return build_module(VOCAB, cfg), cfg


def tiny_batch(rng, b=4, L=12):
    cap = rng.integers(1, VOCAB - 3, size=(b, L)).astype(np.int32)
    cap[:, 0] = START
    lens = rng.integers(5, L, size=(b,)).astype(np.int32)
    for i, l in enumerate(lens):
        cap[i, l - 1] = END
        cap[i, l:] = PAD
    return {
        "image": rng.integers(0, 255, size=(b, 256, 256, 3)).astype(np.uint8),
        "caption": cap,
        "length": lens,
    }


@pytest.fixture(scope="module")
def setup():
    module, cfg = tiny_module()
    key = jax.random.PRNGKey(0)
    variables = module.init(
        {"params": key, "dropout": key},
        jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 4), jnp.int32), jnp.array([4]),
    )
    return module, variables


def test_xe_train_step_learns(setup):
    module, variables = setup
    labels = label_params_by_prefix(variables["params"], {"encoder": "frozen"})
    tx = make_optimizer(1e-3, kind="adam", b1=0.9, b2=0.98, eps=1e-9, clip_norm=5.0, param_labels=labels)
    ema = EMA(0.99)
    step_fn = S.make_train_step(module, tx, loss_kind="ce", pad_id=PAD, augment="baseline", ema=ema)
    state = S.create_train_state(variables, tx, ema=ema)
    rng = np.random.default_rng(0)
    batch = tiny_batch(rng)
    key = jax.random.PRNGKey(1)
    losses = []
    # snapshot to host BEFORE stepping: the step donates the state, so the
    # original device buffers are reused in place
    enc0 = np.asarray(jax.tree_util.tree_leaves(state.params["encoder"]["cnn"])[0])
    dec0 = np.asarray(jax.tree_util.tree_leaves(state.params["decoder"])[0])
    for i in range(8):
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, {k2: jnp.asarray(v) for k2, v in batch.items()}, k)
        losses.append(float(metrics["loss"]))
    # same batch 8x -> loss must drop
    assert losses[-1] < losses[0]
    assert int(state.step) == 8
    # frozen encoder unchanged, decoder changed
    enc1 = jax.tree_util.tree_leaves(state.params["encoder"]["cnn"])[0]
    np.testing.assert_array_equal(enc0, np.asarray(enc1))
    dec1 = jax.tree_util.tree_leaves(state.params["decoder"])[0]
    assert not np.array_equal(dec0, np.asarray(dec1))
    # EMA shadow differs from both init and current (it trails)
    assert state.ema is not None


def test_optimized_step_variants(setup):
    module, variables = setup
    sched = warmup_cosine_schedule(3e-4, 10, 100)
    tx = make_optimizer(sched, kind="adamw", weight_decay=0.01, clip_norm=1.0)
    step_fn = S.make_train_step(
        module, tx, loss_kind="label_smoothing", smoothing=0.1, pad_id=PAD,
        r_drop_alpha=0.5, augment="strong",
    )
    state = S.create_train_state(variables, tx)
    batch = tiny_batch(np.random.default_rng(1))
    state, metrics = step_fn(state, {k: jnp.asarray(v) for k, v in batch.items()}, jax.random.PRNGKey(0))
    assert np.isfinite(metrics["loss"])
    assert "r_drop_kl" in metrics and float(metrics["r_drop_kl"]) >= 0


def test_grad_accumulation_multisteps(setup):
    import optax

    module, variables = setup
    tx = optax.MultiSteps(make_optimizer(1e-3), every_k_schedule=2)
    step_fn = S.make_train_step(module, tx, loss_kind="ce", pad_id=PAD, augment=None)
    state = S.create_train_state(variables, tx)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(np.random.default_rng(2)).items()}
    p0 = jax.tree_util.tree_leaves(state.params["decoder"])[0].copy()
    state, _ = step_fn(state, batch, jax.random.PRNGKey(0))
    p1 = jax.tree_util.tree_leaves(state.params["decoder"])[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))  # accumulating, no update yet
    state, _ = step_fn(state, batch, jax.random.PRNGKey(1))
    p2 = jax.tree_util.tree_leaves(state.params["decoder"])[0]
    assert not np.array_equal(np.asarray(p0), np.asarray(p2))  # 2nd micro-step applies


def test_scst_step(setup):
    module, variables = setup
    tx = make_optimizer(5e-6, kind="adamw", weight_decay=0.01, clip_norm=1.0)
    reward = make_reward("cider", PAD, START, END)
    step_fn = S.make_scst_step(
        module, tx, reward, pad_id=PAD, start_id=START, end_id=END, max_len=14, augment=None
    )
    state = S.create_train_state(variables, tx)
    batch = tiny_batch(np.random.default_rng(3))
    refs = get_reference_captions(batch["caption"], PAD, START, END)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state, metrics = step_fn(state, jb, refs, jax.random.PRNGKey(0))
    for k in ("loss", "sample_reward", "greedy_reward", "advantage", "grad_norm"):
        assert np.isfinite(metrics[k]), (k, metrics)
    assert int(state.step) == 1


def test_eval_step_and_checkpoint_roundtrip(setup, tmp_path):
    from image_caption_tpu.utils.checkpoint import load_checkpoint, restore_into, save_checkpoint

    module, variables = setup
    eval_step = S.make_eval_step(module, pad_id=PAD)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(np.random.default_rng(4)).items()}
    loss, memory = eval_step(variables, batch)
    assert np.isfinite(float(loss))
    assert memory.shape[1] == 49  # 7x7 grid tokens

    path = str(tmp_path / "ck.msgpack")
    save_checkpoint(path, {
        "params": variables["params"], "batch_stats": variables.get("batch_stats", {}),
        "epoch": 3, "best_cider": 1.23, "config": {"d_model": 32}, "step": 17,
    })
    loaded = load_checkpoint(path)
    assert loaded["epoch"] == 3 and abs(loaded["best_cider"] - 1.23) < 1e-9
    restored = restore_into(variables["params"], loaded["params"])
    l0 = jax.tree_util.tree_leaves(variables["params"])
    l1 = jax.tree_util.tree_leaves(restored)
    for a, b in zip(l0, l1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_frozen_backbone_takes_no_gradient(setup):
    """With train_backbone=False the encoders cut the graph at the backbone
    output (torch requires_grad=False semantics): CNN grads must be exactly
    zero while projection/decoder grads flow; True restores CNN gradients."""
    module, variables = setup
    rng = np.random.default_rng(3)
    batch = tiny_batch(rng)
    images = jnp.asarray(batch["image"]).astype(jnp.float32)[:, :224, :224, :] / 255.0
    captions, lengths = jnp.asarray(batch["caption"]), jnp.asarray(batch["length"])

    def loss(params, train_backbone):
        out = module.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            images, captions, lengths, deterministic=True,
            train_backbone=train_backbone,
            mutable=["batch_stats"] if train_backbone else False,
        )
        if train_backbone:
            out = out[0]
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g_frozen = jax.grad(lambda p: loss(p, False))(variables["params"])
    cnn_norm = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.sum(jnp.abs(l))), g_frozen["encoder"]["cnn"], 0.0
    )
    proj_norm = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.sum(jnp.abs(l))), g_frozen["encoder"]["projection"], 0.0
    )
    assert cnn_norm == 0.0
    assert proj_norm > 0.0

    g_train = jax.grad(lambda p: loss(p, True))(variables["params"])
    cnn_norm_t = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.sum(jnp.abs(l))), g_train["encoder"]["cnn"], 0.0
    )
    assert cnn_norm_t > 0.0


def test_scst_fused_step_matches_host_reward_path(setup):
    """The fused device-CIDEr SCST step must produce the same parameter update
    as the host-reward step for identical state/batch/rng (the rewards are
    exact-equivalent, so the REINFORCE grads must be too)."""
    from image_caption_tpu.eval.cider_device import CiderDevice

    module, variables = setup
    batch = tiny_batch(np.random.default_rng(5))
    refs = get_reference_captions(batch["caption"], PAD, START, END)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(7)
    max_len = 14

    def run(device_cider):
        tx = make_optimizer(5e-6, kind="adamw", weight_decay=0.01, clip_norm=1.0)
        step_fn = S.make_scst_step(
            module, tx, make_reward("cider", PAD, START, END), pad_id=PAD,
            start_id=START, end_id=END, max_len=max_len, augment=None,
            device_cider=device_cider,
        )
        state = S.create_train_state(variables, tx)
        if device_cider is None:
            state, metrics = step_fn(state, jb, refs, rng)
            return state, metrics["sample_reward"], metrics["advantage"]
        acc = S.init_scst_acc()
        state, acc = step_fn(state, jb, device_cider.pack(refs), rng, acc)
        vals = {k: float(v) for k, v in jax.device_get(acc).items()}
        n = vals["samples"]
        return state, vals["sample_reward"] / n, vals["advantage"] / n

    s_host, sr_host, adv_host = run(None)
    dev = CiderDevice(PAD, START, END, VOCAB, max_len)
    s_fused, sr_fused, adv_fused = run(dev)

    assert abs(sr_host - sr_fused) < 1e-4, (sr_host, sr_fused)
    assert abs(adv_host - adv_fused) < 1e-4, (adv_host, adv_fused)
    ph = jax.tree_util.tree_leaves(s_host.params["decoder"])
    pf = jax.tree_util.tree_leaves(s_fused.params["decoder"])
    for a, b in zip(ph, pf):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   atol=1e-6, rtol=1e-5)


def test_eval_step_criterion_matches_regime(setup):
    """Optimized-regime val loss must use the label-smoothing criterion
    (reference validate scores with the training criterion,
    train_vit_transformer_optimized.py:305, :396-402)."""
    module, variables = setup
    rng = np.random.default_rng(5)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(rng).items()}
    ce_step = S.make_eval_step(module, loss_kind="ce", pad_id=PAD)
    ls_step = S.make_eval_step(module, loss_kind="label_smoothing", smoothing=0.1, pad_id=PAD)
    ce_loss, _ = ce_step(variables, batch)
    ls_loss, _ = ls_step(variables, batch)
    assert float(ce_loss) != float(ls_loss)


def test_eval_step_loss_invariant_under_batch_padding(setup):
    """Rows padded with all-<pad> captions contribute zero tokens to the
    pad-masked loss, so the padded-batch loss equals the ragged-batch loss
    exactly (the driver pads the final eval batch to keep one compiled shape)."""
    from image_caption_tpu.train.driver import _pad_batch

    module, variables = setup
    rng = np.random.default_rng(7)
    batch = tiny_batch(rng, b=3)
    padded = _pad_batch(batch, 8, PAD)
    assert padded["image"].shape[0] == 8 and padded["caption"].shape[0] == 8
    eval_step = S.make_eval_step(module, pad_id=PAD)
    loss_ragged, _ = eval_step(variables, {k: jnp.asarray(v) for k, v in batch.items()})
    loss_padded, _ = eval_step(variables, {k: jnp.asarray(v) for k, v in padded.items()})
    np.testing.assert_allclose(float(loss_ragged), float(loss_padded), rtol=1e-6)
