"""Multi-device tests on the virtual 8-CPU-device mesh: DP train step, TP param
shardings, sharded greedy decode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from image_caption_tpu.models.runtime import build_module
from image_caption_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
)
from image_caption_tpu.train import steps as S
from image_caption_tpu.train.optim import make_optimizer

VOCAB, PAD, START, END = 23, 0, 20, 21


def tiny_module():
    cfg = dict(
        model_type="grid_transformer", d_model=32, nhead=4, num_decoder_layers=2,
        num_encoder_layers=1, dim_feedforward=64, dropout=0.1, max_len=60,
        resnet_stages=(1, 1, 1, 1),
    )
    return build_module(VOCAB, cfg), cfg


@pytest.fixture(scope="module")
def module_and_vars():
    module, _ = tiny_module()
    key = jax.random.PRNGKey(0)
    variables = module.init(
        {"params": key, "dropout": key},
        jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 4), jnp.int32), jnp.array([4]),
    )
    return module, variables


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dp_train_step_sharded(module_and_vars):
    module, variables = module_and_vars
    mesh = make_mesh((8, 1))
    tx = make_optimizer(1e-3, clip_norm=1.0)
    step_fn = S.make_train_step(module, tx, loss_kind="ce", pad_id=PAD, augment="baseline")
    state = S.create_train_state(variables, tx)
    state = jax.device_put(state, jax.sharding.NamedSharding(mesh, P()))

    rng = np.random.default_rng(0)
    b = 16
    cap = rng.integers(1, VOCAB - 3, size=(b, 12)).astype(np.int32)
    cap[:, 0] = START
    batch = {
        "image": rng.integers(0, 255, size=(b, 256, 256, 3)).astype(np.uint8),
        "caption": cap,
        "length": np.full((b,), 12, dtype=np.int32),
    }
    sharded = shard_batch(batch, mesh)
    assert sharded["image"].sharding.spec == P("data")
    state2, metrics = step_fn(state, sharded, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # params remain replicated after the update
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_tp_param_shardings(module_and_vars):
    module, variables = module_and_vars
    mesh = make_mesh((4, 2))
    shardings = param_shardings(variables["params"], mesh)
    flat = jax.tree_util.tree_leaves_with_path(shardings)
    specs = {
        "/".join(getattr(k, "key", str(k)) for k in path): s.spec for path, s in flat
    }
    # decoder qkv kernel is column-sharded on 'model'
    qkv_specs = [s for p, s in specs.items() if "qkv" in p and "kernel" in p]
    assert qkv_specs and all(s == P(None, "model") for s in qkv_specs)
    out_specs = [s for p, s in specs.items() if "/out/" in p and "kernel" in p]
    assert out_specs and all(s == P("model", None) for s in out_specs)
    # conv kernels replicated
    conv_specs = [s for p, s in specs.items() if "cnn" in p and "kernel" in p]
    assert conv_specs and all(s == P() for s in conv_specs)
    # placing the params with these shardings must succeed and keep values
    placed = jax.device_put(variables["params"], shardings)
    a = jax.tree_util.tree_leaves(variables["params"])[3]
    b = jax.tree_util.tree_leaves(placed)[3]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_tp_forward_matches_replicated(module_and_vars):
    module, variables = module_and_vars
    mesh = make_mesh((2, 4))
    shardings = param_shardings(variables["params"], mesh)
    placed_params = jax.device_put(variables["params"], shardings)
    imgs = jnp.asarray(np.random.default_rng(1).normal(size=(4, 224, 224, 3)).astype(np.float32))
    caps = jnp.asarray(np.random.default_rng(2).integers(0, VOCAB, size=(4, 10)).astype(np.int32))
    lens = jnp.full((4,), 10, dtype=jnp.int32)

    bs = variables.get("batch_stats", {})
    ref = module.apply({"params": variables["params"], "batch_stats": bs}, imgs, caps, lens)
    with jax.set_mesh(mesh):
        out = module.apply({"params": placed_params, "batch_stats": bs}, imgs, caps, lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=1e-2)


def test_sharded_greedy_decode(module_and_vars):
    from image_caption_tpu.decode import engine

    module, variables = module_and_vars
    mesh = make_mesh((8, 1))
    imgs = np.random.default_rng(3).normal(size=(16, 224, 224, 3)).astype(np.float32)
    vs = {"params": variables["params"], "batch_stats": variables.get("batch_stats", {})}
    memory = module.apply(vs, jnp.asarray(imgs), method=module.encode)
    mem_sharded = jax.device_put(np.asarray(memory), batch_sharding(mesh))
    toks = engine.greedy_decode(
        module, vs, mem_sharded, start_id=START, end_id=END, max_len=12
    )
    toks_ref = engine.greedy_decode(
        module, vs, jnp.asarray(np.asarray(memory)),
        start_id=START, end_id=END, max_len=12,
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks_ref))


@pytest.mark.slow  # 73 s — and the driver re-certifies the same property every
def test_sharded_beam_matches_unsharded(module_and_vars):  # round via dryrun_multichip
    """Beam search (the reference's flagship inference feature) under SPMD:
    DP-sharded memory and TP-sharded params must reproduce the unsharded
    tokens exactly (round-3 gap: beam had zero multi-device evidence)."""
    from image_caption_tpu.decode import engine

    module, variables = module_and_vars
    imgs = np.random.default_rng(5).normal(size=(8, 224, 224, 3)).astype(np.float32)
    # Sharpen the vocab head: a random-init model's near-flat logits make beam
    # candidate ranks tie at float-noise level, and TP's different reduction
    # order can legitimately flip such ties.  x10 logits separate the ranks so
    # the test checks SPMD program equivalence, not tie-breaking luck.
    params = jax.tree_util.tree_map_with_path(
        lambda path, x: x * 10.0 if any(getattr(k, "key", None) == "fc_out" for k in path) else x,
        variables["params"],
    )
    rep_vars = {"params": params, "batch_stats": variables.get("batch_stats", {})}
    memory = module.apply(rep_vars, jnp.asarray(imgs), method=module.encode)
    mem_np = np.asarray(memory)
    ref = np.asarray(
        engine.beam_search_decode(
            module, rep_vars, jnp.asarray(mem_np), start_id=START, end_id=END,
            max_len=12, beam_size=3,
        )
    )
    assert ref.shape == (8, 12)

    # DP: batch-sharded memory over 8 devices, replicated params
    dp_mesh = make_mesh((8, 1))
    with jax.set_mesh(dp_mesh):
        dp = np.asarray(
            engine.beam_search_decode(
                module, rep_vars, jax.device_put(mem_np, batch_sharding(dp_mesh)),
                start_id=START, end_id=END, max_len=12, beam_size=3,
            )
        )
    np.testing.assert_array_equal(dp, ref)

    # DP x TP: 4x2 mesh, params TP-sharded per pattern rules
    mesh = make_mesh((4, 2))
    tp_vars = {
        "params": jax.device_put(params, param_shardings(params, mesh)),
        "batch_stats": jax.device_put(
            variables.get("batch_stats", {}),
            jax.sharding.NamedSharding(mesh, P()),
        ),
    }
    with jax.set_mesh(mesh):
        mem_tp = module.apply(tp_vars, jnp.asarray(imgs), method=module.encode)
        tp = np.asarray(
            engine.beam_search_decode(
                module, tp_vars, jax.device_put(mem_tp, batch_sharding(mesh)),
                start_id=START, end_id=END, max_len=12, beam_size=3,
            )
        )
    # TP changes matmul reduction order (psum of partials), which can
    # legitimately flip float-level candidate ties mid-search, so token
    # equality is not the invariant — equal-quality beams are.  Re-score both
    # picks under the replicated model: the TP pick must score at least as
    # well as the unsharded pick (within float noise).
    def seq_scores(tokens):
        toks = jnp.asarray(tokens)
        lengths = engine.sequence_lengths(toks, END)
        logits = module.apply(rep_vars, toks, jnp.asarray(mem_np), lengths, method=module.decode_train)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        lp = jnp.take_along_axis(logp, toks[:, 1:, None], axis=-1)[..., 0]
        mask = jnp.arange(lp.shape[1])[None, :] < (lengths[:, None] - 1)
        return np.asarray(jnp.sum(lp * mask, axis=1))

    s_tp, s_ref = seq_scores(tp), seq_scores(ref)
    assert np.all(s_tp >= s_ref - 2e-2), (s_tp, s_ref)
    # and most rows should still agree token-for-token
    agree = np.mean(np.all(tp == ref, axis=1))
    assert agree >= 0.75, f"only {agree:.0%} of TP beam rows match unsharded"


# ---------------------------------------------------------------------------
# Multi-host seam (process-count=1 degenerate paths)
# ---------------------------------------------------------------------------


def test_initialize_distributed_single_process_noop():
    from image_caption_tpu.parallel import mesh as M

    # no coordinator configured anywhere -> no-op, backend untouched
    assert M.initialize_distributed() is False
    assert jax.process_count() == 1


def test_process_batch_slice_degenerate_and_divisibility(monkeypatch):
    from image_caption_tpu.parallel import mesh as M

    sl = M.process_batch_slice(32)
    assert (sl.start, sl.stop) == (0, 32)  # single process owns the whole batch

    # simulate process 2-of-4 to check the per-host slice + divisibility guard
    monkeypatch.setattr(M.jax, "process_count", lambda: 4)
    monkeypatch.setattr(M.jax, "process_index", lambda: 2)
    sl = M.process_batch_slice(32)
    assert (sl.start, sl.stop) == (16, 24)
    with pytest.raises(AssertionError):
        M.process_batch_slice(33)  # must divide by process_count


def test_shard_batch_matches_process_local_assembly():
    """device_put path and make_array_from_process_local_data must build the
    same global array when process_count == 1 (the multi-host code path run
    degenerately)."""
    mesh = make_mesh((8, 1))
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    via_put = shard_batch({"x": x}, mesh)["x"]
    via_local = jax.make_array_from_process_local_data(batch_sharding(mesh), x)
    assert via_put.sharding.is_equivalent_to(via_local.sharding, x.ndim)
    np.testing.assert_array_equal(np.asarray(via_put), np.asarray(via_local))


@pytest.mark.slow
def test_multihost_two_process_dcn_seam():
    """The multi-process branch EXECUTES for real: 2 spawned processes (CPU
    backend, gloo collectives, localhost coordinator) build one global 8-device
    mesh, each loads its process_batch_slice, assembles via shard_batch's
    make_array_from_process_local_data branch, runs one DP train step, and the
    loss matches the single-process control (scripts/test_multihost.py)."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "test_multihost.py")],
        capture_output=True, text=True, timeout=900, cwd=root,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "MULTIHOST OK" in r.stdout
