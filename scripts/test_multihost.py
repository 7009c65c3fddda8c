"""Execute the multi-process (DCN) seam for real: 2 processes, one global mesh.

The reference has no distributed backend at all (SURVEY §2.9; single
``cuda``-else-``cpu`` device, train_vit_transformer.py:290).  The TPU-native
equivalent is ``jax.distributed.initialize`` + one global Mesh; this script
proves the seam EXECUTES rather than exists: it spawns two local processes
(CPU backend, 4 virtual devices each, gloo cross-process collectives), each
process

  1. wires into the cluster via ``parallel.mesh.initialize_distributed``
     (localhost coordinator),
  2. builds the GLOBAL 8-device mesh,
  3. loads only ITS rows of the global batch (``process_batch_slice``),
  4. assembles global arrays via ``shard_batch`` — the
     ``jax.make_array_from_process_local_data`` branch that single-process
     runs never reach (parallel/mesh.py),
  5. runs one DP train step (XLA psum over the gloo transport = the DCN
     analog) and prints the loss.

The parent then runs the identical step single-process (8 virtual devices)
and asserts all three losses agree bit-for-bit-ish (<=1e-5): the distributed
data path is numerically the same program.

Usage: python scripts/test_multihost.py            # parent: spawn + verify
       (workers are spawned internally with --worker)
"""

import argparse
import os
import re
import socket
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PROCS = 2
DEVS_PER_PROC = 4
GLOBAL_BATCH = 8


def run_step(process_id, num_processes, port):
    """One DP train step over the global mesh; returns the (replicated) loss."""
    from image_caption_tpu.utils.platform import force_cpu

    force_cpu(num_devices=DEVS_PER_PROC if num_processes > 1 else DEVS_PER_PROC * N_PROCS)

    import jax

    if num_processes > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        from image_caption_tpu.parallel.mesh import initialize_distributed

        assert initialize_distributed(
            coordinator_address=f"localhost:{port}",
            num_processes=num_processes,
            process_id=process_id,
        )
        assert jax.process_count() == num_processes

    import numpy as np

    import jax.numpy as jnp

    from image_caption_tpu.models.runtime import build_module
    from image_caption_tpu.parallel.mesh import make_mesh, process_batch_slice, shard_batch
    from image_caption_tpu.train import steps as S
    from image_caption_tpu.train.optim import make_optimizer

    assert len(jax.devices()) == DEVS_PER_PROC * N_PROCS  # global view
    mesh = make_mesh((DEVS_PER_PROC * N_PROCS, 1))  # pure DP

    module = build_module(
        109,
        dict(
            model_type="grid_transformer", d_model=32, nhead=4, num_decoder_layers=1,
            num_encoder_layers=1, dim_feedforward=64, dropout=0.1, max_len=54,
            resnet_stages=(1, 1, 1, 1),
        ),
    )
    rng = jax.random.PRNGKey(0)
    variables = module.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 4), jnp.int32), jnp.array([4], jnp.int32),
    )
    tx = make_optimizer(1e-3, kind="adam", clip_norm=1.0)
    step_fn = S.make_train_step(module, tx, loss_kind="ce", pad_id=0, augment="baseline")
    state = S.create_train_state(variables, tx)

    # Every process generates the same GLOBAL batch deterministically, then
    # keeps only its slice — the per-host input pipeline contract.
    g = np.random.default_rng(7)
    cap = g.integers(1, 100, size=(GLOBAL_BATCH, 52)).astype(np.int32)
    cap[:, 0] = 107
    cap[:, -1] = 108
    batch = {
        "image": g.integers(0, 255, size=(GLOBAL_BATCH, 256, 256, 3)).astype(np.uint8),
        "caption": cap,
        "length": np.full((GLOBAL_BATCH,), 52, dtype=np.int32),
    }
    if num_processes > 1:
        sl = process_batch_slice(GLOBAL_BATCH)
        batch = {k: v[sl] for k, v in batch.items()}
    sharded = shard_batch(batch, mesh)
    assert sharded["image"].shape[0] == GLOBAL_BATCH  # global shape either way
    with jax.set_mesh(mesh):
        state, metrics = step_fn(state, sharded, jax.random.PRNGKey(1))
    return float(metrics["loss"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--single", action="store_true")
    args = ap.parse_args()

    if args.single:
        print(f"LOSS {run_step(0, 1, None):.8f}")
        return
    if args.worker is not None:
        loss = run_step(args.worker, N_PROCS, args.port)
        print(f"LOSS {loss:.8f}")
        return

    # ---- parent: spawn workers, then the single-process control ------------
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    me = os.path.abspath(__file__)
    procs = [
        subprocess.Popen(
            [sys.executable, me, "--worker", str(i), "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(me)),
        )
        for i in range(N_PROCS)
    ]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        if p.returncode != 0:
            print(out)
            raise SystemExit(f"worker {i} failed rc={p.returncode}")
    losses = [float(re.search(r"LOSS ([\d.]+)", o).group(1)) for o in outs]

    ctrl = subprocess.run(
        [sys.executable, me, "--single"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(me)), timeout=600,
    )
    if ctrl.returncode != 0:
        print(ctrl.stdout)
        raise SystemExit(f"single-process control failed rc={ctrl.returncode}")
    ref = float(re.search(r"LOSS ([\d.]+)", ctrl.stdout).group(1))

    print(f"worker losses: {losses}, single-process: {ref}")
    assert abs(losses[0] - losses[1]) < 1e-6, "workers disagree"
    assert abs(losses[0] - ref) < 1e-5, "distributed != single-process"
    print(f"MULTIHOST OK: {N_PROCS} processes x {DEVS_PER_PROC} devices, "
          f"global mesh 8x1, loss {losses[0]:.6f} == single-process {ref:.6f}")


if __name__ == "__main__":
    main()
