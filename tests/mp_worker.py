"""Multi-process data-parallel training worker (launched by
test_multiprocess_dp.py as ``python mp_worker.py <proc_id> <nproc> <port>
<out.npz>``).

Exercises the real multi-host wiring end to end: gloo CPU collectives via
``jax.distributed.initialize``, a mesh over the GLOBAL devices, per-process
contiguous batch rows through ``BatchLoader(local_rows=...)``,
``shard_batch(global_batch=...)`` assembling the global array, replicated
train state, and the process-0 ``fetch_replicated`` checkpoint fetch — the
DCN replacement for the reference's single-node nn.DataParallel
(step/train_cam.py:62; SURVEY 2.7 TPU-equivalents)."""

import sys

import numpy as np

N_IMAGES = 24
GLOBAL_BATCH = 8
N_STEPS = 6  # 2 epochs x 3 steps: crosses an epoch reshuffle
IMG = 32


class SynthDataset:
    """Deterministic per-index samples (identical on every process)."""

    def __len__(self):
        return N_IMAGES

    def __getitem__(self, i):
        r = np.random.default_rng(1000 + int(i))
        img = r.standard_normal((IMG, IMG, 3)).astype(np.float32)
        label = (r.random(20) < 0.2).astype(np.float32)
        return {"img": img, "label": label}


def run_training(out_path: str) -> None:
    """The training loop both sides (1-process x 8 devices and
    2-process x 4) run identically; parity of out_path contents is the
    test's assertion."""
    import jax

    from irn_tpu.data import loader as loader_mod
    from irn_tpu.models.cam import CAMNet
    from irn_tpu.parallel import mesh as mesh_mod
    from irn_tpu.train import cam_train, optim
    from irn_tpu.train.state import create_train_state

    model = CAMNet(n_classes=20)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, IMG, IMG, 3), np.float32),
        train=True,
    )
    tx = optim.poly_sgd(0.01, max_step=N_STEPS, mult_fn=optim.cam_lr_mult)
    state = create_train_state(variables, tx)

    mesh = mesh_mod.mesh_for_batch(GLOBAL_BATCH)
    local_rows = mesh_mod.local_batch_slice(mesh, GLOBAL_BATCH)
    multi = jax.process_count() > 1
    dl = loader_mod.BatchLoader(
        SynthDataset(), GLOBAL_BATCH, shuffle=True, drop_last=True,
        num_workers=2, seed=7, local_rows=local_rows if multi else None,
    )
    state = mesh_mod.replicate(state, mesh)
    step_fn = cam_train.make_train_step(model, tx)

    losses = []
    step = 0
    step_c = None
    for ep in range(100):
        dl.set_epoch(ep)
        for batch in dl:
            sb = mesh_mod.shard_batch(
                {"img": batch["img"], "label": np.stack(batch["label"])},
                mesh, global_batch=GLOBAL_BATCH,
            )
            if step_c is None:
                # the stages' multi-host pattern: AOT compile, then hold
                # every process at a coordination-service barrier so the
                # first gloo collective connects in lockstep
                if multi:
                    step_c = mesh_mod.compile_step(
                        step_fn, state, sb["img"], sb["label"]
                    )
                    mesh_mod.process_barrier("mp_worker_compiled")
                    mesh_mod.warm_collectives(mesh)
                else:
                    step_c = step_fn
            state, metrics = step_c(state, sb["img"], sb["label"])
            losses.append(float(metrics["loss"]))
            step += 1
            if step >= N_STEPS:
                break
        if step >= N_STEPS:
            break

    if jax.process_index() == 0:
        params = mesh_mod.fetch_replicated(state.params)
        flat = {
            "/".join(str(k.key) for k in path): v
            for path, v in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        np.savez(
            out_path,
            losses=np.asarray(losses, np.float64),
            **{f"p:{k}": v for k, v in flat.items()},
        )


def main() -> None:
    proc_id, nproc, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=proc_id,
    )
    assert len(jax.devices()) == 8, jax.devices()
    run_training(out_path)
    print(f"[{proc_id}] done", flush=True)


if __name__ == "__main__":
    main()
