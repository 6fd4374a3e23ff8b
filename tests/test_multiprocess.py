"""Multi-PROCESS execution tests — the ``jax.process_count() > 1`` branches.

The reference's actual deployment mode is multi-node DDP with an env://
rendezvous (train_caption.py:27-28; configs/detection/train_config.yaml:5-6
implies 8x8 = 64-way).  Our equivalents live in:

- ``parallel/distributed.py`` — ``maybe_initialize`` / ``sync_hosts`` /
  ``is_main_process`` (the rendezvous + barrier + master-rank helpers);
- ``parallel/mesh.py::shard_batch`` — the
  ``make_array_from_process_local_data`` assembly of per-process slices;
- ``detection/coco_eval.py::synchronize_between_processes`` — the eval merge
  (reference: pickled NCCL all_gather, engine/utils.py:102-142).

SURVEY.md section 4: the reference exercises distributed paths only by
actually spawning local processes — same here: each test launches N
subprocesses over a localhost coordinator (CPU backend, 2 virtual devices
per process) and asserts the multi-process results equal a single-process
run bit-for-bit (up to f32 reduction-order noise).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NPROC = 2
LOCAL_DEVICES = 2
PAD, BOS = 1, 2


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _case():
    """Deterministic toy model + RAGGED global batch (6 rows over 4 devices:
    each process's 3-row slice pads to 4 -> exercises the multi-host pad
    path).  Importable identically by the pytest process and the workers."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    class Toy(nn.Module):
        vocab: int = 12

        @nn.compact
        def __call__(self, samples, seq, *, deterministic=True):
            # 'detector' in the path exercises the backbone param-group split
            feat = nn.Dense(8, name="detector_proj")(samples)
            tok = nn.Embed(self.vocab, 8, name="tok")(seq)
            h = tok + feat[:, None, :]
            return nn.log_softmax(nn.Dense(self.vocab, name="head")(h))

    model = Toy()
    rng = np.random.RandomState(0)
    samples = rng.rand(6, 5).astype(np.float32)
    caps = np.concatenate(
        [np.full((6, 1), BOS), rng.randint(4, 12, (6, 4)), np.full((6, 1), 3)],
        axis=1,
    ).astype(np.int32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(samples), jnp.asarray(caps)
    )
    return model, params, samples, caps


def _coco_case():
    gt = {
        i: {
            "boxes": np.asarray([[0.0, 0.0, 10.0, 10.0]], np.float64),
            "labels": np.asarray([1]),
        }
        for i in range(2 * NPROC)
    }
    det = {
        "scores": np.asarray([0.9]),
        "labels": np.asarray([1]),
        "boxes": np.asarray([[0.0, 0.0, 10.0, 10.0]]),
    }
    return gt, det


def _sched():
    return dict(num_epochs=2, num_its_per_epoch=10, init_lr=1e-3,
                min_lr=1e-4, warmup_init_lr=1e-4)


def _worker(rank: int, nproc: int, port: int, outdir: str) -> None:
    import jax

    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=rank,
    )
    import jax.numpy as jnp

    from grit_tpu.detection.coco_eval import CocoEvaluator
    from grit_tpu.engine.optim import build_optimizer
    from grit_tpu.engine.xe import TrainState, make_eval_loss_step, make_xe_train_step
    from grit_tpu.parallel.distributed import is_main_process, sync_hosts
    from grit_tpu.parallel.mesh import make_mesh, shard_batch

    res = {
        "rank": rank,
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "is_main": is_main_process(),
    }

    model, params, samples, caps = _case()
    n = len(samples)
    lo, hi = rank * (n // nproc), (rank + 1) * (n // nproc)
    mesh = make_mesh(n_data=jax.device_count())
    with mesh:
        # each process holds only ITS slice; shard_batch pads the local
        # slice and assembles the global array across processes
        batch = shard_batch(
            {"samples": samples[lo:hi], "captions": caps[lo:hi]}, mesh,
            int_fill=PAD, int_first=BOS,
        )
        res["global_batch_rows"] = int(batch["samples"].shape[0])

        eval_loss = make_eval_loss_step(model, pad_idx=PAD)
        res["eval_loss"] = float(eval_loss(params, batch))

        tx, labels = build_optimizer(params)
        state = TrainState.create(params, tx)
        step = make_xe_train_step(
            model, tx, labels, pad_idx=PAD, sched_cfg=_sched(),
            backbone_lr=1e-4, donate=False,
        )
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        res["xe_loss"] = float(metrics["loss"])
        res["param_l1"] = float(
            sum(np.abs(np.asarray(leaf)).sum() for leaf in jax.tree.leaves(state.params))
        )

    # --- CocoEvaluator cross-process merge -------------------------------
    gt, det = _coco_case()
    ev = CocoEvaluator(gt, cat_ids=[1])
    ev.update([rank * 2, rank * 2 + 1], [det, det])
    ev.synchronize_between_processes()
    res["merged_pred_ids"] = sorted(int(k) for k in ev.preds)
    res["mAP"] = float(ev.summarize()["mAP"])

    sync_hosts("test-done")
    with open(os.path.join(outdir, f"rank{rank}.json"), "w") as f:
        json.dump(res, f)


def test_two_process_branches(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # the sitecustomize would pin axon
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(
        flags + [f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"]
    )
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "worker",
             str(r), str(NPROC), str(port), str(tmp_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for r in range(NPROC)
    ]
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"

    results = []
    for r in range(NPROC):
        with open(tmp_path / f"rank{r}.json") as f:
            results.append(json.load(f))

    # --- single-process reference (this pytest process) ------------------
    import jax
    import jax.numpy as jnp

    from grit_tpu.detection.coco_eval import CocoEvaluator
    from grit_tpu.engine.optim import build_optimizer
    from grit_tpu.engine.xe import TrainState, make_eval_loss_step, make_xe_train_step

    model, params, samples, caps = _case()
    ref_batch = {"samples": jnp.asarray(samples), "captions": jnp.asarray(caps)}
    want_eval = float(make_eval_loss_step(model, pad_idx=PAD)(params, ref_batch))
    tx, labels = build_optimizer(params)
    state = TrainState.create(params, tx)
    step = make_xe_train_step(model, tx, labels, pad_idx=PAD,
                              sched_cfg=_sched(), backbone_lr=1e-4, donate=False)
    state, metrics = step(state, ref_batch, jax.random.PRNGKey(1))
    want_xe = float(metrics["loss"])
    want_l1 = float(
        sum(np.abs(np.asarray(leaf)).sum() for leaf in jax.tree.leaves(state.params))
    )

    gt, det = _coco_case()
    ev = CocoEvaluator(gt, cat_ids=[1])
    ev.update(list(range(2 * NPROC)), [det] * (2 * NPROC))
    want_map = float(ev.summarize()["mAP"])

    for res in results:
        assert res["process_count"] == NPROC
        assert res["device_count"] == NPROC * LOCAL_DEVICES
        assert res["local_device_count"] == LOCAL_DEVICES
        assert res["is_main"] == (res["rank"] == 0)
        # ragged 6-row batch -> every process padded its 3-row slice to 4
        assert res["global_batch_rows"] == NPROC * 4
        # the multi-process sharded losses/updates equal single-process
        np.testing.assert_allclose(res["eval_loss"], want_eval, rtol=1e-6)
        np.testing.assert_allclose(res["xe_loss"], want_xe, rtol=1e-6)
        np.testing.assert_allclose(res["param_l1"], want_l1, rtol=1e-6)
        # eval merge: every rank sees the union of all ranks' predictions
        assert res["merged_pred_ids"] == list(range(2 * NPROC))
        np.testing.assert_allclose(res["mAP"], want_map, rtol=1e-9)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "worker":
    _worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])


def test_two_process_caption_training_e2e(tmp_path):
    """Full train_caption.py over TWO real processes: distributed rendezvous
    via env (COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID -> maybe_initialize),
    rank-sharded train loader, global-mesh XE steps, rank-SPECIALIZED eval
    (valid on rank 0, test on rank 1 — reference train_caption.py:149-179),
    score allgather, and collective Orbax checkpoint saves."""
    port = _free_port()
    base_env = dict(os.environ)
    base_env.pop("PALLAS_AXON_POOL_IPS", None)
    base_env["PALLAS_AXON_POOL_IPS"] = ""
    base_env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f
        for f in base_env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    base_env["XLA_FLAGS"] = " ".join(
        flags + [f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"]
    )
    base_env["PYTHONPATH"] = REPO + os.pathsep + base_env.get("PYTHONPATH", "")
    # self-contained synthetic dataset (this test used to SKIP when a
    # pre-built /tmp/vdata was absent — the round-3 suite's one skip)
    from synth_coco import make_synth_coco

    data_root = tmp_path / "vdata"
    make_synth_coco(data_root)
    base_env["DATA_ROOT"] = str(data_root)
    base_env["COORDINATOR_ADDRESS"] = f"localhost:{port}"
    base_env["NUM_PROCESSES"] = str(NPROC)

    overrides = [
        "exp.name=" + str(tmp_path / "vmp"),
        "model.vocab_size=19", "model.backbone=swin_test",
        "model.grid_feat_dim=64", "model.detector.num_levels=2",
        "dataset.transform_cfg.size=[64, 96]",
        "dataset.transform_cfg.randaug=false",
        "optimizer.batch_size=1", "optimizer.finetune_xe_epochs=1",
        "optimizer.finetune_sc_epochs=0", "model.beam_size=2",
        "model.beam_len=8", "model.max_len=12",
    ]
    procs = []
    for r in range(NPROC):
        env = dict(base_env)
        env["PROCESS_ID"] = str(r)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "train_caption.py")] + overrides,
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = [p.communicate(timeout=1500) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{out[-3000:]}\n{err[-3000:]}"

    # exp.name is an absolute path, so os.path.join("outputs", name) = name
    workdir = str(tmp_path / "vmp")
    csv = os.path.join(workdir, "result.csv")
    assert os.path.exists(csv), "rank 0 wrote no result.csv"
    rows = open(csv).read().strip().splitlines()
    # header + valid + test rows, written ONLY by rank 0
    assert len(rows) == 3, rows
    assert any(" valid" in r for r in rows) and any(" test " in r for r in rows)
    for name in ("last", "best_valid", "best_test", "ft_xe"):
        assert os.path.isdir(os.path.join(workdir, "checkpoints", name)), name
    # each rank ran ITS split's eval (rank-specialization evidence)
    assert "valid scores" in outs[0][0]
    assert "test scores" in outs[1][0]
    assert "test scores" not in outs[0][0]
