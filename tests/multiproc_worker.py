"""Worker for the 2-process jax.distributed integration test.

Launched by tests/test_multiprocess.py (and usable manually):

    python tests/multiproc_worker.py --coordinator localhost:PORT \
        --num_processes 2 --process_id I --workdir /tmp/xyz

Exercises the multi-process regime the reference ships via mpiexec
(/root/reference/test_DDPM_3d_mpi.sh:5, dist_util.py:22-47) on the
JAX-native bootstrap: a global 2-process CPU mesh, a sharded train step,
process-0-only checkpoint writes, per-rank logger suffixes, and
cross-process weighted metric means.
"""

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.abspath(osp.join(osp.dirname(__file__), "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--workdir", required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ddpm3d_tpu.diffusion import (
        DiffusionConfig, LossType, MeanType, VarType, cosine_beta_schedule,
        make_schedule, training_losses,
    )
    from ddpm3d_tpu.models import SuperResModel
    from ddpm3d_tpu.parallel import mesh as pmesh
    from ddpm3d_tpu.utils import checkpoint, logger

    rank = jax.process_index()
    nproc = jax.process_count()
    assert nproc == args.num_processes, (nproc, args.num_processes)
    ndev = len(jax.devices())
    result = {"rank": rank, "nproc": nproc, "global_devices": ndev}

    # --- per-rank logger configuration (reference logger.py:457-467) ---
    logdir = osp.join(args.workdir, "logs")
    logger.configure(dir=logdir)
    logger.log(f"process {rank}/{nproc} up with {ndev} global devices")

    # --- sharded train step over the global mesh ---
    mesh = pmesh.make_mesh()
    model = SuperResModel(
        in_channels=1, model_channels=32, out_channels=2, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), dims=3,
        use_scale_shift_norm=True, resblock_updown=True,
        middle_attention=False,
    )
    B = ndev  # one sample per global device
    x = jnp.ones((1, 8, 16, 16, 1), jnp.float32)
    params = model.init(jax.random.key(0), x, jnp.zeros((1,), jnp.int32),
                        low_res=x)
    params = pmesh.replicate(mesh, params)

    sched = make_schedule(cosine_beta_schedule(16))
    cfg = DiffusionConfig(
        MeanType.EPSILON, VarType.LEARNED_RANGE, LossType.MSE,
        original_num_steps=16,
    )
    tx = optax.adamw(1e-4)
    opt_state = pmesh.replicate(mesh, tx.init(params))

    # global batch sharded over the data axis: every process contributes
    # the SAME global array view (single-controller semantics)
    rng = np.random.default_rng(0)
    batch_np = rng.normal(size=(B, 8, 16, 16, 1)).astype(np.float32)
    low_np = rng.normal(size=(B, 8, 16, 16, 1)).astype(np.float32)
    from jax.experimental import multihost_utils

    gsh = pmesh.data_sharding(mesh)
    batch = multihost_utils.host_local_array_to_global_array(
        batch_np[rank::nproc], mesh, gsh.spec
    )
    low = multihost_utils.host_local_array_to_global_array(
        low_np[rank::nproc], mesh, gsh.spec
    )

    def loss_fn(p, xb, lowb):
        model_fn = lambda xx, tt, **kw: model.apply(p, xx, tt, **kw)
        t = jnp.zeros((xb.shape[0],), jnp.int32) + 3
        noise = jnp.zeros_like(xb)
        terms = training_losses(
            jax.random.key(1), model_fn, sched, cfg, xb, t,
            model_kwargs={"low_res": lowb}, noise=noise,
        )
        return terms["loss"].mean()

    @jax.jit
    def train_step(p, o, xb, lowb):
        loss, grads = jax.value_and_grad(loss_fn)(p, xb, lowb)
        updates, o = tx.update(grads, o, p)
        return loss, optax.apply_updates(p, updates), o

    loss, params, opt_state = train_step(params, opt_state, batch, low)
    loss = float(loss)
    assert np.isfinite(loss), loss
    result["loss"] = loss

    # --- process-0-only checkpoint write (reference train_util.py:253-267) ---
    ckdir = osp.join(args.workdir, "ckpt")
    host_params = jax.tree_util.tree_map(
        lambda a: np.asarray(jax.device_get(a)), params
    )
    checkpoint.save_train_checkpoint(ckdir, 7, host_params, {}, None)
    # a rank-tagged write proves non-zero ranks are no-ops
    checkpoint.save_pytree(
        osp.join(args.workdir, f"rankfile_{rank}.msgpack"), {"r": rank}
    )

    # --- cross-process weighted means (reference logger.py:412-439) ---
    wm = logger.gather_weighted_means(
        {"metric": float(rank + 1)}, {"metric": rank + 1}
    )
    result["weighted_mean"] = wm["metric"]

    logger.logkv("rank", rank)
    logger.logkv_mean("loss", loss)
    logger.dumpkvs()

    multihost_utils.sync_global_devices("done")
    with open(osp.join(args.workdir, f"result_{rank}.json"), "w") as f:
        json.dump(result, f)
    print(f"WORKER {rank} OK", flush=True)


if __name__ == "__main__":
    main()
