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
    ap.add_argument("--scenario", default="basic", choices=["basic", "full"],
                    help="basic: 1 sharded step + writer policies (the "
                         "round-2 test). full: multi-step training over a "
                         "data x spatial mesh + checkpoint save/resume "
                         "equivalence + a sharded inference chain — the "
                         "topology where rank bugs actually manifest")
    ap.add_argument("--spatial", type=int, default=1,
                    help="spatial mesh axis size (scenario=full)")
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

    if args.scenario == "full":
        scenario_full(args, rank, nproc, ndev, result)
        return

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


def scenario_full(args, rank, nproc, ndev, result):
    """Multi-process scenario at a topology where rank bugs manifest:
    N processes x M local devices, a (data x spatial) mesh, several REAL
    production train steps (training/train_loop.py make_train_step: t
    sampling, q_sample, NaN guard, AdamW, EMA), a mid-run checkpoint
    save + resume proved bit-identical to the uninterrupted branch, a
    sharded inference chain, and the per-rank writer policies. Replaces
    the reference's `mpiexec -n 6` regime (test_DDPM_3d_mpi.sh:5,
    dist_util.py:22-47) at real multi-process scale."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from ddpm3d_tpu.diffusion import (
        DiffusionConfig, LossType, MeanType, VarType, cosine_beta_schedule,
        make_schedule, p_sample_loop,
    )
    from ddpm3d_tpu.models import SuperResModel
    from ddpm3d_tpu.parallel import mesh as pmesh
    from ddpm3d_tpu.training import TrainState, make_optimizer, make_train_step
    from ddpm3d_tpu.utils import checkpoint, logger

    workdir = args.workdir
    logdir = osp.join(workdir, "logs")
    logger.configure(dir=logdir)
    logger.log(f"[full] process {rank}/{nproc} up, {ndev} global devices")

    mesh = pmesh.make_mesh(n_spatial=args.spatial)
    n_data = ndev // args.spatial

    model = SuperResModel(
        in_channels=1, model_channels=32, out_channels=2, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), dims=3,
        use_scale_shift_norm=True, resblock_updown=True,
        middle_attention=False,
    )
    T = 16
    sched = make_schedule(cosine_beta_schedule(T))
    cfg = DiffusionConfig(
        MeanType.EPSILON, VarType.LEARNED_RANGE, LossType.MSE,
        original_num_steps=T,
    )

    B, D, H, W = n_data, 8, 16, 16
    x0 = jnp.ones((1, D, H, W, 1), jnp.float32)
    variables = model.init(
        jax.random.key(0), x0, jnp.zeros((1,), jnp.int32), low_res=x0
    )
    params_host = jax.device_get(variables["params"])

    tx = make_optimizer(1e-3, weight_decay=0.0, lr_anneal_steps=0)
    ema_rates = (0.99,)
    train_step = jax.jit(make_train_step(
        model.apply, sched, cfg, tx, ema_rates=ema_rates
    ))

    def fresh_state(p_host, opt_host=None, ema_host=None, step=0):
        params = pmesh.replicate(mesh, p_host)
        opt = pmesh.replicate(
            mesh, opt_host if opt_host is not None else tx.init(p_host)
        )
        ema = pmesh.replicate(
            mesh, ema_host if ema_host is not None else p_host
        )
        return TrainState(
            step=jnp.asarray(step, jnp.int32), params=params,
            opt_state=opt, ema_params=(ema,), sampler_state=None,
        )

    state = fresh_state(params_host)

    # global batch: every process holds its slice, single-controller view
    gsh = pmesh.data_sharding(mesh, spatial_dim=2)  # H sharded over spatial

    def global_batch(seed):
        r = np.random.default_rng(seed)
        xb = r.normal(size=(B, D, H, W, 1)).astype(np.float32)
        lb = r.normal(size=(B, D, H, W, 1)).astype(np.float32)
        to_g = lambda a: multihost_utils.host_local_array_to_global_array(
            a[rank::nproc], mesh, gsh.spec
        )
        return to_g(xb), to_g(lb)

    key = jax.random.key(11)
    losses = []
    for i in range(2):
        xb, lb = global_batch(100 + i)
        state, metrics = train_step(state, xb, {"low_res": lb}, key)
        losses.append(float(jnp.mean(metrics["loss"])))
        assert np.isfinite(losses[-1]), losses

    # --- checkpoint at step 2 (process-0 writer), then resume ---
    ckdir = osp.join(workdir, "ckpt")
    to_host = lambda t: jax.tree_util.tree_map(
        lambda a: np.asarray(jax.device_get(a)), t
    )
    checkpoint.save_train_checkpoint(
        ckdir, 2, to_host(state.params),
        {"0.99": to_host(state.ema_params[0])}, to_host(state.opt_state),
    )
    multihost_utils.sync_global_devices("ckpt_written")

    loaded_p = checkpoint.load_pytree(
        osp.join(ckdir, "model000002.msgpack"), target=params_host
    )
    loaded_e = checkpoint.load_pytree(
        osp.join(ckdir, "ema_0.99_000002.msgpack"), target=params_host
    )
    loaded_o = checkpoint.load_pytree(
        osp.join(ckdir, "opt000002.msgpack"), target=tx.init(params_host)
    )
    resumed = fresh_state(loaded_p, opt_host=loaded_o, ema_host=loaded_e,
                          step=2)

    # one more step on BOTH branches: resumed must match uninterrupted
    xb, lb = global_batch(102)
    state, m_cont = train_step(state, xb, {"low_res": lb}, key)
    resumed, m_res = train_step(resumed, xb, {"low_res": lb}, key)
    losses.append(float(jnp.mean(m_cont["loss"])))

    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        to_host(state.params), to_host(resumed.params),
    )
    resume_max_diff = max(jax.tree_util.tree_leaves(diffs))
    result["losses"] = losses
    result["resume_max_diff"] = resume_max_diff

    # --- sharded inference chain on the post-train EMA params ---
    ema_final = state.ema_params[0]

    def model_fn(xx, tt, **kw):
        return model.apply({"params": ema_final}, xx, tt, **kw)

    r = np.random.default_rng(55)
    x_T = r.normal(size=(B, D, H, W, 1)).astype(np.float32)
    low = r.normal(size=(B, D, H, W, 1)).astype(np.float32)
    to_g = lambda a: multihost_utils.host_local_array_to_global_array(
        a[rank::nproc], mesh, gsh.spec
    )
    out = p_sample_loop(
        jax.random.key(5), model_fn, sched, cfg,
        noise=to_g(x_T), model_kwargs={"low_res": to_g(low)},
    )
    # replicate the sharded result so every process holds the full array
    # (XLA all-gather over the mesh, then one addressable replica shard)
    gather = jax.jit(lambda a: a, out_shardings=pmesh.replicated(mesh))
    out_full = np.asarray(gather(out).addressable_data(0))
    result["infer_checksum"] = float(np.sum(np.abs(out_full)))
    if rank == 0:
        np.save(osp.join(workdir, "infer.npy"), out_full)

    # --- cross-process weighted means at N ranks ---
    wm = logger.gather_weighted_means(
        {"metric": float(rank + 1)}, {"metric": rank + 1}
    )
    result["weighted_mean"] = wm["metric"]

    logger.logkv("rank", rank)
    logger.logkv_mean("loss", losses[-1])
    logger.dumpkvs()

    multihost_utils.sync_global_devices("done")
    with open(osp.join(workdir, f"result_{rank}.json"), "w") as f:
        json.dump(result, f)
    print(f"WORKER {rank} OK", flush=True)


if __name__ == "__main__":
    main()
