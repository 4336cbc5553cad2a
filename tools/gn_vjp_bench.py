"""Microbenchmark: GroupNorm(+FiLM+SiLU) backward — autodiff vs custom VJP.

The train-step trace (tools/profile_train.py) shows the GN backward lowering
to multi-output fusions (four per-channel reductions + the full d_x tensor in
ONE fusion) running ~20x off HBM bandwidth — 21.4 ms for the worst 96^3x128
site. This harness times forward+backward through a single GN site at the
flagship L0 shape for (a) the autodiff backward and (b) the hand-derived
custom VJP (models/nn.py: group_norm_f32 with DDPM3D_GN_VJP=custom), using
the two-point chained-scan slope method (timing discipline: depend on the
full output, never a slice; see README "measurement trap").

Run on TPU: python tools/gn_vjp_bench.py [n_chain]
"""

import os
import sys
import time

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(f, *args, n_lo=2, n_hi=8):
    """Two-point slope of a chained scan: isolates per-iteration device time
    from the ~25-30 ms relay dispatch overhead."""

    def chain(n):
        def body(c, _):
            out = f(*((c,) + args[1:]))
            # depend on every output element so XLA cannot dead-code or
            # slice through the computation
            return c + 1e-6 * jnp.sum(out).astype(c.dtype), None

        jitted = jax.jit(
            lambda x0: jax.lax.scan(body, x0, None, length=n)[0]
        )
        r = jitted(args[0])
        float(jnp.sum(r))  # warm/compile
        t0 = time.monotonic()
        float(jnp.sum(jitted(args[0])))
        return time.monotonic() - t0

    t_lo, t_hi = chain(n_lo), chain(n_hi)
    return (t_hi - t_lo) / (n_hi - n_lo) * 1e3  # ms/iter


def main():
    from ddpm3d_tpu.models import nn as M

    R, H, W, C = 96, 96, 96, 128  # flagship L0, folded (B=1, D=96)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (R, H, W, C), jnp.bfloat16)
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    fs = 0.1 * jnp.ones((1, C), jnp.float32)
    fh = 0.1 * jnp.ones((1, C), jnp.float32)

    def loss(x, scale, bias, fs, fh):
        out = M.group_norm_f32(
            x, scale, bias, film_scale=fs, film_shift=fh,
            apply_silu=True, fold_batch=1,
        )
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=(0, 1, 2, 3, 4))

    def run(x):
        g = grad(x, scale, bias, fs, fh)
        # collapse to one array so the chain can depend on everything
        return g[0].astype(jnp.float32) + sum(
            jnp.sum(t) for t in g[1:]
        )

    for mode in ("auto", "custom"):
        os.environ["DDPM3D_GN_VJP"] = mode
        jax.clear_caches()
        ms = time_fn(run, x)
        print(f"GN fwd+bwd [{R},{H},{W},{C}] film+silu fold  "
              f"{mode:7s}: {ms:8.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
