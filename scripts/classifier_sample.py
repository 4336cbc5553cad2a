"""Classifier-guided sampling.

The reference ships the classifier factory (script_util.py:228-266) and the
guidance hooks (gaussian_diffusion.py:356-393) but no driver script (it was
dropped from the upstream fork). This script completes the surface: sample
class-conditional volumes/images guided by grad log p(y|x) from an
EncoderUNetModel classifier.
"""

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

from ddpm3d_tpu.models.factory import (
    create_classifier,
    create_model_and_diffusion,
)
from ddpm3d_tpu.utils import checkpoint as ckpt
from ddpm3d_tpu.utils import logger
from ddpm3d_tpu.utils.cache import enable_compilation_cache
from ddpm3d_tpu.utils.config import (
    add_dict_to_argparser,
    args_to_dict,
    classifier_defaults,
    model_and_diffusion_defaults,
)


def main():
    args = create_argparser().parse_args()

    from ddpm3d_tpu.ops.quant import int8_enabled

    if int8_enabled():
        # guidance is grad_x log p(y|x) THROUGH the classifier's convs;
        # quantization rounding has zero gradient, so int8 would silently
        # null the guidance term rather than degrade it
        raise RuntimeError(
            "DDPM3D_INT8 is incompatible with classifier guidance (the "
            "guidance gradient dies through quantization rounding). Unset "
            "it, or exclude every classifier conv via DDPM3D_INT8_EXCLUDE."
        )
    logger.configure(args.save_dir or None)
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from ddpm3d_tpu.diffusion import ddim_sample_loop, p_sample_loop

    logger.log("creating model and diffusion...")
    model, sched, cfg = create_model_and_diffusion(
        **args_to_dict(args, model_and_diffusion_defaults().keys())
    )
    classifier = create_classifier(
        **args_to_dict(args, classifier_defaults().keys())
    )

    size = args.image_size
    shape = (args.batch_size, size, size, 3)

    with jax.default_device(jax.devices("cpu")[0]):
        # the UNet's params are spatial-size-invariant, but the classifier's
        # AttentionPool positional embedding is sized by the bottom token
        # count (reference unet.py:22-51) — init with the REAL image size
        xi = jnp.zeros((1, size, size, 3), jnp.float32)
        t0 = jnp.zeros((1,), jnp.int32)
        y0 = jnp.zeros((1,), jnp.int32) if args.class_cond else None
        mvars = model.init(jax.random.key(0), xi, t0, y=y0)
        cvars = classifier.init(jax.random.key(1), xi, t0)
    params = (
        ckpt.load_pytree(args.model_path, target=mvars["params"])
        if args.model_path
        else mvars["params"]
    )
    cls_params = (
        ckpt.load_pytree(args.classifier_path, target=cvars["params"])
        if args.classifier_path
        else cvars["params"]
    )

    def sample_batch(params, cls_params, key, y):
        def model_fn(x, t, **kw):
            if args.class_cond:
                return model.apply({"params": params}, x, t, y=y)
            return model.apply({"params": params}, x, t)

        def cond_fn(x, t, **kw):
            # grad_x [log p(y|x)] * scale (Dhariwal & Nichol guidance)
            def logp(xx):
                logits = classifier.apply({"params": cls_params}, xx, t)
                logprobs = jax.nn.log_softmax(logits, axis=-1)
                return jnp.sum(
                    jnp.take_along_axis(logprobs, y[:, None], axis=1)
                )

            return jax.grad(logp)(x) * args.classifier_scale

        loop = ddim_sample_loop if args.use_ddim else p_sample_loop
        return loop(
            key, model_fn, sched, cfg, shape=shape,
            clip_denoised=args.clip_denoised, cond_fn=cond_fn,
        )

    jitted = jax.jit(sample_batch)
    key = jax.random.key(args.seed)
    all_images, all_labels = [], []
    while len(all_images) * args.batch_size < args.num_samples:
        key, sub, ykey = jax.random.split(key, 3)
        y = jax.random.randint(ykey, (args.batch_size,), 0, 1000)
        sample = jitted(params, cls_params, sub, y)
        all_images.append(np.asarray(sample))
        all_labels.append(np.asarray(y))
        logger.log(f"created {len(all_images) * args.batch_size} samples")

    arr = np.concatenate(all_images)[: args.num_samples]
    labels = np.concatenate(all_labels)[: args.num_samples]
    if jax.process_index() == 0:
        out = os.path.join(
            logger.get_dir(), f"samples_{'x'.join(map(str, arr.shape))}.npz"
        )
        logger.log(f"saving to {out}")
        np.savez(out, arr, labels)
    logger.log("sampling complete")


def create_argparser():
    defaults = dict(
        save_dir="",
        clip_denoised=True,
        num_samples=4,
        batch_size=1,
        use_ddim=False,
        model_path="",
        classifier_path="",
        classifier_scale=1.0,
        seed=0,
    )
    defaults.update(model_and_diffusion_defaults())
    defaults.update(classifier_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
