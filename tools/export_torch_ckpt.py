"""Convert a ddpm3d_tpu msgpack checkpoint to a reference-loadable .pt.

Closes the migration loop: checkpoints trained by scripts/train.py load
directly into the PyTorch reference's models (reference train_util.py's
``model{step:06d}.pt`` naming convention applies to the output if you
name it that way).

Run: python tools/export_torch_ckpt.py --ckpt /path/model012000.msgpack \
        --out /path/model012000.pt
"""

import argparse
import os
import sys

sys.path.append(os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="msgpack params checkpoint")
    ap.add_argument("--out", required=True, help="output .pt path")
    ap.add_argument(
        "--keep_superres_wrap", action="store_true",
        help="do NOT unwrap the SuperResModel 'unet' nesting "
             "(for checkpoints of bare UNet/Encoder models there is "
             "nothing to unwrap and this flag is irrelevant)")
    args = ap.parse_args()

    from ddpm3d_tpu.utils import checkpoint as ckpt_io
    from ddpm3d_tpu.utils.torch_export import save_torch_checkpoint

    params = ckpt_io.load_pytree(args.ckpt)
    save_torch_checkpoint(
        params, args.out, unwrap_superres=not args.keep_superres_wrap
    )
    print(f"exported {args.ckpt} -> {args.out}")


if __name__ == "__main__":
    main()
