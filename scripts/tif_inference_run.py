"""GF-2 x3 / Sentinel-2 x9 tif inference on the reference's own images
(VERDICT r3 item 5).

The reference ships the actual satellite inputs and its mains run
single-image inference on them (main_sradsgan.py:132-135 -> mfe_test_single,
model/sradsgan.py:1603-1639): GF2_LR.tif (85x85, the 255x255 GF2_HR.tif is
its x3 target) and Sentinel2.tif (216x216) at x9.  This script runs our
``mfe_test_single`` protocol through real checkpointed flagship weights at
both scales on the chip, emits SR + bicubic twin + panel, and records wall
time, output checksums, and (for GF-2, where an HR target exists) the
uint8-protocol metrics vs GF2_HR.

At x9 the 216^2 trunk has N=46656 positions — the flash-SGAM path or the
halo-tiled evaluator (evaluation/tiled.py) carries it; pass --tiled to force
tiling.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tif_inference_run.py \
        --x3 <ckpt_x3> --x9 <ckpt_x9> [--outdir /tmp/sradsgan_tif]
"""
import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np

IMG = "/root/reference/SRADSGAN/img"


def sha(path):
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def run_scale(ckpt, scale, image, outdir, hr_target=None):
    import jax
    import jax.numpy as jnp

    from sradsgan_tpu.core.checkpoint import restore_pytree
    from sradsgan_tpu.evaluation.validate import mfe_test_single
    from sradsgan_tpu.models import get_spec

    spec = get_spec("sradsgan")
    gen = spec.generator(scale=scale, dtype=jnp.bfloat16)
    prev = restore_pytree(ckpt)
    variables = {"params": jax.tree.map(jnp.asarray, prev["g_params"])}

    t0 = time.time()
    paths = mfe_test_single(gen, variables, image, scale, outdir)
    wall = time.time() - t0
    row = {"image": os.path.basename(image), "scale": scale,
           "wall_s": round(wall, 1),
           **{k: f"{os.path.basename(v)}:{sha(v)}" for k, v in paths.items()}}

    if hr_target is not None:
        from PIL import Image

        from sradsgan_tpu.metrics.fidelity import (compare_ergas,
                                                   compare_psnr,
                                                   compare_ssim)
        # uint8 protocol, same as _score_pair (reference sradsgan.py:1484-96)
        hr = np.asarray(Image.open(hr_target).convert("RGB"), np.uint8)
        for tag, p in (("sr", paths["sr"]), ("bicubic", paths["bicubic"])):
            out = np.asarray(Image.open(p).convert("RGB"), np.uint8)
            row[f"{tag}_psnr"] = round(compare_psnr(hr, out), 3)
            row[f"{tag}_ssim"] = round(compare_ssim(hr, out), 4)
            row[f"{tag}_ergas"] = round(compare_ergas(hr, out, scale=scale),
                                        3)
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--x3", required=True, help="x3 flagship checkpoint")
    ap.add_argument("--x9", required=True, help="x9 flagship checkpoint")
    ap.add_argument("--outdir", default="/tmp/sradsgan_tif")
    args = ap.parse_args()

    from sradsgan_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    os.makedirs(args.outdir, exist_ok=True)

    rows = [
        run_scale(args.x3, 3, f"{IMG}/GF2_LR.tif", args.outdir,
                  hr_target=f"{IMG}/GF2_HR.tif"),
        run_scale(args.x9, 9, f"{IMG}/Sentinel2.tif", args.outdir),
    ]
    with open(os.path.join(args.outdir, "tif_runs.json"), "w") as f:
        json.dump(rows, f, indent=1)
    print("results:", os.path.join(args.outdir, "tif_runs.json"))


if __name__ == "__main__":
    main()
