"""Per-class validate-by-class table from a real hardware run (VERDICT r3
item 6).

The reference's published-table path iterates the 21 sorted UCMerced class
dirs and emits per-class + Total averages (model/sradsgan.py:1393-1601).
UCMerced itself cannot exist in this zero-egress image, so this builds a
21-class corpus with the UCMerced class names (textured synthetic images,
distinct spatial statistics per class) and runs the full
``mfe_new_validate_by_class`` protocol — uint8 metrics, bicubic twin,
LPIPS — against a trained checkpoint on the chip.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/by_class_evidence.py <ckpt> [scale]
"""
import json
import os
import sys
import time

import numpy as np
from PIL import Image

UCM_CLASSES = [
    "agricultural", "airplane", "baseballdiamond", "beach", "buildings",
    "chaparral", "denseresidential", "forest", "freeway", "golfcourse",
    "harbor", "intersection", "mediumresidential", "mobilehomepark",
    "overpass", "parkinglot", "river", "runway", "sparseresidential",
    "storagetanks", "tenniscourt",
]

ROOT = "/tmp/ucm21/UCMerced"


def build_corpus(per_class=8, size=216):
    rng = np.random.default_rng(7)
    yy, xx = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size),
                         indexing="ij")
    for ci, name in enumerate(UCM_CLASSES):
        d = os.path.join(ROOT, name)
        os.makedirs(d, exist_ok=True)
        hue = np.array([ci / 21.0, (ci * 5 % 21) / 21.0, 1 - ci / 21.0])
        freq = 1.5 + ci * 0.7
        for i in range(per_class):
            ph = rng.random(2) * 6.28
            tex = (0.45 + 0.2 * np.sin(2 * np.pi * freq * xx + ph[0])
                   + 0.2 * np.cos(2 * np.pi * freq * yy + ph[1])
                   + 0.15 * np.sin(2 * np.pi * freq * (xx + yy)))
            img = np.clip(tex[..., None] * hue + 0.12 *
                          rng.random((size, size, 3)), 0, 1)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(d, f"{name}{i:02d}.png"))


def main(ckpt, scale=4):
    build_corpus()
    from sradsgan_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from sradsgan_tpu.core.checkpoint import restore_pytree
    from sradsgan_tpu.core.config import config_for_model
    from sradsgan_tpu.evaluation.validate import (format_by_class_table,
                                                  mfe_new_validate_by_class,
                                                  save_by_class_csv)
    from sradsgan_tpu.models import get_spec

    cfg = config_for_model("sradsgan", scale)
    cfg.data.data_dir = "/tmp/ucm21"
    cfg.data.test_dataset = "UCMerced"
    cfg.data.synthetic = False
    cfg.data.test_crop_size = 216

    spec = get_spec("sradsgan")
    import jax.numpy as jnp
    gen = spec.generator(scale=scale, dtype=jnp.bfloat16)
    prev = restore_pytree(ckpt)
    variables = {"params": jax.tree.map(jnp.asarray, prev["g_params"])}

    lpips = None
    try:
        from sradsgan_tpu.losses.lpips import lpips_fn as make_lpips
        lpips = make_lpips("alex")
    except Exception as e:
        print(f"lpips unavailable: {e}", file=sys.stderr)

    t0 = time.time()
    table = mfe_new_validate_by_class(
        gen, variables, cfg.data, scale, lpips_fn=lpips, save_img=True,
        save_dir="/tmp/ucm21/eval")
    print(format_by_class_table(table))
    save_by_class_csv(table, f"/tmp/ucm21/by_class_x{scale}.csv")
    print(json.dumps({"wall_s": round(time.time() - t0, 1),
                      "csv": f"/tmp/ucm21/by_class_x{scale}.csv",
                      "n_classes": len(table) - 1}))


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 4)
