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


def synth_image(rng, ci, size=216, v=2):
    """One synthetic 'UCMerced' image for class index ``ci``.

    v=1 (rounds 3-4): smooth sinusoids (max freq ~16 cyc ⇒ 14 px
    wavelength — bicubic-recoverable from a ×4 LR) + 0.12·U noise whose
    iid floor alone caps PSNR at ≈29.2 dB.  On that corpus the bicubic
    twin is unbeatable BY CONSTRUCTION (docs/VALIDATION.md round-5
    analysis): there is almost no bicubic-destroyed-but-recoverable
    structure, and the twin passes correlated noise through.

    v=2 (round 5): the regime the reference's real UCMerced tables live
    in — sharp rectangle/line structure (edges blur under bicubic but are
    exactly the detail a learned prior restores) + a high-frequency
    class texture (wavelength ~5-9 px, destroyed by ×4 downsampling,
    learnable from the per-class generative family) + low noise
    (0.02·U ⇒ floor ≈44 dB, far above play).
    """
    yy, xx = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size),
                         indexing="ij")
    hue = np.array([ci / 21.0, (ci * 5 % 21) / 21.0, 1 - ci / 21.0])
    if v == 1:
        freq = 1.5 + ci * 0.7
        ph = rng.random(2) * 6.28
        tex = (0.45 + 0.2 * np.sin(2 * np.pi * freq * xx + ph[0])
               + 0.2 * np.cos(2 * np.pi * freq * yy + ph[1])
               + 0.15 * np.sin(2 * np.pi * freq * (xx + yy)))
        return np.clip(tex[..., None] * hue + 0.12 *
                       rng.random((size, size, 3)), 0, 1)
    # v=2: structured + high-frequency, low-noise
    base = 0.35 + 0.15 * np.sin(2 * np.pi * (1.5 + ci * 0.2) * xx
                                + rng.random() * 6.28)
    hf_freq = 24.0 + 2.0 * ci + 4.0 * rng.random()  # 5-9 px wavelength
    ang = (ci / 21.0) * np.pi + 0.2 * rng.random()
    u = xx * np.cos(ang) + yy * np.sin(ang)
    tex = base + 0.12 * np.sin(2 * np.pi * hf_freq * u
                               + rng.random() * 6.28)
    img = tex[..., None] * hue
    n_rect = 6 + ci % 8
    for _ in range(n_rect):  # sharp-edged blocks (buildings/roads/courts)
        h = int(rng.integers(10, 60))
        w = int(rng.integers(10, 60))
        r = int(rng.integers(0, size - h))
        c = int(rng.integers(0, size - w))
        col = np.clip(hue[::-1] * rng.random() + 0.25 * rng.random(3), 0, 1)
        img[r:r + h, c:c + w] = (0.65 * col
                                 + 0.35 * img[r:r + h, c:c + w])
    return np.clip(img + 0.02 * rng.random((size, size, 3)), 0, 1)


def build_corpus(per_class=8, size=216, v=2):
    rng = np.random.default_rng(7)
    for ci, name in enumerate(UCM_CLASSES):
        d = os.path.join(ROOT, name)
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            img = synth_image(rng, ci, size, v=v)
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
