"""The reference evaluation protocol: mfeNew_validate / mfeNew_validateByClass
/ mfe_test_single.

This is the published-table compatibility surface (reference model/
sradsgan.py:1258-1639; SURVEY.md §3.2-3.3): per image, SR and the bicubic
twin are converted to uint8 via the ToPILImage round-trip and scored with
MSE / PSNR / SSIM(multichannel) / ERGAS(variant 2) / LPIPS; per-class
averages over the 21 sorted UCMerced class dirs plus a grand Total.

TPU pipeline: images stream through the host loader, the generator runs
jitted in batches on device, and the uint8 protocol metrics run on host
numpy over the returned batch — protocol-exact where it counts, batched
where it's hot.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from sradsgan_tpu.data.datasets import (FolderDataset, build_test_dataset,
                                        scan_class_dirs, scan_image_dirs)
from sradsgan_tpu.data.loader import DataLoader
from sradsgan_tpu.metrics import (compare_ergas, compare_mse, compare_psnr,
                                  compare_ssim, tensor_to_uint8)
from sradsgan_tpu.utils.plotting import plot_test_panel, save_image

MetricRow = Dict[str, float]


def _score_pair(sr01: np.ndarray, hr01: np.ndarray, scale: int,
                lpips_fn: Optional[Callable] = None) -> MetricRow:
    """uint8-protocol metrics for one image pair (sradsgan.py:1484-1496)."""
    sr_u8 = tensor_to_uint8(sr01)
    hr_u8 = tensor_to_uint8(hr01)
    row = {
        "mse": compare_mse(sr_u8, hr_u8),
        "psnr": compare_psnr(sr_u8, hr_u8),
        "ssim": compare_ssim(sr_u8, hr_u8),
        "ergas": compare_ergas(hr_u8, sr_u8, scale=scale),
    }
    if lpips_fn is not None:
        row["lpips"] = float(lpips_fn(sr01, hr01))
    return row


def _mean_rows(rows: List[MetricRow]) -> MetricRow:
    if not rows:
        return {}
    keys = rows[0].keys()
    return {k: float(np.mean([r[k] for r in rows])) for k in keys}


class Evaluator:
    """Batched jitted SR inference + protocol metrics.

    LPIPS, when enabled, runs batched on device (whole eval batch in one
    jitted call) instead of the reference's per-image forwards
    (sradsgan.py:1489) — same numbers, far fewer dispatches.
    """

    def __init__(self, generator, variables, scale: int,
                 lpips_fn: Optional[Callable] = None,
                 batch_size: int = 8):
        self.generator = generator
        self.variables = variables
        self.scale = scale
        self.lpips_fn = lpips_fn
        self.batch_size = batch_size
        self._fwd = jax.jit(
            lambda v, x: generator.apply(v, x, train=False))
        self._batched_lpips = None
        if lpips_fn is not None:
            try:
                from sradsgan_tpu.losses.lpips import batched_lpips
                self._batched_lpips = batched_lpips
            except Exception:
                pass

    def super_resolve(self, lr_batch: np.ndarray) -> np.ndarray:
        out = self._fwd(self.variables, jnp.asarray(lr_batch))
        return np.asarray(out.astype(jnp.float32))

    def run(self, dataset, save_img: bool = False,
            save_dir: Optional[str] = None,
            class_of: Optional[Callable[[str], str]] = None):
        """Iterate a dataset; returns (per_class, totals_sr, totals_bc)."""
        loader = DataLoader(dataset, self.batch_size, shuffle=False,
                            drop_last=False, num_workers=4)
        per_class: "OrderedDict[str, Dict[str, List[MetricRow]]]" = \
            OrderedDict()
        num = 0
        for batch in loader:
            # Pad the tail batch up to the bucket size so every forward
            # reuses ONE compiled program — a fresh shape costs a full XLA
            # compile (minutes through this environment's remote relay).
            n_valid = batch["lr"].shape[0]
            if n_valid < self.batch_size:
                pad = self.batch_size - n_valid
                batch = {k: (np.concatenate(
                    [v, np.repeat(v[-1:], pad, axis=0)])
                    if isinstance(v, np.ndarray) else v)
                    for k, v in batch.items()}
            sr = self.super_resolve(batch["lr"])
            lp_sr = lp_bc = None
            if self._batched_lpips is not None:
                lp_sr = np.asarray(self._batched_lpips(
                    jnp.asarray(sr), jnp.asarray(batch["hr"])))
                lp_bc = np.asarray(self._batched_lpips(
                    jnp.asarray(batch["bc"]), jnp.asarray(batch["hr"])))
            for i in range(n_valid):
                path = batch["path"][i]
                cls = class_of(path) if class_of else "all"
                slot = per_class.setdefault(cls, {"sr": [], "bc": []})
                slot["sr"].append(_score_pair(sr[i], batch["hr"][i],
                                              self.scale, None))
                slot["bc"].append(_score_pair(batch["bc"][i], batch["hr"][i],
                                              self.scale, None))
                if lp_sr is not None:
                    slot["sr"][-1]["lpips"] = float(lp_sr[i])
                    slot["bc"][-1]["lpips"] = float(lp_bc[i])
                elif self.lpips_fn is not None:
                    slot["sr"][-1]["lpips"] = float(
                        self.lpips_fn(sr[i], batch["hr"][i]))
                    slot["bc"][-1]["lpips"] = float(
                        self.lpips_fn(batch["bc"][i], batch["hr"][i]))
                if save_img and save_dir:
                    num += 1
                    name = os.path.splitext(os.path.basename(path))[0]
                    save_image(sr[i], os.path.join(
                        save_dir, cls, f"SR_{name}_x{self.scale}.png"))
                    plot_test_panel(
                        [batch["hr"][i], batch["lr"][i], batch["bc"][i],
                         sr[i]],
                        ["HR", "LR", "Bicubic", "SR"],
                        [None, None, slot["bc"][-1], slot["sr"][-1]],
                        os.path.join(save_dir, cls,
                                     f"panel_{name}_x{self.scale}.png"))
        return per_class


def mfe_new_validate(generator, variables, data_cfg, scale: int,
                     lpips_fn=None, save_img: bool = False,
                     save_dir: Optional[str] = None,
                     batch_size: int = 8) -> Dict[str, MetricRow]:
    """Whole-test-set averages (reference mfeNew_validate,
    sradsgan.py:1258-1391)."""
    dataset = build_test_dataset(data_cfg, scale)
    ev = Evaluator(generator, variables, scale, lpips_fn, batch_size)
    per_class = ev.run(dataset, save_img, save_dir)
    rows_sr = [r for c in per_class.values() for r in c["sr"]]
    rows_bc = [r for c in per_class.values() for r in c["bc"]]
    return {"sr": _mean_rows(rows_sr), "bicubic": _mean_rows(rows_bc)}


def mfe_new_validate_by_class(generator, variables, data_cfg, scale: int,
                              lpips_fn=None, save_img: bool = False,
                              save_dir: Optional[str] = None,
                              batch_size: int = 8):
    """Per-class UCMerced tables + Total (reference mfeNew_validateByClass,
    sradsgan.py:1393-1601).

    Returns an OrderedDict class -> {"sr": avg_row, "bicubic": avg_row} with
    a final "Total" entry, matching the published-table layout.
    """
    if getattr(data_cfg, "synthetic", False):
        dataset = build_test_dataset(data_cfg, scale)
        class_of = None
    else:
        root = os.path.join(data_cfg.data_dir, data_cfg.test_dataset)
        class_dirs = [p for _, p in scan_class_dirs(root)]
        files = scan_image_dirs(class_dirs)
        dataset = FolderDataset(files, scale, data_cfg.test_crop_size,
                                lr_filter="bilinear")
        class_of = lambda p: os.path.basename(os.path.dirname(p))

    ev = Evaluator(generator, variables, scale, lpips_fn, batch_size)
    per_class = ev.run(dataset, save_img, save_dir, class_of)

    table: "OrderedDict[str, Dict[str, MetricRow]]" = OrderedDict()
    all_sr: List[MetricRow] = []
    all_bc: List[MetricRow] = []
    for cls, rows in per_class.items():
        table[cls] = {"sr": _mean_rows(rows["sr"]),
                      "bicubic": _mean_rows(rows["bc"])}
        all_sr.extend(rows["sr"])
        all_bc.extend(rows["bc"])
    table["Total"] = {"sr": _mean_rows(all_sr), "bicubic": _mean_rows(all_bc)}
    return table


def mfe_test_single(generator, variables, image_path: str, scale: int,
                    save_dir: str, crop_size: Optional[int] = None,
                    lpips_fn=None) -> Dict[str, str]:
    """Single-image tif inference (reference mfe_test_single,
    sradsgan.py:1603-1639): center-crop, SR, save SR png + bicubic png +
    panel."""
    from PIL import Image

    img = Image.open(image_path).convert("RGB")
    if crop_size:
        w, h = img.size
        left, top = (w - crop_size) // 2, (h - crop_size) // 2
        img = img.crop((left, top, left + crop_size, top + crop_size))
    lr01 = np.asarray(img, np.float32) / 255.0
    bc01 = np.asarray(
        img.resize((img.width * scale, img.height * scale), Image.BICUBIC),
        np.float32) / 255.0

    ev = Evaluator(generator, variables, scale, lpips_fn, 1)
    sr01 = ev.super_resolve(lr01[None])[0]

    os.makedirs(save_dir, exist_ok=True)
    name = os.path.splitext(os.path.basename(image_path))[0]
    sr_path = os.path.join(save_dir, f"SR_{name}_x{scale}.png")
    bc_path = os.path.join(save_dir, f"Bicubic_{name}_x{scale}.png")
    panel_path = os.path.join(save_dir, f"panel_{name}_x{scale}.png")
    save_image(sr01, sr_path)
    save_image(bc01, bc_path)
    plot_test_panel([lr01, bc01, np.clip(sr01, 0, 1)],
                    ["LR input", "Bicubic", "SR"], None, panel_path)
    return {"sr": sr_path, "bicubic": bc_path, "panel": panel_path}


def save_by_class_csv(table, path: str) -> None:
    """Write the per-class table as CSV (published-table layout)."""
    import csv
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    keys = None
    with open(path, "w", newline="") as f:
        writer = None
        for cls, row in table.items():
            if not row["sr"]:
                continue
            if keys is None:
                keys = sorted(row["sr"].keys())
                writer = csv.writer(f)
                writer.writerow(["class"] + [f"sr_{k}" for k in keys]
                                + [f"bc_{k}" for k in keys])
            writer.writerow([cls] + [f"{row['sr'][k]:.6f}" for k in keys]
                            + [f"{row['bicubic'][k]:.6f}" for k in keys])


def format_by_class_table(table) -> str:
    """Human-readable per-class table (val_log.txt style)."""
    lines = []
    header = (f"{'class':<22} {'PSNR':>8} {'SSIM':>8} {'ERGAS':>8} "
              f"{'bcPSNR':>8} {'bcSSIM':>8}")
    lines.append(header)
    for cls, row in table.items():
        sr, bc = row["sr"], row["bicubic"]
        if not sr:
            continue
        lines.append(
            f"{cls:<22} {sr['psnr']:>8.4f} {sr['ssim']:>8.4f} "
            f"{sr['ergas']:>8.4f} {bc['psnr']:>8.4f} {bc['ssim']:>8.4f}")
    return "\n".join(lines)
