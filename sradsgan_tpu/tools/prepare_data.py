"""Offline dataset preparation: (lr, hr, sr=bicubic-up) triplet folders.

Reference: GDP_x0/data/prepare_data.py (182 LoC) and
GDP_x0/dataset/prepare_data_mfe_dm.py (204 LoC) — multiprocess bicubic
resize of an image folder into ``lr_{l}/hr_{r}/sr_{l}_{r}`` png folders;
plus model/util.py's ``create_downsampling_dataset`` (:958) /
``prepare_dataset_train_test`` (:1033) folder builders.

Thread-pooled PIL (the work is decode/encode-bound).
"""

from __future__ import annotations

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor

from PIL import Image

from sradsgan_tpu.data.datasets import is_image_file


def prepare_triplets(src: str, dst: str, hr_size: int, lr_size: int,
                     workers: int = 8) -> int:
    """Build lr_{l} / hr_{r} / sr_{l}_{r} folders (GDP layout)."""
    names = {
        "lr": os.path.join(dst, f"lr_{lr_size}"),
        "hr": os.path.join(dst, f"hr_{hr_size}"),
        "sr": os.path.join(dst, f"sr_{lr_size}_{hr_size}"),
    }
    for d in names.values():
        os.makedirs(d, exist_ok=True)

    files = []
    for root, _, fnames in os.walk(src):
        files.extend(os.path.join(root, f) for f in sorted(fnames)
                     if is_image_file(f))

    def process(idx_path):
        idx, path = idx_path
        img = Image.open(path).convert("RGB")
        w, h = img.size
        left, top = (w - hr_size) // 2, (h - hr_size) // 2
        hr = img.crop((left, top, left + hr_size, top + hr_size)) \
            if (w, h) != (hr_size, hr_size) else img
        lr = hr.resize((lr_size, lr_size), Image.BICUBIC)
        sr = lr.resize((hr_size, hr_size), Image.BICUBIC)
        stem = f"{idx:05d}"
        hr.save(os.path.join(names["hr"], stem + ".png"))
        lr.save(os.path.join(names["lr"], stem + ".png"))
        sr.save(os.path.join(names["sr"], stem + ".png"))

    with ThreadPoolExecutor(workers) as pool:
        list(pool.map(process, enumerate(files)))
    return len(files)


def iter_triplet_records(src: str, hr_size: int, lr_size: int):
    """Yield the GDP lmdb (key, png-bytes) records for an image folder.

    Key schema matches GDP_x0/data/prepare_data.py's lmdb mode and
    LRHR_dataset.py:62-76: hr_{r}_{i:05d} / lr_{l}_{i:05d} /
    sr_{l}_{r}_{i:05d}, plus the final b"length" count.  Factored out of
    the writer so the schema round-trips in tests without the lmdb lib.
    """
    import io

    files = []
    for root, _, fnames in os.walk(src):
        files.extend(os.path.join(root, f) for f in sorted(fnames)
                     if is_image_file(f))

    def png(img):
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    for idx, path in enumerate(files):
        img = Image.open(path).convert("RGB")
        w, h = img.size
        left, top = (w - hr_size) // 2, (h - hr_size) // 2
        hr = img.crop((left, top, left + hr_size, top + hr_size)) \
            if (w, h) != (hr_size, hr_size) else img
        lr = hr.resize((lr_size, lr_size), Image.BICUBIC)
        sr = lr.resize((hr_size, hr_size), Image.BICUBIC)
        tag = f"{idx:05d}"
        yield f"hr_{hr_size}_{tag}".encode(), png(hr)
        yield f"lr_{lr_size}_{tag}".encode(), png(lr)
        yield f"sr_{lr_size}_{hr_size}_{tag}".encode(), png(sr)
    yield b"length", str(len(files)).encode()


def prepare_lmdb(src: str, dst: str, hr_size: int, lr_size: int,
                 map_size: int = 1 << 32) -> int:
    """Write the GDP lmdb layout (requires the optional lmdb package)."""
    try:
        import lmdb
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError("writing lmdb datasets needs the 'lmdb' package "
                          "(not bundled in this image); use the folder "
                          "layout (triplets) instead") from e
    env = lmdb.open(dst, map_size=map_size)
    n = 0
    with env.begin(write=True) as txn:
        for key, value in iter_triplet_records(src, hr_size, lr_size):
            txn.put(key, value)
            n += 1
    env.close()
    return (n - 1) // 3


def prepare_classdirs(src: str, dst: str, size: int, scale: int,
                      workers: int = 8) -> int:
    """Per-class LR folders preserving class layout
    (model/util.py:958-1122 style)."""
    count = 0
    jobs = []
    for cls in sorted(os.listdir(src)):
        cdir = os.path.join(src, cls)
        if not os.path.isdir(cdir):
            continue
        odir = os.path.join(dst, cls)
        os.makedirs(odir, exist_ok=True)
        for f in sorted(os.listdir(cdir)):
            if is_image_file(f):
                jobs.append((os.path.join(cdir, f), os.path.join(odir, f)))

    def process(job):
        src_f, dst_f = job
        img = Image.open(src_f).convert("RGB")
        w, h = img.size
        left, top = (w - size) // 2, (h - size) // 2
        img = img.crop((left, top, left + size, top + size))
        img.resize((size // scale, size // scale), Image.BICUBIC).save(
            os.path.splitext(dst_f)[0] + ".png")

    with ThreadPoolExecutor(workers) as pool:
        list(pool.map(process, jobs))
    return len(jobs)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("triplets")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--hr-size", type=int, default=216)
    p.add_argument("--lr-size", type=int, default=54)
    p = sub.add_parser("lmdb")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--hr-size", type=int, default=216)
    p.add_argument("--lr-size", type=int, default=54)
    p = sub.add_parser("classdirs")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--size", type=int, default=216)
    p.add_argument("--scale", type=int, default=4)
    args = parser.parse_args(argv)
    if args.cmd == "triplets":
        n = prepare_triplets(args.src, args.dst, args.hr_size, args.lr_size)
    elif args.cmd == "lmdb":
        n = prepare_lmdb(args.src, args.dst, args.hr_size, args.lr_size)
    else:
        n = prepare_classdirs(args.src, args.dst, args.size, args.scale)
    print(f"processed {n} images")
    return 0


if __name__ == "__main__":
    sys.exit(main())
