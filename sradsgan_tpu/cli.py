"""Command-line interface.

One entry point replaces the reference's nine ``main_*.py`` clones
(SURVEY.md §3.5) and the GDP ``sr_mfe.py``:

    python -m sradsgan_tpu.cli train    --model sradsgan --scale 4 ...
    python -m sradsgan_tpu.cli validate --model sradsgan --scale 4 --ckpt ...
    python -m sradsgan_tpu.cli validate-by-class --model ... --ckpt ...
    python -m sradsgan_tpu.cli infer    --model sradsgan --scale 3 --image x.tif
    python -m sradsgan_tpu.cli diffusion-train / diffusion-sample ...

Every reference main runs train() then mfeNew_validateByClass(save_img=True)
(main_sradsgan.py:121-128); ``train`` here does the same unless
--no-final-eval.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model", default="sradsgan")
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--data-dir", default="data")
    p.add_argument("--test-dataset", default="UCMerced_LandUse")
    p.add_argument("--data", choices=["folder", "synthetic"],
                   default="folder")
    p.add_argument("--crop-size", type=int, default=216)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--save-dir", default="Result")
    p.add_argument("--no-bf16", action="store_true")
    p.add_argument("--model-kwargs", default=None,
                   help='JSON generator-constructor overrides, e.g. '
                        '\'{"base_filters": 16}\'')
    p.add_argument("--lpips", action="store_true",
                   help="include LPIPS in eval (slow; see losses/lpips.py "
                        "about backbone weights)")
    p.add_argument("--config", help="JSON TrainConfig overriding flags")


def _lpips(args):
    if not getattr(args, "lpips", False):
        return None
    from sradsgan_tpu.losses.lpips import lpips_fn, lpips_is_calibrated
    if not lpips_is_calibrated():
        print("note: LPIPS backbone weights not provided "
              "(SRADSGAN_TPU_ALEXNET_NPZ); reporting uncalibrated lpips*")
    return lpips_fn()


def _build_cfg(args):
    from sradsgan_tpu.core.config import config_for_model, load_config

    if args.config:
        return load_config(args.config)
    cfg = config_for_model(args.model, args.scale)
    cfg.data.data_dir = args.data_dir
    cfg.data.test_dataset = args.test_dataset
    cfg.data.synthetic = args.data == "synthetic"
    cfg.data.crop_size = args.crop_size
    cfg.data.test_crop_size = args.crop_size
    cfg.data.batch_size = args.batch_size
    cfg.save_dir = args.save_dir
    cfg.bf16 = not args.no_bf16
    if getattr(args, "model_kwargs", None):
        cfg.model_kwargs = json.loads(args.model_kwargs)
    return cfg


def _load_eval_model(args, ckpt):
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.core.checkpoint import restore_pytree
    from sradsgan_tpu.models import create_generator

    kwargs = (json.loads(args.model_kwargs)
              if getattr(args, "model_kwargs", None) else {})
    generator = create_generator(args.model, args.scale, **kwargs)
    lr = args.crop_size // args.scale
    variables = generator.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, lr, lr, 3), jnp.float32),
                               train=False)
    if ckpt:
        state = restore_pytree(ckpt)
        import jax as _jax
        variables = dict(variables)
        variables["params"] = _jax.tree.map(jnp.asarray, state["g_params"])
        if state.get("g_stats"):
            variables["batch_stats"] = _jax.tree.map(jnp.asarray,
                                                     state["g_stats"])
    return generator, variables


def _archive_stale_dir(path: str) -> None:
    """Rename an existing run dir to ``{path}_archived_{timestamp}`` so a
    fresh (non-resume) run never mixes outputs with a stale one — the
    reference's check_args -> mkdir_and_rename behavior
    (main_sradsgan.py:66-86, utils/utils.py:830-838)."""
    if os.path.isdir(path) and os.listdir(path):
        import datetime
        stamp = datetime.datetime.now().strftime("%y%m%d-%H%M%S")
        new_name = f"{path}_archived_{stamp}"
        print(f"run dir exists, renaming it to [{new_name}]",
              file=sys.stderr)
        os.rename(path, new_name)


def cmd_train(args) -> int:
    from sradsgan_tpu.train.trainer import Trainer

    cfg = _build_cfg(args)
    if args.epochs is not None:
        cfg.num_epochs = args.epochs
    if args.init_from:
        cfg.init_from = args.init_from
    if not args.resume:
        _archive_stale_dir(cfg.model_dir)
    trainer = Trainer(cfg)
    if args.resume:
        trainer.load_checkpoint(args.resume)
    metrics = trainer.train(num_steps=args.steps)
    print(json.dumps({"final": metrics}))
    if not args.no_final_eval:
        from sradsgan_tpu.evaluation.validate import (
            format_by_class_table, mfe_new_validate_by_class)
        variables = {"params": trainer.state.g_params}
        if trainer.state.g_stats:
            variables["batch_stats"] = trainer.state.g_stats
        table = mfe_new_validate_by_class(
            trainer.generator, variables, cfg.data, cfg.scale,
            lpips_fn=_lpips(args), save_img=args.save_img,
            save_dir=os.path.join(cfg.model_dir, "eval"))
        print(format_by_class_table(table))
    return 0


def cmd_chain_train(args) -> int:
    from sradsgan_tpu.train.trainer import Trainer

    prev_ckpt = None
    results = {}
    for scale in args.scales:
        args.scale = scale
        cfg = _build_cfg(args)
        if args.epochs is not None:
            cfg.num_epochs = args.epochs
        cfg.init_from = prev_ckpt
        trainer = Trainer(cfg)
        results[f"x{scale}"] = trainer.train(num_steps=args.steps)
        prev_ckpt = trainer.save_checkpoint(cfg.num_epochs - 1)
        best = os.path.join(cfg.model_dir, "ckpt_best")
        if os.path.exists(best):
            prev_ckpt = best
        print(f"scale x{scale} done; next init_from={prev_ckpt}")
    print(json.dumps({k: {m: float(v) for m, v in r.items()}
                      for k, r in results.items()}))
    return 0


def cmd_validate(args) -> int:
    from sradsgan_tpu.core.config import config_for_model
    from sradsgan_tpu.evaluation.validate import mfe_new_validate

    cfg = _build_cfg(args)
    generator, variables = _load_eval_model(args, args.ckpt)
    out = mfe_new_validate(generator, variables, cfg.data, args.scale,
                           lpips_fn=_lpips(args), save_img=args.save_img,
                           save_dir=os.path.join(cfg.model_dir, "eval"))
    print(json.dumps(out, indent=2))
    return 0


def cmd_validate_by_class(args) -> int:
    from sradsgan_tpu.evaluation.validate import (format_by_class_table,
                                                  mfe_new_validate_by_class,
                                                  save_by_class_csv)

    cfg = _build_cfg(args)
    generator, variables = _load_eval_model(args, args.ckpt)
    table = mfe_new_validate_by_class(
        generator, variables, cfg.data, args.scale, lpips_fn=_lpips(args),
        save_img=args.save_img,
        save_dir=os.path.join(cfg.model_dir, "eval"))
    print(format_by_class_table(table))
    csv_path = os.path.join(cfg.model_dir,
                            f"by_class_x{args.scale}.csv")
    save_by_class_csv(table, csv_path)
    print(f"table saved: {csv_path}")
    return 0


def cmd_infer(args) -> int:
    from sradsgan_tpu.evaluation.validate import mfe_test_single

    generator, variables = _load_eval_model(args, args.ckpt)
    out = mfe_test_single(generator, variables, args.image, args.scale,
                          args.out_dir, crop_size=args.test_crop)
    print(json.dumps(out))
    return 0


def _build_diffusion_trainer(args):
    from sradsgan_tpu.diffusion.trainer import DiffusionTrainer

    cfg = _build_cfg(args)
    unet_kwargs = (json.loads(args.unet_kwargs)
                   if getattr(args, "unet_kwargs", None) else None)
    if getattr(args, "gdp_config", None):
        return DiffusionTrainer.from_gdp_config(
            args.gdp_config, cfg.data,
            save_dir=os.path.join(args.save_dir, "GDP"),
            bf16=not args.no_bf16,
            **({"unet_kwargs": unet_kwargs} if unet_kwargs else {}))
    return DiffusionTrainer(cfg.data, args.scale,
                            save_dir=os.path.join(args.save_dir, "GDP"),
                            n_timestep=args.timesteps,
                            unet_kwargs=unet_kwargs,
                            bf16=not args.no_bf16)


def cmd_diffusion_train(args) -> int:
    trainer = _build_diffusion_trainer(args)
    loss = trainer.train(args.n_iter, val_freq=args.val_freq)
    path = trainer.save_checkpoint()
    print(json.dumps({"final_loss": loss, "ckpt": path}))
    return 0


def cmd_diffusion_validate(args) -> int:
    trainer = _build_diffusion_trainer(args)
    if args.ckpt:
        trainer.load_checkpoint(args.ckpt)
    val = trainer.validate(max_images=args.max_images,
                           result_dir=args.result_dir,
                           continuous=args.continuous)
    print(json.dumps({"result_dir": args.result_dir, **val}))
    return 0


def cmd_diffusion_sample(args) -> int:
    import numpy as np
    from PIL import Image
    from sradsgan_tpu.utils.plotting import save_image

    trainer = _build_diffusion_trainer(args)
    if args.ckpt:
        trainer.load_checkpoint(args.ckpt)
    img = Image.open(args.image).convert("RGB")
    bc = img.resize((img.width * args.scale, img.height * args.scale),
                    Image.BICUBIC)
    bc01 = np.asarray(bc, np.float32)[None] / 255.0
    sr = trainer.super_resolution(bc01)[0]
    name = os.path.splitext(os.path.basename(args.image))[0]
    out = os.path.join(args.out_dir, f"GDP_SR_{name}_x{args.scale}.png")
    save_image(sr, out)
    print(json.dumps({"sr": out}))
    return 0


def cmd_export(args) -> int:
    from sradsgan_tpu.serving import export_model

    generator, variables = _load_eval_model(args, args.ckpt)
    path = export_model(generator, variables, args.lr_size, args.out)
    print(json.dumps({"exported": path}))
    return 0


def cmd_list_models(_args) -> int:
    from sradsgan_tpu.models import available_models, get_spec

    for name in available_models():
        spec = get_spec(name)
        kind = f"GAN({spec.gan_type})" if spec.adversarial else "pixel"
        print(f"{name:<10} {kind}")
    return 0


def main(argv=None) -> int:
    from sradsgan_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser(prog="sradsgan_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="train a model (then eval by class)")
    _add_common(p)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps", type=int, default=None,
                   help="stop after N optimizer steps (smoke runs)")
    p.add_argument("--init-from", help="chain-training checkpoint")
    p.add_argument("--resume", help="resume from a checkpoint path")
    p.add_argument("--save-img", action="store_true")
    p.add_argument("--no-final-eval", action="store_true")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser(
        "chain-train",
        help="paper protocol: train x2 -> x3 -> x4 -> x8 -> x9, each scale "
             "warm-started from the previous best checkpoint "
             "(reference sradsgan.py:716-721)")
    _add_common(p)
    p.add_argument("--scales", type=int, nargs="+",
                   default=[2, 3, 4, 8, 9])
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps", type=int, default=None)
    p.set_defaults(fn=cmd_chain_train)

    p = sub.add_parser("validate", help="mfeNew_validate protocol")
    _add_common(p)
    p.add_argument("--ckpt")
    p.add_argument("--save-img", action="store_true")
    p.set_defaults(fn=cmd_validate)

    p = sub.add_parser("validate-by-class",
                       help="mfeNew_validateByClass protocol")
    _add_common(p)
    p.add_argument("--ckpt")
    p.add_argument("--save-img", action="store_true")
    p.set_defaults(fn=cmd_validate_by_class)

    p = sub.add_parser("infer", help="single-image SR (mfe_test_single)")
    _add_common(p)
    p.add_argument("--image", required=True)
    p.add_argument("--ckpt")
    p.add_argument("--out-dir", default="Result/single")
    p.add_argument("--test-crop", type=int, default=None)
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser("diffusion-train",
                       help="GDP-style conditional diffusion SR training")
    _add_common(p)
    p.add_argument("--n-iter", type=int, default=1000000)
    p.add_argument("--val-freq", type=int, default=0)
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--gdp-config",
                   help="bundled or custom GDP JSON config name/path "
                        "(e.g. gdp_train_27_216)")
    p.add_argument("--unet-kwargs", default=None,
                   help='JSON UNet-constructor overrides, e.g. '
                        '\'{"inner_channel": 32}\'')
    p.set_defaults(fn=cmd_diffusion_train)

    p = sub.add_parser("diffusion-sample",
                       help="sample SR from a trained diffusion model")
    _add_common(p)
    p.add_argument("--image", required=True)
    p.add_argument("--ckpt")
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--unet-kwargs", default=None)
    p.add_argument("--out-dir", default="Result/GDP/samples")
    p.set_defaults(fn=cmd_diffusion_sample)

    p = sub.add_parser("diffusion-validate",
                       help="diffusion eval sweep with tif/panel dumps "
                            "(reference sr_mfe.py -p val)")
    _add_common(p)
    p.add_argument("--ckpt")
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--gdp-config")
    p.add_argument("--unet-kwargs", default=None)
    p.add_argument("--max-images", type=int, default=4)
    p.add_argument("--result-dir", default="Result/GDP/val")
    p.add_argument("--continuous", action="store_true",
                   help="continuous sampling: save reverse-chain grids")
    p.set_defaults(fn=cmd_diffusion_validate)

    p = sub.add_parser("export", help="AOT-export a model (StableHLO)")
    _add_common(p)
    p.add_argument("--ckpt")
    p.add_argument("--lr-size", type=int, default=54)
    p.add_argument("--out", default="exported_model.bin")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("list-models")
    p.set_defaults(fn=cmd_list_models)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
