"""Training CLI — flag parity with reference train.py:160-181.

    python train.py -s <data_path> -m <out_path> --train_stage 1
    python train.py -s <data_path> -m <out_path> --train_stage 2 \
        --stage1_out_path <out1>/net/iteration_200
"""

import sys
from argparse import ArgumentParser

from gaussianavatar_tpu.config import (
    build_parser,
    extract_config,
    resolve_train_raster_defaults,
)
from gaussianavatar_tpu.engine.logging_utils import safe_state


def main(argv=None):
    parser = ArgumentParser(description="Training script parameters")
    build_parser(parser)
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    parser.add_argument("--save_epochs", nargs="+", type=int, default=[100])
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_epochs", nargs="+", type=int, default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--max_steps", type=int, default=None,
                        help="stop after N optimizer steps (testing)")
    parser.add_argument("--no_lpips", action="store_true",
                        help="disable the LPIPS loss term even if weights are available")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace of the first training steps here")
    parser.add_argument("--dp", type=int, default=1,
                        help="data-parallel degree: shard the batch over this many "
                             "devices (batch_size must be a multiple; gradients are "
                             "reduced over ICI)")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])

    cfg = extract_config(args)
    for note in resolve_train_raster_defaults(cfg, args):
        print(note)
    saving_epochs = sorted(set(args.save_epochs + [cfg.opt.epochs]))

    from gaussianavatar_tpu.utils.xla_cache import enable_compilation_cache
    enable_compilation_cache()

    print("Optimizing " + cfg.model.model_path)
    safe_state(args.quiet)

    if args.detect_anomaly:
        import jax

        jax.config.update("jax_debug_nans", True)

    lpips_fn, lpips_note = None, None
    if args.no_lpips:
        lpips_note = "disabled (--no_lpips)"
    else:
        from gaussianavatar_tpu.ops.lpips import try_load_lpips

        lpips_fn = try_load_lpips(cfg.model.project_path)
        if lpips_fn is None:
            print("LPIPS weights not found; training without the LPIPS term")

    from gaussianavatar_tpu.engine.loop import train

    if args.profile_dir:
        import jax

        with jax.profiler.trace(args.profile_dir):
            train(cfg, saving_epochs, args.checkpoint_epochs, lpips_fn=lpips_fn,
                  max_steps=args.max_steps or 20, lpips_note=lpips_note, dp=args.dp)
        print("profiler trace written to", args.profile_dir)
    else:
        train(cfg, saving_epochs, args.checkpoint_epochs, lpips_fn=lpips_fn,
              max_steps=args.max_steps, lpips_note=lpips_note, dp=args.dp)
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
