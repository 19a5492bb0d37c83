"""Multi-subject training CLI — train S avatars side by side on a
`(subject, dp)` device grid (BASELINE config #5: 4-subject data-parallel
training across ICI). NEW capability over the reference, which is strictly
single-process single-GPU (/root/reference/train.py:22-132 trains exactly one
subject; SURVEY.md §2.4).

    python train_multi.py --sources dataA dataB dataC dataD -m <out_root> \
        [--dp 2] [--train_stage 1] ...

Every single-subject flag applies to all subjects. Outputs land in
<out_root>/<subject_name>/ with the single-subject layout (cfg_args.json,
net/iteration_N/, metrics.jsonl, log/), so `eval.py -m <out_root>/<name>`,
`render_novel_pose.py`, and single-subject resume work per subject unchanged.
`--checkpoint_epochs E` resumes all subjects from their epoch-E checkpoints.
"""

import os
import sys
from argparse import ArgumentParser
from os.path import basename, join, normpath

from gaussianavatar_tpu.config import (
    build_parser,
    extract_config,
    resolve_train_raster_defaults,
)
from gaussianavatar_tpu.engine.logging_utils import safe_state


def subject_names(sources):
    """Directory basenames, suffixed on collision."""
    names, seen = [], {}
    for s in sources:
        n = basename(normpath(s)) or "subject"
        if n in seen:
            seen[n] += 1
            n = f"{n}_{seen[n]}"
        else:
            seen[n] = 0
        names.append(n)
    return names


def main(argv=None):
    parser = ArgumentParser(description="Multi-subject training parameters")
    build_parser(parser)
    parser.add_argument("--sources", nargs="+", required=True,
                        help="one data directory per subject")
    parser.add_argument("--dp", type=int, default=1,
                        help="per-subject data-parallel degree: each subject's "
                             "batch is additionally sharded over this many "
                             "devices (needs n_subjects * dp devices)")
    parser.add_argument("--save_epochs", nargs="+", type=int, default=[100])
    parser.add_argument("--checkpoint_epochs", nargs="+", type=int, default=[])
    parser.add_argument("--max_steps", type=int, default=None,
                        help="stop after N optimizer steps (testing)")
    parser.add_argument("--eval_after", action="store_true",
                        help="run eval.py on every subject after training")
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])

    out_root = args.model_path
    if not out_root:
        parser.error("-m/--model_path (output root) is required")

    from gaussianavatar_tpu.utils.xla_cache import enable_compilation_cache
    enable_compilation_cache()
    safe_state(args.quiet)

    names = subject_names(args.sources)
    cfgs = []
    for src, name in zip(args.sources, names):
        cfg = extract_config(args)
        notes = resolve_train_raster_defaults(cfg, args)
        if not cfgs:  # same flags for every subject: print once
            for note in notes:
                print(note)
        cfg.model.source_path = src
        cfg.model.model_path = join(out_root, name)
        cfgs.append(cfg)

    saving_epochs = sorted(set(args.save_epochs + [cfgs[0].opt.epochs]))
    print(f"Optimizing {len(cfgs)} subjects into {out_root} "
          f"(grid {len(cfgs)}x{args.dp}): {', '.join(names)}")

    from gaussianavatar_tpu.engine.multi_loop import train_multi

    train_multi(cfgs, saving_epochs, args.checkpoint_epochs,
                dp=args.dp, max_steps=args.max_steps)
    print("\nTraining complete.")

    if args.eval_after:
        import eval as eval_cli

        for cfg, name in zip(cfgs, names):
            print(f"\nEvaluating subject {name}")
            eval_cli.main(["-m", cfg.model.model_path])


if __name__ == "__main__":
    main()
