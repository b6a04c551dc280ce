"""Shared CLI: 14-flag parity with the reference drivers
(ref neural_00_ODE_01_no_encode.py:203-255) plus mode dispatch
(--training / --testing / --saving / --drawing, ref :282-452).

Flags: --device --id --training --testing --saving --drawing --train_data
--test_data --model --num --batch --hidden --epoch --step. Extras (beyond
parity): --solver, --devices (data-parallel mesh size), --lr, --seed,
--fused, --n_windows/--gap_weight (multiple shooting), --robust_loss,
--init_style, --channel_impl.
"""

from __future__ import annotations

import argparse

import jax

from py_psnode_tpu.train import TrainConfig, Trainer


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--device", type=str, default="tpu",
        help='Device backend: "tpu" (alias "gpu" accepted for reference-CLI '
             'compatibility) or "cpu". Default "tpu".',
    )
    parser.add_argument(
        "--id", type=int, default=0,
        help="Device index within the backend. Default 0.",
    )
    parser.add_argument("--training", action="store_true",
                        help="Call training process, --train_data and --test_data needed.")
    parser.add_argument("--testing", action="store_true",
                        help="Call testing process, --model and --test_data needed.")
    parser.add_argument("--saving", action="store_true",
                        help="Call saving process, --model needed.")
    parser.add_argument("--drawing", action="store_true",
                        help="Draw true-vs-pred curves during testing/eval.")
    parser.add_argument("--train_data", type=str,
                        default="./results/samples_neural_gen_2_training.npz",
                        help="Training data file path (.npz)")
    parser.add_argument("--test_data", type=str,
                        default="./results/samples_neural_gen_2_testing.npz",
                        help="Testing data file path (.npz)")
    parser.add_argument("--model", type=str, default="saved_models/test",
                        help="Model dump/load path; a directory is created, an "
                             "existing file resumes training into <name>_branch/.")
    parser.add_argument("--num", type=int, default=3200,
                        help="Training set size. Default 3200.")
    parser.add_argument("--batch", type=int, default=64,
                        help="Mini-batch size. Default 64.")
    parser.add_argument("--hidden", type=int, default=128,
                        help="Hidden dimensionality. Default 128.")
    parser.add_argument("--epoch", type=int, default=400,
                        help="Number of training epochs. Default 400.")
    parser.add_argument("--step", type=int, default=1001,
                        help="Length of training series. Default 1001.")
    # TPU-native extras
    parser.add_argument("--warm_start", type=str, default=None,
                        help="Initialize params from this checkpoint (file, "
                             "orbax dir, or a run dir — resolved to its "
                             "best-eval epoch) and train into --model as "
                             "usual (fresh optimizer, epoch 1). Unlike "
                             "--model <ckpt>, no _branch dir coupling.")
    parser.add_argument("--stop_after", type=int, default=0,
                        help="Stop after this many epochs while keeping the "
                             "FULL --epoch lr schedule (truncated protocol "
                             "studies / budget-limited runs). 0 = run all "
                             "--epoch epochs.")
    parser.add_argument("--solver", type=str, default="euler",
                        help="Fixed-grid stepper: euler | midpoint | rk4. Default euler.")
    parser.add_argument("--devices", type=int, default=0,
                        help="Data-parallel mesh size (0 = single device).")
    parser.add_argument("--dcn_size", type=int, default=0,
                        help="Multi-host pods: size of the outer (DCN) mesh "
                             "axis. 0 = auto (process count when launched "
                             "under jax.distributed, else single-host). Set "
                             "explicitly to simulate a pod layout on one "
                             "process.")
    parser.add_argument("--lr", type=float, default=5e-3,
                        help="Learning rate. Default 5e-3.")
    parser.add_argument("--seed", type=int, default=0, help="PRNG seed.")
    parser.add_argument("--fused", action="store_true",
                        help="Route the forward through the fused Pallas "
                             "kernels (~4-5x faster on TPU).")
    parser.add_argument("--checkpointer", type=str, default="npz",
                        choices=("npz", "orbax"),
                        help='Checkpoint backend: "npz" (reference-parity '
                             'single-file snapshots) or "orbax" (also '
                             'captures optimizer state for exact resume).')
    parser.add_argument("--auto_resume", action="store_true",
                        help="On start, continue from the newest "
                             "model_checkpoint.{epoch} in the model dir "
                             "(crash recovery).")
    parser.add_argument("--input_true_x", action="store_true",
                        help="Teacher forcing: feed the TRUE previous state "
                             "to every solver step (ref my_solvers.py:74).")
    parser.add_argument("--input_true_i", action="store_true",
                        help="Teacher forcing (DAE only): feed the TRUE "
                             "lagged algebraic output to every step "
                             "(ref my_solvers.py:113,118).")
    parser.add_argument("--n_windows", type=int, default=0,
                        help="Multiple-shooting window count K (0 = plain "
                             "BPTT). (step-1) must be divisible by K. "
                             "Decision rule: try --robust_loss BPTT first "
                             "(converges ~10x lower at the full reference "
                             "envelope, ACCURACY.md); use K=20 with "
                             "--gap_weight 0.3 when the epoch/wall-clock "
                             "budget is small or guarded BPTT still "
                             "diverges.")
    parser.add_argument("--gap_weight", type=float, default=1.0,
                        help="Multiple-shooting continuity-gap penalty "
                             "weight (with --n_windows).")
    parser.add_argument("--robust_loss", action="store_true",
                        help="Wrap the variant loss in the robust guard "
                             "(ref utils.py:29-42): NaN losses take a "
                             "zero-gradient step; losses above 1 are "
                             "gradient-direction-normalized.")
    parser.add_argument("--robust_limit", type=float, default=None,
                        help="Robust-guard normalization threshold (with "
                             "--robust_loss): losses above it take the "
                             "direction-preserving unit step. Default 1.0. "
                             "Raise (e.g. 5-10) to guard only blow-ups "
                             "while keeping real loss magnitudes early in "
                             "training.")
    parser.add_argument("--gradient_clip", type=float, default=None,
                        help="Opt-in PRE-update per-parameter-tensor L2 "
                             "clip (optax). The reference's clip runs "
                             "after opt.step() and is a documented no-op "
                             "(optim.py); this one actually bounds the "
                             "update.")
    parser.add_argument("--init_style", default="lecun",
                        choices=("lecun", "torch"),
                        help="Weight init: flax default (lecun_normal, "
                             "zero biases) or torch nn.Linear's "
                             "(kaiming_uniform + U(±1/sqrt(fan_in)) "
                             "biases — the reference's distribution).")
    parser.add_argument("--channel_impl", default="einsum",
                        choices=("einsum", "blockdiag"),
                        help="Channel-wise variants only: per-channel "
                             "matmul form. blockdiag evaluates the "
                             "per-channel stacks as one wide block-"
                             "diagonal MXU dot per layer (recommended at "
                             "small batch; identical math).")
    parser.add_argument("--remat", type=str, default="true",
                        choices=("false", "true", "sqrt", "adjoint"),
                        help="BPTT memory policy for the XLA scan forward: "
                             "per-step checkpointing (true), sqrt-T chunked "
                             "remat, or the discrete adjoint pass (exact "
                             "BPTT gradients at O(1) activation memory — "
                             "for very long horizons).")
    parser.add_argument("--larger_than", type=str, default="variant",
                        help='contain_larger_than/show_larger_than filter: a '
                             'float, "none", or "variant" (per-variant '
                             'reference constant: 3.29 / none / pi / pi). '
                             'Default "variant".')
    return parser


def enable_compile_cache(path="~/.cache/py_psnode_tpu/jax"):
    """Persistent XLA compilation cache — first compiles of the T~1000 scans
    take minutes through this machine's device tunnel; cached recompiles are
    near-instant across runs.

    The cache is NAMESPACED per backend (``.../jax/<tpu|...>``) and
    DISABLED on the CPU backend: XLA CPU (jax 0.9.0 on this image)
    hard-aborts (SIGABRT, no Python traceback) when it LOADS a
    persistent-cached multi-device executable — compile-and-run is fine,
    reload is fatal; reproduced deterministically with the 8-virtual-device
    sharded train step. CPU compiles are seconds anyway — the cache exists
    for the minutes-long TPU tunnel compiles. Call AFTER the platform is
    selected."""
    import os

    backend = jax.default_backend()
    if backend == "cpu":
        return
    d = os.path.join(os.path.expanduser(path), backend)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def select_backend(device: str):
    """Map the reference's cpu/gpu flag onto JAX platforms; 'gpu' means the
    accelerator (TPU here)."""
    d = device.lower()
    if d == "cpu":
        jax.config.update("jax_platforms", "cpu")
    elif d in ("tpu", "gpu", "axon"):
        pass  # default platform (the TPU chip)
    else:
        raise SystemExit(
            f'Argument "--device" is illegal. Expected "cpu" or "tpu" but {device}'
        )


def _parse_larger_than(value: str):
    v = value.strip().lower()
    if v == "variant":
        return "variant"
    if v in ("none", "off"):
        return None
    try:
        return float(value)
    except ValueError:
        raise SystemExit(
            f'--larger_than expects a float, "none", or "variant"; got {value!r}'
        )


def main(variant: str, argv=None):
    args = build_parser().parse_args(argv)
    select_backend(args.device)
    enable_compile_cache()
    cfg = TrainConfig(
        variant=variant,
        train_data=args.train_data,
        test_data=args.test_data,
        model=args.model,
        num=args.num,
        batch=args.batch,
        hidden=args.hidden,
        epoch=args.epoch,
        stop_after=args.stop_after or None,
        warm_start=args.warm_start,
        step=args.step,
        learning_rate=args.lr,
        solver=args.solver,
        drawing=args.drawing,
        n_devices=args.devices or None,
        dcn_size=args.dcn_size or None,
        seed=args.seed,
        fused=args.fused,
        checkpointer=args.checkpointer,
        auto_resume=args.auto_resume,
        input_true_x=args.input_true_x,
        input_true_i=args.input_true_i,
        larger_than=_parse_larger_than(args.larger_than),
        remat={"false": False, "true": True}.get(args.remat, args.remat),
        n_windows=args.n_windows or None,
        gap_weight=args.gap_weight,
        robust_loss=args.robust_loss,
        robust_limit=args.robust_limit,
        gradient_clip=args.gradient_clip,
        init_style=args.init_style,
        channel_impl=args.channel_impl,
        progress=True,
    )
    trainer = Trainer(cfg)
    if args.training:
        assert args.train_data and args.test_data, (
            "Training set or testing set missing! Please check."
        )
        trainer.train()
    elif args.testing:
        assert args.model and args.test_data, (
            "Model or testing set missing! Please check."
        )
        trainer.test()
    elif args.saving:
        assert args.model and args.test_data, (
            "Model or testing set missing! Please check."
        )
        trainer.save()
    else:
        raise SystemExit('Unknown task. Set "--training" or "--testing".')
