"""Generic trainer — one implementation replacing the reference's four
copy-pasted driver loops (SURVEY.md §2.4, call stack §3.1).

Feature parity with the reference training mode:
  * dataset loading with num/cut_length/contain_larger_than (train) and the
    per-kind test-set conventions (ODE: full length, ref script1:289; DAE:
    cut to --step, ref script3:342)
  * Adam(5e-3) + StepLR(ep/10, γ=0.7) (ref :294-295)
  * resume: ``--model`` pointing at an existing *file* loads it and branches
    into ``<name>_branch/`` (ref :299-305)
  * rolling ``loss_record_iter``-batch loss/grad-norm logs (ref :376-384)
  * skip-update-when-loss==0 guard (ref :359)
  * per-epoch checkpoints ``model_checkpoint.{epoch}``, per-epoch eval with
    optional plots, ``train_and_eval.npz`` history, per-epoch submodule
    export, ``final_save`` + training-process summary (ref :388-405)

TPU-native mechanics: one jitted, donated train step; batches padded to a
static shape (masked rows are exact no-ops — see losses.mse); optional
``jax.sharding.Mesh`` for data-parallel training with implicit gradient
all-reduce.
"""

from __future__ import annotations

import dataclasses
import pathlib
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec

from py_psnode_tpu.data import DaeSamples, OdeSamples
from py_psnode_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_batch,
)
from py_psnode_tpu.train import evaluate as E
from py_psnode_tpu.train.optim import (
    make_optimizer,
    reference_grad_norm,
    robust_scalar_guard,
    zero_nonfinite_grads,
)
from py_psnode_tpu.train.variants import Variant, dataset_dims, get_variant
from py_psnode_tpu.utils.logging import Logger
from py_psnode_tpu.utils.profiling import JsonlMetrics

try:
    from tqdm import tqdm
except Exception:  # pragma: no cover
    tqdm = lambda x, **kw: x

from contextlib import nullcontext as _nullcontext


@dataclasses.dataclass
class TrainConfig:
    variant: str
    train_data: str = ""
    test_data: str = ""
    model: str = "saved_models/test"
    num: int = 3200
    batch: int = 64
    hidden: int = 128
    epoch: int = 400
    # stop training after this many epochs while keeping the FULL cfg.epoch
    # lr schedule (StepLR decay points, checkpoints, logs are exactly the
    # full run's first N epochs). For truncated envelope studies and
    # budget-limited runs — sizing the schedule by a reduced --epoch decays
    # the lr faster, making short runs non-predictive of the full protocol.
    stop_after: Optional[int] = None
    # initialize params from this checkpoint (file / orbax dir / run dir —
    # run dirs resolve to their best-eval epoch) WITHOUT the reference's
    # resume-branch-dir coupling: training writes into cfg.model as usual,
    # with fresh optimizer state and the epoch counter at 1. Distinct from
    # auto_resume (same-dir crash recovery) and from --model <ckpt-file>
    # (reference branch semantics, ref script1:299-305).
    warm_start: Optional[str] = None
    step: int = 1001
    learning_rate: float = 5e-3
    sch_gamma: float = 0.7
    loss_record_iter: int = 10
    gradient_clip: Optional[float] = None  # see optim.py — ref clip is a no-op
    solver: str = "euler"
    drawing: bool = False
    n_devices: Optional[int] = None  # data-parallel mesh size (None = 1)
    # multi-host pods: size of the slow outer (DCN) mesh axis. Set
    # explicitly to SIMULATE a pod on one process (e.g. dcn_size=2 over the
    # 8-device CPU mesh yields a 2x4 (dcn, data) mesh), or leave None —
    # when the process was launched under jax.distributed with
    # process_count > 1 the trainer builds the pod mesh automatically
    # (dcn = process axis). In pod mode ALL visible devices join the mesh
    # (n_devices is ignored), the batch shards over BOTH axes, each process
    # feeds its host-local batch rows, and only process 0 writes
    # checkpoints/logs/exports (other processes log to *.procN files).
    dcn_size: Optional[int] = None
    seed: int = 0
    # BPTT memory policy for the XLA scan forward: False (store all
    # activations), True (per-step jax.checkpoint), "sqrt" (sqrt-T chunked
    # remat), or "adjoint" (discrete adjoint with saved states — exact BPTT
    # gradients at O(1) activation memory, the right policy for T >> 1000;
    # solvers/adjoint.py, grad-parity-tested in tests/test_adjoint.py)
    remat: object = True
    unroll: int = 1
    echo_logs: bool = True
    progress: bool = False
    # contain_larger_than / show_larger_than filter; the sentinel "variant"
    # uses the per-variant reference constant (3.29 / None / π / π)
    larger_than: object = "variant"
    # "default" | "bfloat16" | "float32" | "highest" — matmul precision for
    # the train/eval forward (bfloat16 rides the MXU fastest). With
    # fused=True, "bfloat16" also selects the kernels' bf16 compute mode
    # (fused_dae.cast_compute: streams + 2-D weights cast at the pallas
    # boundary, f32 accumulation; grads stay f32 — see tests/test_fused_bf16)
    matmul_precision: str = "default"
    # skip optimizer steps whose grads contain NaN/Inf (optax.apply_if_finite)
    skip_nonfinite: bool = False
    # opt-in robust-loss guard wrapping the variant loss (the reference
    # instantiates Losses.multi_time_series_loss but never calls it, ref
    # utils.py:29-42 / script3:375): NaN → zero-gradient zero loss; a loss
    # above robust_limit (default 1.0) is replaced by its gradient-
    # direction-preserving normalization loss/stop_grad(loss). Trips are
    # logged per record window as robust_tripped.
    robust_loss: bool = False
    robust_limit: Optional[float] = None
    # fused-kernel scheduling knobs (None = keep module defaults; see
    # ops/fused_dae.set_kernel_tuning). All numerics-safe: lanes partition
    # independent batch rows (bit-exact), time_block regroups grid
    # iterations. Recorded per-entry by the bench suite.
    fwd_lanes: Optional[int] = None
    time_block: Optional[int] = None
    # batch-block row caps (None = compiler-boundary defaults: fwd 256,
    # bwd 128 at h=128 / 64 at h>=256 — the wide-h backward default is the
    # fresh-compile-safe fast point under the AOT compile service,
    # wideh_sched_probe.json); explicit values are numerics-safe row
    # partitioning and win at every hidden size
    fwd_cap: Optional[int] = None
    bwd_cap: Optional[int] = None
    # "lecun" (flax default) | "torch" (re-draw params as torch.nn.Linear's
    # kaiming_uniform kernels + U(±1/√fan_in) biases — accuracy-parity
    # studies vs the reference; see models/initializers.py)
    init_style: str = "lecun"
    # channel-wise variants only — per-channel matmul form: "einsum"
    # (minimal FLOPs; the measured fastest train form at the reference
    # envelope — suite 10a-10d, ACCURACY.md round-4) | "blockdiag" (one
    # wide block-diagonal MXU dot per layer). Identical math either way.
    channel_impl: str = "einsum"
    # structured metrics (train_metrics.jsonl) alongside the text logs
    jsonl_metrics: bool = True
    # route the DAE no-encode forward through the fused Pallas kernel pair
    # (~5x faster rollout)
    fused: bool = False
    # teacher forcing (ref my_solvers.py:74,111-119): feed the TRUE previous
    # state (input_true_x) and/or TRUE lagged algebraic output (input_true_i,
    # DAE only) to each step; the encode variants teacher-force in LATENT
    # space. With fused=True every registered combination has a TPU-native
    # path: TF-x ODE and full-TF DAE run time-PARALLEL (no sequential
    # dependence remains), TF-i DAE rides the fused ODE kernel, TF-x DAE the
    # fused kernel pair — no-encode and direct-encode alike.
    input_true_x: bool = False
    input_true_i: bool = False
    # multi-shooting: split the horizon into K windows trained in parallel
    # ((step-1) must be divisible by K). gap_weight penalizes
    # window-boundary continuity defects. DECISION RULE (long horizons,
    # T~1000): train with robust_loss BPTT first — at the full reference
    # envelope (3200 samples x 400 epochs) it converges ~10x lower than
    # multishoot K=20, while unguarded BPTT diverges (ACCURACY.md
    # full-envelope study). Reach for multi-shooting (n_windows=20,
    # gap_weight=0.3; keep windows >= ~50 steps — 25-step windows
    # under-constrain the rollout and diverge) when the epoch/wall-clock
    # budget is SMALL (it beats BPTT's final loss within ~30 epochs at ~3x
    # less wall clock) or when guarded BPTT still diverges on your data
    # (measured instance: dae_channelwise at the full envelope — plain AND
    # guarded BPTT both hit NaN; multishoot is the one option that
    # survives the full budget, though its stitched full-rollout eval
    # stays noisy on that family — ACCURACY.md round-4).
    n_windows: Optional[int] = None
    gap_weight: float = 1.0
    # keep the whole training set resident on device and gather batches by
    # index inside the jitted step — removes per-step host→device transfers
    # (measured 43 ms/step through this machine's device tunnel). Applied
    # when the dataset fits under device_data_max_bytes; single-device only.
    device_data: bool = True
    device_data_max_bytes: int = 2 << 30
    # checkpoint backend: "npz" (reference-parity single-file snapshots) or
    # "orbax" (directory checkpoints that ALSO capture the optimizer state —
    # the reference loses it on resume). Names stay model_checkpoint.{epoch}.
    checkpointer: str = "npz"
    orbax_keep: Optional[int] = None  # retain last N orbax epochs (None=all)
    # crash recovery: on train() start, discover the newest
    # model_checkpoint.{epoch} in the model dir and continue from epoch+1
    # in the SAME directory (orbax restores opt_state exactly → the resumed
    # run is bitwise-identical to an uninterrupted one; npz restores params
    # only and restarts the optimizer, logged as a warning).
    auto_resume: bool = False


class Trainer:
    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        self.variant: Variant = get_variant(cfg.variant)
        if cfg.checkpointer not in ("npz", "orbax"):
            raise ValueError(
                f'checkpointer must be "npz" or "orbax", got {cfg.checkpointer!r}'
            )
        if (cfg.input_true_x or cfg.input_true_i) and cfg.n_windows:
            raise ValueError(
                "teacher forcing and multi-shooting are mutually exclusive "
                "(multi-shooting IS windowed teacher forcing)"
            )
        # The fused kernels carry their own memory policy (the fused VJP
        # stores O(T·state) residual streams, not O(T·width) activations —
        # ops/fused_dae_vjp.py) and never consult cfg.remat, so asking for
        # a specific XLA-scan policy alongside --fused is a contradiction:
        # error on the explicit adjoint request, warn on the rest.
        if cfg.fused and cfg.remat == "adjoint":
            raise ValueError(
                "remat='adjoint' is an XLA-scan-path policy; the fused "
                "kernels ignore remat (their VJP already keeps only "
                "O(T*state) residuals). Drop --fused to train with the "
                "adjoint pass, or drop --remat adjoint to keep the fused "
                "kernels (see MIGRATION.md: fused x remat)."
            )
        if (
            cfg.fused
            and cfg.remat is not True
            # the one fused config that still rides the XLA scan (and so
            # honors remat): channel-wise multishoot has no fused kernel
            and not (cfg.n_windows and "channelwise" in cfg.variant)
        ):
            import logging as _logging

            _logging.getLogger("py_psnode_tpu").warning(
                "remat=%r is ignored on the fused path: the fused VJP is "
                "its own memory policy (O(T*state) residuals).", cfg.remat,
            )
        if (cfg.fwd_lanes, cfg.time_block, cfg.fwd_cap, cfg.bwd_cap) != (
            None, None, None, None,
        ):
            from py_psnode_tpu.ops.fused_dae import set_kernel_tuning

            set_kernel_tuning(cfg.fwd_lanes, cfg.time_block,
                              cfg.fwd_cap, cfg.bwd_cap)
        self.n_proc = jax.process_count()
        self.proc_id = jax.process_index()
        self.is_lead = self.proc_id == 0
        self.pod = cfg.dcn_size is not None or self.n_proc > 1
        if self.pod:
            from py_psnode_tpu.parallel.distributed import make_pod_mesh

            self.mesh = make_pod_mesh(dcn_size=cfg.dcn_size)
            # batch shards over BOTH axes: hierarchical all-reduce (ICI
            # within a slice, DCN across)
            self._bspec = PartitionSpec(tuple(self.mesh.axis_names))
        else:
            self.mesh = make_mesh(cfg.n_devices) if cfg.n_devices else None
        if self.mesh is not None:
            div = self._batch_div()
            if cfg.batch % div:
                raise ValueError(
                    f"batch ({cfg.batch}) must be divisible by the number of "
                    f"devices the batch shards over ({div})"
                )
        self.larger_than = (
            self.variant.larger_than if cfg.larger_than == "variant" else cfg.larger_than
        )

    # ------------------------------------------------------------- sharding

    def _batch_div(self) -> int:
        """Number of devices the batch axis shards over."""
        if self.mesh is None:
            return 1
        if self.pod:
            return int(np.prod(self.mesh.devices.shape))
        return int(self.mesh.devices.shape[0])

    def _rep(self) -> NamedSharding:
        return NamedSharding(self.mesh, PartitionSpec())

    def _bsh(self) -> NamedSharding:
        if self.pod:
            return NamedSharding(self.mesh, self._bspec)
        return batch_sharding(self.mesh)

    def _put_replicated(self, tree):
        """Device-put a (host-identical) pytree fully replicated over the
        mesh. Works under multi-controller: every process holds the full
        value, so each contributes all its addressable shards."""
        if self.mesh is None:
            return jax.tree_util.tree_map(jnp.asarray, tree)
        return jax.device_put(tree, self._rep())

    def _put_batch(self, arr):
        """Device-put one GLOBAL host array with the leading (batch) axis
        sharded. Under multi-controller each process contributes only its
        host-local row block (the ``dcn`` axis is the process axis, so
        process p owns rows [p*n/P, (p+1)*n/P))."""
        if self.mesh is None:
            return jnp.asarray(arr)
        sh = self._bsh()
        if self.n_proc > 1:
            arr = np.asarray(arr)
            n = arr.shape[0]
            lo = self.proc_id * n // self.n_proc
            hi = (self.proc_id + 1) * n // self.n_proc
            return jax.make_array_from_process_local_data(
                sh, arr[lo:hi], arr.shape
            )
        return jax.device_put(arr, sh)

    # ------------------------------------------------------------------ data

    def load_train_dataset(self):
        cfg, v = self.cfg, self.variant
        cls = DaeSamples if v.kind == "dae" else OdeSamples
        return cls.load(
            cfg.train_data,
            num_sample=cfg.num,
            cut_length=cfg.step,
            contain_larger_than=self.larger_than,
        )

    def load_test_dataset(self):
        cfg, v = self.cfg, self.variant
        if v.kind == "dae":
            return DaeSamples.load(cfg.test_data, cut_length=cfg.step)
        return OdeSamples.load(cfg.test_data)

    # ----------------------------------------------------------------- model

    def build_model(self, ds):
        cfg = self.cfg
        dims = dataset_dims(self.variant, ds)
        kw = dict(solver=cfg.solver, remat=cfg.remat, unroll=cfg.unroll)
        if "channelwise" in self.variant.name:
            # per-channel matmul form: "einsum" (minimal FLOPs, fastest
            # full train step — suite 10a-10d) or "blockdiag" (one wide
            # MXU dot; see PerChannelMLP.impl)
            kw["channel_impl"] = cfg.channel_impl
        elif cfg.channel_impl != "einsum":
            raise ValueError(
                "channel_impl applies to the channel-wise variants only"
            )
        model = self.variant.make_model(dims, cfg.hidden, **kw)
        batch = pad_batch(next(ds.batches(min(2, len(ds)))), 1)
        args = tuple(jnp.asarray(batch[k]) for k in self.variant.batch_args)
        params = model.init(jax.random.PRNGKey(cfg.seed), *args)
        if cfg.init_style == "torch":
            from py_psnode_tpu.models.initializers import torch_style_init

            params = torch_style_init(
                params, jax.random.PRNGKey(cfg.seed + 1)
            )
        elif cfg.init_style != "lecun":
            raise ValueError(
                f'init_style must be "lecun" or "torch", got {cfg.init_style!r}'
            )
        return model, params, dims

    # ------------------------------------------------------------ train step

    def _forward_fn(self, model):
        variant = self.variant
        cfg = self.cfg
        interpret = jax.default_backend() == "cpu"  # Pallas on CPU = interpreter
        tf_x, tf_i = cfg.input_true_x, cfg.input_true_i
        if tf_x or tf_i:
            return self._teacher_forced_forward(model, interpret)
        if self.cfg.fused and variant.name == "dae_no_encode":
            from py_psnode_tpu.ops import fused_dae_apply

            dims4 = (model.x_dim, model.z_dim, model.v_dim, model.i_dim)
            return lambda params, batch: fused_dae_apply(
                params, batch, dims4, model.hidden_dim, solver=model.solver,
                interpret=interpret, precision=cfg.matmul_precision,
            )
        if self.cfg.fused and variant.name == "ode_no_encode":
            from py_psnode_tpu.ops.fused_ode import fused_ode_apply

            return lambda params, batch: fused_ode_apply(
                params, batch, x_dim=model.x_dim, solver=model.solver,
                interpret=interpret, precision=cfg.matmul_precision,
            )
        if self.cfg.fused and variant.name == "ode_encode":
            from py_psnode_tpu.ops.fused_ode import fused_ode_encode_apply

            return lambda params, batch: fused_ode_encode_apply(
                params, batch, model.hidden_dim, solver=model.solver,
                interpret=interpret, precision=cfg.matmul_precision,
            )
        if self.cfg.fused and variant.name == "dae_encode":
            from py_psnode_tpu.ops import fused_dae_encode_apply

            dims4 = (model.x_dim, model.z_dim, model.v_dim, model.i_dim)
            return lambda params, batch: fused_dae_encode_apply(
                params, batch, dims4, model.hidden_dim, solver=model.solver,
                interpret=interpret, precision=cfg.matmul_precision,
            )
        if self.cfg.fused and variant.name == "ode_channelwise":
            from py_psnode_tpu.ops.fused_channelwise import fused_cw_ode_apply

            dims2 = (model.x_dim, model.z_dim)
            return lambda params, batch: fused_cw_ode_apply(
                params, batch, dims2, model.hidden_dim, solver=model.solver,
                interpret=interpret, precision=cfg.matmul_precision,
            )
        if self.cfg.fused and variant.name == "dae_channelwise":
            from py_psnode_tpu.ops.fused_channelwise import fused_cw_dae_apply

            dims4 = (model.x_dim, model.z_dim, model.v_dim, model.i_dim)
            return lambda params, batch: fused_cw_dae_apply(
                params, batch, dims4, model.hidden_dim, solver=model.solver,
                interpret=interpret, precision=cfg.matmul_precision,
            )
        return lambda params, batch: model.apply(
            params, *[batch[k] for k in variant.batch_args]
        )

    def _teacher_forced_forward(self, model, interpret):
        """Dispatch the teacher-forcing forward (see TrainConfig docstring
        for the fused-path matrix)."""
        import logging

        cfg, variant = self.cfg, self.variant
        tf_x, tf_i = cfg.input_true_x, cfg.input_true_i
        if variant.kind == "ode" and tf_i:
            raise ValueError(
                "input_true_i applies to DAE variants only (ODEs have no "
                "algebraic output)"
            )
        if "channelwise" in variant.name:
            raise ValueError(
                "the channel-wise family defines no teacher forcing "
                "(ref neural_base.py has none for it)"
            )
        if cfg.n_windows:
            raise ValueError(
                "teacher forcing and multi-shooting are mutually exclusive "
                "(multi-shooting IS windowed teacher forcing)"
            )
        if cfg.fused:
            from py_psnode_tpu.ops import teacher_forcing as TF

            if variant.name == "ode_no_encode" and tf_x:
                return lambda p, b: TF.tf_parallel_ode_apply(
                    p, b, model.x_dim, model.hidden_dim, solver=model.solver
                )
            if variant.name == "ode_encode" and tf_x:
                return lambda p, b: TF.tf_parallel_ode_encode_apply(
                    p, b, model.hidden_dim, solver=model.solver
                )
            if variant.name == "dae_no_encode":
                dims = (model.x_dim, model.z_dim, model.v_dim, model.i_dim)
                if tf_x and tf_i:  # both carries from data → time-parallel
                    return lambda p, b: TF.tf_parallel_dae_apply(
                        p, b, dims, model.hidden_dim, solver=model.solver
                    )
                if tf_x:  # fused kernel pair with the true-state streams
                    return lambda p, b: TF.fused_dae_tf_x_apply(
                        p, b, dims, model.hidden_dim, solver=model.solver,
                        interpret=interpret, precision=cfg.matmul_precision,
                    )
                # tf_i only: fold the known i stream into the fused ODE kernel
                return lambda p, b: TF.fused_dae_tf_i_apply(
                    p, b, dims, model.hidden_dim, solver=model.solver,
                    interpret=interpret, precision=cfg.matmul_precision,
                )
            if variant.name == "dae_encode":
                # same TF structure, teacher-forced in LATENT space (the
                # model encodes x_true/i_true — models/dae.py:170-187)
                dims = (model.x_dim, model.z_dim, model.v_dim, model.i_dim)
                if tf_x and tf_i:
                    return lambda p, b: TF.tf_parallel_dae_encode_apply(
                        p, b, dims, model.hidden_dim, solver=model.solver
                    )
                if tf_x:
                    return lambda p, b: TF.fused_dae_encode_tf_x_apply(
                        p, b, dims, model.hidden_dim, solver=model.solver,
                        interpret=interpret, precision=cfg.matmul_precision,
                    )
                return lambda p, b: TF.fused_dae_encode_tf_i_apply(
                    p, b, dims, model.hidden_dim, solver=model.solver,
                    interpret=interpret, precision=cfg.matmul_precision,
                )
            # unreachable for the registered variants (kept as a safety net
            # for future families without fused TF kernels)
            logging.getLogger("py_psnode_tpu").warning(
                "fused=True with teacher forcing (%s, input_true_x=%s, "
                "input_true_i=%s) has no fused kernel for this combination; "
                "falling back to the XLA scan forward.",
                variant.name, tf_x, tf_i,
            )
        kwargs = {"input_true_x": tf_x}
        if variant.kind == "dae":
            kwargs["input_true_i"] = tf_i
        return lambda params, batch: model.apply(
            params, *[batch[k] for k in variant.batch_args], **kwargs
        )

    def _multishoot_forward(self, model):
        from py_psnode_tpu.train import multishoot_forward as MS

        cfg, variant = self.cfg, self.variant
        interpret = jax.default_backend() == "cpu"
        if variant.name == "ode_no_encode":
            if cfg.fused:
                return lambda p, b: MS.fused_multishoot_ode_apply(
                    p, b, model.x_dim, model.hidden_dim, cfg.n_windows,
                    solver=model.solver, interpret=interpret,
                    precision=cfg.matmul_precision,
                )
            return lambda p, b: MS.multishoot_ode_apply(
                p, b, model.x_dim, model.hidden_dim, cfg.n_windows,
                solver=model.solver, remat=cfg.remat, unroll=cfg.unroll,
            )
        if variant.name == "dae_no_encode":
            dims = (model.x_dim, model.z_dim, model.v_dim, model.i_dim)
            if cfg.fused:
                return lambda p, b: MS.fused_multishoot_dae_apply(
                    p, b, dims, model.hidden_dim, cfg.n_windows,
                    solver=model.solver, interpret=interpret,
                    precision=cfg.matmul_precision,
                )
            return lambda p, b: MS.multishoot_dae_apply(
                p, b, dims, model.hidden_dim, cfg.n_windows,
                solver=model.solver, remat=cfg.remat, unroll=cfg.unroll,
            )
        if variant.name == "ode_encode":
            if cfg.fused:
                return lambda p, b: MS.fused_multishoot_ode_encode_apply(
                    p, b, model.hidden_dim, cfg.n_windows,
                    solver=model.solver, interpret=interpret,
                    precision=cfg.matmul_precision,
                )
            return lambda p, b: MS.multishoot_ode_encode_apply(
                p, b, model.hidden_dim, cfg.n_windows,
                solver=model.solver, remat=cfg.remat, unroll=cfg.unroll,
            )
        if variant.name == "dae_encode":
            dims = (model.x_dim, model.z_dim, model.v_dim, model.i_dim)
            if cfg.fused:
                return lambda p, b: MS.fused_multishoot_dae_encode_apply(
                    p, b, dims, model.hidden_dim, cfg.n_windows,
                    solver=model.solver, interpret=interpret,
                    precision=cfg.matmul_precision,
                )
            return lambda p, b: MS.multishoot_dae_encode_apply(
                p, b, dims, model.hidden_dim, cfg.n_windows,
                solver=model.solver, remat=cfg.remat, unroll=cfg.unroll,
            )
        if variant.name == "ode_channelwise":
            # XLA path for both fused settings: the fused channel-wise
            # kernel ties the XLA scan on-chip (ACCURACY.md), so there is
            # no fused multishoot counterpart to prefer
            return lambda p, b: MS.multishoot_cw_ode_apply(
                p, b, model.x_dim, model.z_dim, model.hidden_dim,
                cfg.n_windows, solver=model.solver, remat=cfg.remat,
                unroll=cfg.unroll, channel_impl=model.channel_impl,
            )
        if variant.name == "dae_channelwise":
            dims = (model.x_dim, model.z_dim, model.v_dim, model.i_dim)
            return lambda p, b: MS.multishoot_cw_dae_apply(
                p, b, dims, model.hidden_dim, cfg.n_windows,
                solver=model.solver, remat=cfg.remat, unroll=cfg.unroll,
                channel_impl=model.channel_impl,
            )
        raise ValueError(
            f"multi-shooting has no forward for variant {variant.name}"
        )

    def _make_train_step(self, model, tx, device_data=None):
        variant = self.variant
        cfg = self.cfg
        precision = cfg.matmul_precision
        if cfg.n_windows:
            ms_forward = self._multishoot_forward(model)

            def loss_of(params, batch):
                with jax.default_matmul_precision(precision) if precision != "default" else _nullcontext():
                    out, gaps = ms_forward(params, batch)
                loss, aux = variant.loss_fn(out, batch)
                gap_loss = (
                    cfg.gap_weight * jnp.mean(gaps**2)
                    if gaps.shape[0]
                    else jnp.asarray(0.0)
                )
                aux = dict(aux, gap_loss=gap_loss, loss=aux["loss"] + gap_loss)
                return loss + gap_loss, aux

        else:
            forward = self._forward_fn(model)

            def loss_of(params, batch):
                with jax.default_matmul_precision(precision) if precision != "default" else _nullcontext():
                    out = forward(params, batch)
                return variant.loss_fn(out, batch)

        if cfg.robust_loss:
            base_loss_of = loss_of
            # Scalar-loss adaptation of the reference's never-wired guard
            # (ref utils.py:29-42). The per-element form pins EVERY loss in
            # [1e-6, 1] to 1.0 when no limit is set — degenerate for the
            # scalar training loss — so here the direction-preserving
            # normalization loss/stop_grad(loss) engages only above
            # robust_limit (default 1.0), and NaN still takes a
            # zero-gradient zero step. The verbatim per-element guard
            # remains available as losses.robust_time_series_loss.
            robust_limit = 1.0 if cfg.robust_limit is None else float(cfg.robust_limit)

            def loss_of(params, batch):
                loss, aux = base_loss_of(params, batch)
                rloss, tripped = robust_scalar_guard(loss, robust_limit)
                aux = dict(aux, robust_tripped=tripped.astype(jnp.float32))
                return rloss, aux

        def step(params, opt_state, batch):
            (loss, aux), grads = jax.value_and_grad(loss_of, has_aux=True)(
                params, batch
            )
            if cfg.robust_loss:
                # see optim.zero_nonfinite_grads: a forward NaN must not
                # poison Adam's moments through the where-grad pitfall
                grads = zero_nonfinite_grads(grads)
            gnorm = reference_grad_norm(grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            # Zero-loss guard, deliberately STRONGER than the reference:
            # ref script1:359 skips only backward() on the ODE drivers (the
            # DAE drivers have no guard at all) but still runs opt.step(),
            # so params can drift on stale Adam momentum. Here params are
            # frozen for ALL variants when loss == 0 (opt_state still
            # advances with the zero-ish grads, mirroring the reference's
            # opt.step()). Same spirit as the documented clip/no-op note in
            # optim.py — an intentional hardening, not a parity bug.
            keep = loss != 0.0
            params = jax.tree_util.tree_map(
                lambda n, o: jnp.where(keep, n, o), new_params, params
            )
            return params, opt_state, aux, gnorm

        if device_data is not None:
            # device-resident dataset: gather the batch by index inside jit
            # (idx/sample_w are the only per-step host→device transfers).
            # Under a mesh the dataset is replicated and the index vector is
            # batch-sharded, so each device gathers its own batch shard
            # locally.
            def step_idx(params, opt_state, idx, sample_w):
                batch = {k: v[idx] for k, v in device_data.items()}
                batch["sample_w"] = sample_w
                # padded rows repeat the last real index; zero their gathered
                # mask so masked loss terms match pad_batch (host path)
                # semantics exactly when len(train_ds) % batch != 0
                batch["mask"] = batch["mask"] * sample_w[:, None, None]
                return step(params, opt_state, batch)

            if self.mesh is not None:
                rep, bsh = self._rep(), self._bsh()
                return jax.jit(
                    step_idx,
                    in_shardings=(rep, rep, bsh, bsh),
                    out_shardings=(rep, rep, rep, rep),
                    donate_argnums=(0, 1),
                )
            return jax.jit(step_idx, donate_argnums=(0, 1))

        if self.mesh is not None:
            rep, bsh = self._rep(), self._bsh()
            return jax.jit(
                step,
                in_shardings=(rep, rep, bsh),
                out_shardings=(rep, rep, rep, rep),
                donate_argnums=(0, 1),
            )
        return jax.jit(step, donate_argnums=(0, 1))

    def _eval_batch_size(self, test_ds):
        """Reference eval-batch rule (N/10); small sets run as one batch.
        Under a mesh, round up to a multiple of the data-axis size so the
        batch axis shards evenly (_run_eval pads trailing batches to a
        static shape anyway)."""
        n = len(test_ds)
        b = n if n <= 512 else max(int(n / 10), 1)
        if self.variant.eval_batch_capped:
            # The variant's forward materializes [T, b, h, h] activations
            # (funcs.ChannelWiseAEFunc.yh_func_v applied across the whole
            # solution), so a whole-test-set eval batch OOMs HBM at the
            # reference envelope: f32[1001,320,128,128] = 21 GB.
            # The training batch is proven to fit (it BACKPROPS through the
            # same net), so cap the forward-only eval there.
            b = min(b, self.cfg.batch)
        if self.mesh is not None:
            d = self._batch_div()
            b = -(-b // d) * d
        return b

    def _make_eval_apply(self, model, test_ds):
        """Index-based eval function: the test set stays device-resident
        (when it fits) and per-sample losses reduce ON DEVICE — only small
        loss arrays (plus predictions when drawing) return to the host.
        Per-epoch eval H2D traffic through the device tunnel previously
        dominated long runs.

        Under a mesh the eval set is replicated, the index vector is
        batch-sharded, and the forward jits with the same shardings as the
        train step — every device evaluates its own batch shard instead of
        replicating the whole eval pass."""
        variant = self.variant
        forward = self._forward_fn(model)
        cfg = self.cfg
        mesh = self.mesh
        keys = variant.batch_args + ("mask",)
        n_bytes = sum(getattr(test_ds, k).nbytes for k in keys)
        device_resident = n_bytes <= cfg.device_data_max_bytes
        if device_resident:
            ddata = {
                k: self._put_replicated(getattr(test_ds, k)) for k in keys
            }
        else:  # fall back to host slicing + per-batch transfer
            host = {k: getattr(test_ds, k) for k in keys}

        def compute(params, batch, want_preds):
            out = forward(params, batch)
            if variant.kind == "dae":
                x_pred, i_pred = out[0], out[1]
            else:
                x_pred = out[0] if isinstance(out, tuple) else out
                i_pred = None
            mask = batch["mask"]
            res = {
                "x_loss_ps": jnp.sum((x_pred - batch["x"]) ** 2 * mask, axis=1)
            }
            if i_pred is not None:
                res["i_loss_ps"] = jnp.sum(
                    (i_pred - batch["i"]) ** 2 * mask, axis=1
                )
            if want_preds:
                res["x_pred"] = x_pred
                if i_pred is not None:
                    res["i_pred"] = i_pred
            return res

        if device_resident:
            def fwd_impl(params, idx, want_preds):
                batch = {k: v[idx] for k, v in ddata.items()}
                return compute(params, batch, want_preds)
        else:
            def fwd_impl(params, batch, want_preds):
                return compute(params, batch, want_preds)

        if mesh is not None:
            rep, bsh = self._rep(), self._bsh()
            # multi-controller: replicate the (small, on-device-reduced)
            # eval outputs so every process can read them back to the host
            out_sh = rep if self.n_proc > 1 else bsh
            fwd = jax.jit(
                fwd_impl, static_argnums=2,
                in_shardings=(rep, bsh), out_shardings=out_sh,
            )
            put = self._put_batch
        else:
            fwd = jax.jit(fwd_impl, static_argnums=2)
            put = jnp.asarray

        if device_resident:
            def apply_fn_factory(params, want_preds=False):
                return lambda idx: fwd(params, put(np.asarray(idx)), want_preds)
        else:
            # slice on the host OUTSIDE jit (numpy can't index by a tracer),
            # transfer the batch, then run the jitted forward
            def apply_fn_factory(params, want_preds=False):
                def call(idx):
                    batch = {k: put(v[idx]) for k, v in host.items()}
                    return fwd(params, batch, want_preds)
                return call

        return apply_fn_factory

    def _prep_batch(self, batch, pad_to):
        n_real = batch["t"].shape[0]
        batch = pad_batch(batch, pad_to)
        batch["sample_w"] = (np.arange(batch["t"].shape[0]) < n_real).astype(
            np.float32
        )
        if self.mesh is not None:
            batch = {k: self._put_batch(v) for k, v in batch.items()}
        return batch

    # ------------------------------------------------------------------ train

    def train(self):
        cfg, variant = self.cfg, self.variant
        train_ds = self.load_train_dataset()
        test_ds = self.load_test_dataset()
        eval_batch = self._eval_batch_size(test_ds)

        model, params, dims = self.build_model(train_ds)
        steps_per_epoch = -(-len(train_ds) // cfg.batch)
        tx = make_optimizer(
            cfg.learning_rate, cfg.epoch, steps_per_epoch, cfg.sch_gamma,
            cfg.gradient_clip, skip_nonfinite=cfg.skip_nonfinite,
        )
        # under multi-controller the jitted step's replicated in_shardings
        # require GLOBAL arrays; init is deterministic so every process holds
        # the same values and replication is a pure placement
        params = self._put_replicated(params)
        opt_state = tx.init(params)

        # model path (+ resume-from-checkpoint branching, ref :297-305; a
        # checkpoint is an npz FILE or an orbax model_checkpoint.N DIR)
        import re as _re

        from py_psnode_tpu.train.checkpoints import (
            OrbaxCheckpointer,
            list_checkpoints,
            load_checkpoint_params,
        )

        model_path = pathlib.Path(cfg.model)
        is_ckpt_dir = model_path.is_dir() and _re.fullmatch(
            r"model_checkpoint\.\d+", model_path.name
        )
        if model_path.exists() and (not model_path.is_dir() or is_ckpt_dir):
            params = self._put_replicated(load_checkpoint_params(model_path))
            opt_state = tx.init(params)
            model_path = model_path.parent / (model_path.name + "_branch")
        elif cfg.warm_start:
            # warm start WITHOUT the reference's branch-dir coupling: init
            # params from a checkpoint (file, orbax dir, or a run dir —
            # resolved to its best-eval epoch) and train into cfg.model as
            # usual. Fresh optimizer state; epoch counter starts at 1. The
            # lever behind horizon-curriculum recipes (cw_curriculum.py).
            from py_psnode_tpu.train.checkpoints import resolve_checkpoint

            ws = resolve_checkpoint(pathlib.Path(cfg.warm_start))
            params = self._put_replicated(load_checkpoint_params(ws))
            opt_state = tx.init(params)
        model_path.mkdir(parents=True, exist_ok=True)
        ckptr = (
            OrbaxCheckpointer(model_path, keep=cfg.orbax_keep)
            if cfg.checkpointer == "orbax"
            else None
        )

        # crash→auto-resume: continue from the newest LOADABLE epoch in the
        # SAME dir (a checkpoint truncated by the crash being recovered from
        # falls back to the previous epoch instead of failing the recovery)
        start_epoch = 1
        resume_note = None
        if cfg.auto_resume:
            skipped = []
            for ep, cpath in list_checkpoints(model_path):
                try:
                    if cpath.is_dir() and ckptr is not None:
                        state = ckptr.restore(
                            cpath,
                            template={"params": params, "opt_state": opt_state},
                        )
                        params = self._put_replicated(state["params"])
                        opt_state = self._put_replicated(state["opt_state"])
                        resume_note = (
                            f"auto-resume from {cpath.name} (orbax, "
                            "opt_state restored)"
                        )
                    else:
                        params = self._put_replicated(
                            load_checkpoint_params(cpath)
                        )
                        opt_state = tx.init(params)
                        resume_note = (
                            f"auto-resume from {cpath.name} (params only — "
                            "optimizer state restarted; use "
                            "checkpointer='orbax' for exact resume)"
                        )
                except Exception as e:  # corrupt/partial — try the older one
                    skipped.append(f"{cpath.name} ({type(e).__name__})")
                    continue
                if skipped:
                    resume_note += f"; skipped corrupt: {', '.join(skipped)}"
                start_epoch = ep + 1
                break

        # multi-controller resume must be CONSISTENT: npz snapshots are
        # written by process 0 only, so on a pod without a shared model dir
        # each process would scan a different checkpoint set, pick different
        # start epochs, and run different numbers of global steps — SPMD
        # divergence that hangs on the first collective of the extra epoch.
        # Broadcast process 0's decision and fail fast on any mismatch.
        if cfg.auto_resume and jax.process_count() > 1:
            from jax.experimental import multihost_utils

            lead_start = int(
                multihost_utils.broadcast_one_to_all(np.int32(start_epoch))
            )
            if lead_start != start_epoch:
                raise RuntimeError(
                    f"auto-resume divergence: process {self.proc_id} found "
                    f"start_epoch={start_epoch} but process 0 found "
                    f"{lead_start}. Multi-host auto-resume requires a SHARED "
                    "model dir (npz snapshots are lead-written; orbax also "
                    "assumes one filesystem)."
                )

        # multi-controller: process 0 keeps the reference log names; other
        # processes write to *.procN.log files (same content is computed
        # everywhere — the replicated loss fetches are global reads)
        sfx = "" if self.is_lead else f".proc{self.proc_id}"
        logger = Logger(
            model_path, f"training{sfx}.log", f"testing{sfx}.log",
            echo=cfg.echo_logs and self.is_lead,
        )
        if resume_note:
            logger.training_log(resume_note)
        metrics = (
            JsonlMetrics(model_path / "train_metrics.jsonl")
            if cfg.jsonl_metrics and self.is_lead
            else None
        )
        logger.training_log(
            f"training_data: {cfg.train_data}, testing_data: {cfg.test_data}, "
            f"train_size: {cfg.num}, batch_size: {cfg.batch}, "
            f"hidden_dim: {cfg.hidden}, epoch: {cfg.epoch}, "
            f"cut_length: {cfg.step}, learning_rate: {cfg.learning_rate}"
        )

        # device-resident training data when it fits (replicated under a
        # mesh so every device gathers its own batch shard locally)
        data_keys = variant.batch_args + ("mask",)
        n_bytes = sum(getattr(train_ds, k).nbytes for k in data_keys)
        use_device_data = cfg.device_data and n_bytes <= cfg.device_data_max_bytes
        if use_device_data:
            device_data = {
                k: self._put_replicated(getattr(train_ds, k))
                for k in data_keys
            }
        else:
            device_data = None
        train_step = self._make_train_step(model, tx, device_data=device_data)
        apply_fn_factory = self._make_eval_apply(model, test_ds)
        # want_preds must be UNIFORM across processes: it is a static arg of
        # the jitted eval forward, whose in/out shardings span the global pod
        # mesh — gating it per-process would make process 0 launch a program
        # (extra pred outputs + their all-gather) the others never enter, and
        # the first eval would deadlock the pod. Only the jpg WRITES are
        # lead-gated, via pic_path.
        want_eval_preds = bool(cfg.drawing)
        pic_path = model_path / "pics" if cfg.drawing and self.is_lead else None
        eval_fn = E.evaluate_dae if variant.kind == "dae" else E.evaluate_ode

        train_error_list, eval_error_list = [], []
        nrec = cfg.loss_record_iter
        # robust_tripped rides the same batched device fetch as the losses
        log_keys = variant.loss_keys + (
            ("robust_tripped",) if cfg.robust_loss else ()
        )
        records = {k: np.zeros(nrec) for k in log_keys}
        grad_record = np.zeros(nrec)

        logger.testing_log("=" * 86)
        logger.testing_log("Initial evaluate on testing set.")
        eval_error_list.append(
            eval_fn(
                apply_fn_factory(params, want_preds=want_eval_preds),
                test_ds, eval_batch, logger,
                desc="Testing_Epoch_0", pic_path=pic_path,
                show_larger_than=self.larger_than,
            )
        )
        logger.testing_log("=" * 86)
        logger.training_log(f"Start training {variant.name} model")
        logger.training_log("=" * 86)

        last_epoch = cfg.epoch
        if cfg.stop_after is not None:
            # truncated run UNDER the full cfg.epoch schedule: the lr decay,
            # checkpoints, and logs are exactly the full run's first N epochs
            # (sizing the schedule by a reduced --epoch instead would decay
            # the lr faster and make the truncation non-predictive)
            last_epoch = min(last_epoch, int(cfg.stop_after))
        epochs = range(start_epoch, last_epoch + 1)
        if cfg.progress:
            epochs = tqdm(epochs, desc="Epoch", ncols=80)
        def _epoch_steps(epoch):
            """Yield per-batch train_step argument tuples for this epoch."""
            if use_device_data:
                order = np.random.default_rng(cfg.seed + epoch).permutation(
                    len(train_ds)
                )
                for s in range(0, len(order), cfg.batch):
                    idx = order[s : s + cfg.batch]
                    n_real = len(idx)
                    if n_real < cfg.batch:
                        idx = np.concatenate(
                            [idx, np.repeat(idx[-1:], cfg.batch - n_real)]
                        )
                    w = (np.arange(cfg.batch) < n_real).astype(np.float32)
                    yield (self._put_batch(idx), self._put_batch(w))
            else:
                for batch in train_ds.batches(
                    cfg.batch, shuffle=True, seed=cfg.seed + epoch
                ):
                    yield (self._prep_batch(batch, cfg.batch),)

        for epoch in epochs:
            t_phase = time.perf_counter()
            pending = []  # device scalars; fetched in one batch at flush time
            lagged_flush = None  # previous window, host copy in flight

            def _emit_window(i_b, window, flat):
                # blocking host read — by now the async copy has landed
                vals = np.asarray(flat)
                nk = len(log_keys)
                for row, (j, _, _) in enumerate(window):
                    for ki, k in enumerate(log_keys):
                        records[k][j % nrec] = vals[row * nk + ki]
                    grad_record[j % nrec] = vals[len(window) * nk + row]
                means = {k: records[k].mean() for k in log_keys}
                parts = ", ".join(f"{k}: {means[k]:14.10f}" for k in log_keys)
                logger.training_log(
                    f"Training epoch {epoch}: Batch{i_b + 1 - nrec:4} "
                    f"to {i_b + 1:4}: {parts}, "
                    f"gradient_norm: {grad_record.mean():14.10f}."
                )
                train_error_list.append(
                    [means[k] for k in variant.loss_keys]
                    if variant.kind == "dae"
                    else [means["loss"]]
                )
                if metrics is not None:
                    metrics.log(
                        kind="train", epoch=epoch, batch=i_b + 1,
                        grad_norm=float(grad_record.mean()), **means,
                    )

            for i_batch, step_args in enumerate(_epoch_steps(epoch)):
                params, opt_state, aux, gnorm = train_step(
                    params, opt_state, *step_args
                )
                # keep aux on device — a float() here costs a device round
                # trip per batch, which dominated long runs on this machine
                pending.append((i_batch, aux, gnorm))
                if (i_batch + 1) % nrec == 0:
                    flat = jnp.stack(
                        [a[k] for _, a, _ in pending for k in log_keys]
                        + [g for _, _, g in pending]
                    )
                    # start the device->host copy WITHOUT blocking dispatch,
                    # and materialize it one record window later: the ~40 ms
                    # tunnel round trip hides under the next window's steps
                    # (5 blocking syncs/epoch cost 0.18 s at the reference
                    # envelope). Log content and order are unchanged; lines
                    # land one window late.
                    try:
                        flat.copy_to_host_async()
                    except AttributeError:  # non-PJRT array (CPU tests)
                        pass
                    if lagged_flush is not None:
                        _emit_window(*lagged_flush)
                    lagged_flush = (i_batch, pending, flat)
                    pending = []
            if lagged_flush is not None:
                _emit_window(*lagged_flush)
            logger.training_log("-" * 86)
            t_steps, t_phase = time.perf_counter() - t_phase, time.perf_counter()

            # per-epoch checkpoint + eval + history + export (ref :388-402).
            # orbax saves are collective (every process participates; orbax
            # elects the writer); npz snapshots are written by process 0.
            if ckptr is not None:
                ckptr.save(epoch, params, opt_state)
            elif self.is_lead:
                from py_psnode_tpu.export import save_params_npz

                save_params_npz(model_path / f"model_checkpoint.{epoch}", params)
            t_ckpt, t_phase = time.perf_counter() - t_phase, time.perf_counter()
            logger.testing_log("=" * 86)
            logger.testing_log(f"Training Epoch {epoch}, evaluate on testing set.")
            eval_error_list.append(
                eval_fn(
                    apply_fn_factory(params, want_preds=want_eval_preds),
                    test_ds, eval_batch, logger,
                    desc=f"Testing_Epoch_{epoch}", pic_path=pic_path,
                    show_larger_than=self.larger_than,
                )
            )
            logger.testing_log("=" * 86)
            t_eval, t_phase = time.perf_counter() - t_phase, time.perf_counter()
            if self.is_lead:
                np.savez(
                    str(model_path / "train_and_eval.npz"),
                    train=np.array(train_error_list, dtype=object),
                    eval=np.array(eval_error_list, dtype=object),
                )
            if metrics is not None:
                ev = eval_error_list[-1]
                rec = {"kind": "eval", "epoch": epoch, "x_loss": float(ev[0])}
                if variant.kind == "dae":
                    rec["i_loss"] = float(ev[1])
                metrics.log(**rec)
            if self.is_lead:
                variant.export_fn(model, params, dims, model_path / "saved model")
            if metrics is not None:
                # per-phase epoch wall breakdown (steps = compute+dispatch up
                # to the last record-window sync; export includes the
                # train_and_eval.npz history rewrite)
                metrics.log(
                    kind="epoch_time", epoch=epoch,
                    steps_s=round(t_steps, 4), ckpt_s=round(t_ckpt, 4),
                    eval_s=round(t_eval, 4),
                    export_s=round(time.perf_counter() - t_phase, 4),
                )

        if self.is_lead:
            variant.export_fn(model, params, dims, model_path / "saved model")
        if ckptr is not None:
            ckptr.wait()
        if variant.kind == "dae":
            E.output_training_process_dae(logger, eval_error_list)
        else:
            E.output_training_process_ode(logger, eval_error_list)
        logger.close()
        return params, model_path

    # ------------------------------------------------------------------- test

    def test(self):
        """--testing mode (ref :406-433): load checkpoint file, evaluate."""
        cfg, variant = self.cfg, self.variant
        test_ds = self.load_test_dataset()
        eval_batch = self._eval_batch_size(test_ds)
        model, _, dims = self.build_model(test_ds)
        from py_psnode_tpu.train.checkpoints import (
            load_checkpoint_params,
            resolve_checkpoint,
        )

        # a run DIRECTORY resolves to its best-eval epoch (early-stop restore)
        model_path = resolve_checkpoint(pathlib.Path(cfg.model))
        params = load_checkpoint_params(model_path)
        pic_path = model_path.parent / "pics" if cfg.drawing else None
        logger = Logger(
            model_path.parent,
            test_log_name=f"Model_{model_path.name}_Evaluation.log",
            echo=cfg.echo_logs,
        )
        logger.testing_log(f"Model {model_path} Evaluation")
        logger.testing_log(f"Use testing data: {cfg.test_data}")
        logger.testing_log("=" * 86)
        eval_fn = E.evaluate_dae if variant.kind == "dae" else E.evaluate_ode
        result = eval_fn(
            self._make_eval_apply(model, test_ds)(
                params, want_preds=pic_path is not None
            ),
            test_ds, eval_batch, logger,
            desc=f"Model {model_path.name} Evaluation", pic_path=pic_path,
            show_larger_than=self.larger_than,
        )
        logger.testing_log("=" * 86)
        logger.close()
        # testing-mode results file (ref neural_01_DAE_02_direct_encode.py:450
        # — only script 4 saves it; generalized to every variant here). The
        # reference's ``dtype=object`` KWARG lands as a saved key named
        # "dtype"; the key set is pinned for .npz compatibility.
        np.savez(
            model_path.parent / "evaluation.npz",
            train_error_list=np.asarray([], dtype=object),
            eval=result, dtype=np.asarray(object),
        )
        return result

    # ------------------------------------------------------------------- save

    def save(self):
        """--saving mode (ref :434-450): load checkpoint → export artifacts."""
        cfg, variant = self.cfg, self.variant
        test_ds = self.load_test_dataset()
        model, _, dims = self.build_model(test_ds)
        from py_psnode_tpu.train.checkpoints import (
            load_checkpoint_params,
            resolve_checkpoint,
        )

        model_path = resolve_checkpoint(pathlib.Path(cfg.model))
        params = load_checkpoint_params(model_path)
        variant.export_fn(model, params, dims, model_path.parent / "saved model")
        return model_path.parent / "saved model"
