"""Head-to-head accuracy run: the ACTUAL reference implementation vs
py_psnode_tpu, trained on identical synthetic data with an identical
protocol, scored by one shared float64 masked-MSE function.

This closes the unmeasured axis of the SURVEY north star (BASELINE.md:17
"matching trajectory RMSE"): the torch leg imports the reference's own
modules from /root/reference (models, solver, events, datasets, eval) and
drives them with a verbatim re-type of the reference training loop — the
scripts' ``__main__`` blocks are unreachable with external data because
``flg_debug=True`` clobbers argparse (``neural_00_ODE_01_no_encode.py:258``),
so the loop (``:339-404`` / ``neural_01_DAE_01_no_encode.py:395-419``,
including the quirks: x0_loss computed but NOT added for ODE, ω-row ×9
upweight for DAE, skip-backward-if-zero, per-param clip AFTER opt.step) is
reproduced here line for line around their unmodified classes. The reference
tree itself is never edited; its dead ``from ray.worker import init``
(``neural_dae/neural_base.py:4``) is satisfied with a sys.modules shim.

Data: shared-event synthetic sets (the reference's event handling reads the
schedule from batch element 0 only, ``neural_base.py:54``), float32 (the
reference loads .npz without casting, ``neural_base.py:25``).

Usage:
  python benchmarks/reference_headtohead.py --variant ode --epochs 40
  python benchmarks/reference_headtohead.py --variant dae --epochs 40
  python benchmarks/reference_headtohead.py --variant ode --encode ...
Writes benchmarks/headtohead_{variant}[_encode].json and prints a summary
table. With --encode the torch leg drives the reference's direct-encode
scripts (neural_00_ODE_02_direct_encode.py:264-276 loss: x0 ADDED + masked
x + recon; neural_01_DAE_02_direct_encode.py:355-370: x+i masked (no ω×9)
+ x0 + i0 + recon(x)+recon(i)) and ours runs the {ode,dae}_encode variants.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time
import types

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE = "/root/reference"


# --------------------------------------------------------------------- data

def make_data(workdir, variant, n_train, n_test, n_steps, seed,
              dataset="default"):
    from py_psnode_tpu.data.synthetic import (
        generate_avr_samples,
        generate_composite_load_dae_samples,
        generate_motor_dae_samples,
        generate_smib_dae_samples,
    )
    from py_psnode_tpu.data.schema import save_dae_samples, save_ode_samples

    workdir = pathlib.Path(workdir)
    workdir.mkdir(parents=True, exist_ok=True)

    def cast32(d):
        return {
            k: (np.asarray(v, np.float32) if k != "name" else v)
            for k, v in d.items()
        }

    paths = {}
    for split, n, s in (("training", n_train, seed), ("testing", n_test, seed + 1)):
        if variant == "ode":
            d = cast32(generate_avr_samples(n, n_steps=n_steps, seed=s,
                                            shared_events=True))
            save_ode_samples(workdir / f"{split}.npz", **d)
        else:
            gen = {
                "motor": generate_motor_dae_samples,
                "composite": generate_composite_load_dae_samples,
            }.get(dataset, generate_smib_dae_samples)
            d = cast32(gen(n, n_steps=n_steps, seed=s, shared_events=True))
            save_dae_samples(workdir / f"{split}.npz", **d)
        paths[split] = workdir / f"{split}.npz"
    return paths["training"], paths["testing"]


# ----------------------------------------------------- shared float64 scorer

def score(pred, data_npz, variant):
    """Masked per-dim MSE (and RMSE) in float64, the reference's eval formula
    (sum over time+samples of squared error × mask / sum(mask)) computed
    outside either framework."""
    d = np.load(data_npz, allow_pickle=True)
    mask = d["mask"].astype(np.float64)
    out = {}
    tot = 0.0
    for key in ("x",) if variant == "ode" else ("x", "i"):
        true = d[key].astype(np.float64)
        p = np.asarray(pred[key], np.float64)
        m = np.broadcast_to(mask, true.shape)
        per_dim = ((p - true) ** 2 * m).sum(axis=(0, 1)) / mask.sum()
        out[f"{key}_loss_per_dim"] = [float(v) for v in per_dim]
        out[f"{key}_loss"] = float(per_dim.sum())
        tot += float(per_dim.sum())
    out["total_loss"] = tot
    out["rmse"] = float(np.sqrt(tot))
    return out


# ------------------------------------------------------------- torch leg

def _import_reference():
    if "ray" not in sys.modules:
        ray = types.ModuleType("ray")
        ray.worker = types.SimpleNamespace(init=lambda *a, **k: None)
        sys.modules["ray"] = ray
        sys.modules["ray.worker"] = ray.worker
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


def run_torch(variant, train_npz, test_npz, out_dir, *, epochs, hidden,
              batch, seed, encode=False):
    """Train the reference's own model/solver/event/data classes with a
    verbatim re-type of its training loop (ODE: script1:339-404; DAE:
    script3:395-419; encode variants: script2:264-276 / script4:355-370).
    Returns eval history + final test-set predictions."""
    import torch
    import torch.nn as nn
    from torch.utils.data import DataLoader

    _import_reference()
    torch.manual_seed(seed)
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    from utils import Logger  # the reference's own Logger

    learning_rate, sch_gamma, gradient_clip = 0.005, 0.7, 1  # script1:46-51
    Loss_func = nn.functional.mse_loss

    import importlib

    if variant == "ode":
        mod = ("neural_00_ODE_02_direct_encode" if encode
               else "neural_00_ODE_01_no_encode")
        ref = importlib.import_module(mod)
        train_ds = ref.ODE_Curves_Sample(str(train_npz), torch.device("cpu"))
        test_ds = ref.ODE_Curves_Sample(str(test_npz), torch.device("cpu"))
        model = ref.ODE_Model(
            x_dim=train_ds.x.shape[-1], z_dim=train_ds.z.shape[-1],
            hidden_dim=hidden,
        )
    else:
        mod = ("neural_01_DAE_02_direct_encode" if encode
               else "neural_01_DAE_01_no_encode")
        ref = importlib.import_module(mod)
        train_ds = ref.DAE_Curves_Sample(str(train_npz), torch.device("cpu"))
        test_ds = ref.DAE_Curves_Sample(str(test_npz), torch.device("cpu"))
        model = ref.DAE_Model(
            x_dim=train_ds.x.shape[-1], z_dim=train_ds.z.shape[-1],
            v_dim=train_ds.v.shape[-1], i_dim=train_ds.i.shape[-1],
            hidden_dim=hidden,
        )

    device = torch.device("cpu")
    loader = DataLoader(train_ds, batch_size=batch, shuffle=True)
    eval_loader = DataLoader(
        test_ds, batch_size=max(int(test_ds.t.shape[0] / 10), 1),
        shuffle=False,
    )
    opt = torch.optim.Adam(model.parameters(), lr=learning_rate)
    sched = torch.optim.lr_scheduler.StepLR(
        opt, step_size=max(int(epochs / 10), 1), gamma=sch_gamma
    )
    logger = Logger(out_dir, "training.log", "testing.log")

    eval_hist = [
        ref.evalute_model(model=model, Loss_func=Loss_func,
                          eval_dataset=test_ds, eval_dataloader=eval_loader,
                          device=device, logger=logger, desc="Epoch_0",
                          pic_path=None)
    ]
    t0 = time.time()
    for epoch in range(1, epochs + 1):
        model.train()
        for data_batch in loader:
            sample_batched = [d.to(device) for d in data_batch]
            if variant == "ode" and encode:
                t, x, z, event_t, z_jump, mask = sample_batched
                x_pred, x_re = model.forward(t=t, x=x, z=z, event_t=event_t,
                                             z_jump=z_jump)
                # script2:264-276 — x0 IS added here (unlike no-encode),
                # plus the autoencoder reconstruction term
                x0_loss = Loss_func(x[:, 0, :], x_pred[:, 0, :]).view(1)
                x_loss = torch.sum(
                    torch.sum(Loss_func(x_pred, x, reduction="none") * mask,
                              dim=1), dim=0
                ) / torch.sum(mask)
                x_recon_loss = Loss_func(x_re, x).view(1)
                loss = (torch.sum(x0_loss) + torch.sum(x_loss)
                        + torch.sum(x_recon_loss))
                opt.zero_grad()
                if torch.all(loss != 0.0):
                    loss.backward()
                opt.step()
            elif variant == "ode":
                t, x, z, event_t, z_jump, mask = sample_batched
                x_pred = model.forward(t=t, x=x, z=z, event_t=event_t,
                                       z_jump=z_jump)
                # script1:353-359 — x0_loss computed but NOT added
                _ = Loss_func(x[:, 0, :], x_pred[:, 0, :]).view(1)
                x_loss = torch.sum(
                    torch.sum(Loss_func(x_pred, x, reduction="none") * mask,
                              dim=1), dim=0
                ) / torch.sum(mask)
                loss = torch.sum(x_loss)
                opt.zero_grad()
                if torch.all(loss != 0.0):
                    loss.backward()
                opt.step()
            elif encode:
                t, x, z, v, i, event_t, z_jump, v_jump, mask = sample_batched
                x_pred, i_pred, x_re, i_re = model.forward(
                    t=t, x=x, z=z, v=v, i=i, event_t=event_t,
                    z_jump=z_jump, v_jump=v_jump,
                )
                # script4:355-370 — NO ω×9 here (commented out in the ref);
                # x0 + i0 + recon(x) + recon(i) all added
                x_loss = torch.sum(
                    Loss_func(x_pred, x, reduction="none") * mask
                ) / torch.sum(mask)
                i_loss = torch.sum(
                    Loss_func(i_pred, i, reduction="none") * mask
                ) / torch.sum(mask)
                recon_loss = Loss_func(x_re, x) + Loss_func(i_re, i)
                loss = (x_loss + i_loss
                        + Loss_func(x[:, 0, :], x_pred[:, 0, :])
                        + Loss_func(i[:, 0, :], i_pred[:, 0, :])
                        + recon_loss)
                opt.zero_grad()
                loss.backward()
                opt.step()
            else:
                t, x, z, v, i, event_t, z_jump, v_jump, mask = sample_batched
                x_pred, i_pred = model.forward(
                    t=t, x=x, z=z, v=v, i=i, event_t=event_t,
                    z_jump=z_jump, v_jump=v_jump,
                )
                # script3:414-419 — ω row gets ×9 EXTRA weight
                x_loss = (
                    torch.sum(Loss_func(x_pred, x, reduction="none") * mask)
                    + torch.sum(
                        Loss_func(x_pred[:, :, 1:2], x[:, :, 1:2],
                                  reduction="none") * mask
                    ) * 9
                ) / torch.sum(mask)
                i_loss = torch.sum(
                    Loss_func(i_pred, i, reduction="none") * mask
                ) / torch.sum(mask)
                loss = (x_loss + i_loss
                        + Loss_func(x[:, 0, :], x_pred[:, 0, :])
                        + Loss_func(i[:, 0, :], i_pred[:, 0, :]))
                opt.zero_grad()
                loss.backward()
                opt.step()
            # script1:360-374 — per-param clip AFTER the step (a no-op on
            # the update; kept for faithfulness)
            for p in model.parameters():
                if p.grad is not None and p.requires_grad:
                    nn.utils.clip_grad.clip_grad_norm_(p, gradient_clip)
        sched.step()
        eval_hist.append(
            ref.evalute_model(model=model, Loss_func=Loss_func,
                              eval_dataset=test_ds,
                              eval_dataloader=eval_loader, device=device,
                              logger=logger, desc=f"Epoch_{epoch}",
                              pic_path=None)
        )
    train_wall = time.time() - t0

    # final predictions over the test set, in dataset order
    model.eval()
    preds_x, preds_i = [], []
    with torch.no_grad():
        for data_batch in DataLoader(test_ds, batch_size=batch, shuffle=False):
            sample_batched = [d.to(device) for d in data_batch]
            if variant == "ode":
                t, x, z, event_t, z_jump, mask = sample_batched
                xp = model.forward(t=t, x=x, z=z, event_t=event_t,
                                   z_jump=z_jump)
                if isinstance(xp, tuple):   # encode forward → (x_pred, x_re)
                    xp = xp[0]
                preds_x.append(xp.cpu().numpy())
            else:
                t, x, z, v, i, event_t, z_jump, v_jump, mask = sample_batched
                out = model.forward(t=t, x=x, z=z, v=v, i=i,
                                    event_t=event_t, z_jump=z_jump,
                                    v_jump=v_jump)
                xp, ip = out[0], out[1]     # encode appends (x_re, i_re)
                preds_x.append(xp.cpu().numpy())
                preds_i.append(ip.cpu().numpy())
    pred = {"x": np.concatenate(preds_x)}
    if preds_i:
        pred["i"] = np.concatenate(preds_i)
    hist = [float(np.sum([np.asarray(h[k], np.float64).sum()
                          for k in range(2 if variant == "dae" else 1)]))
            for h in eval_hist]
    return pred, {"eval_history": hist, "train_wall_s": train_wall}


# --------------------------------------------------------------- jax leg

def run_ours(variant, train_npz, test_npz, out_dir, *, epochs, hidden, batch,
             n_train, steps, seed, fused=True, precision="default",
             init_style="lecun", encode=False):
    from py_psnode_tpu.train import TrainConfig, Trainer

    cfg = TrainConfig(
        variant=f"{variant}_{'encode' if encode else 'no_encode'}",
        train_data=str(train_npz),
        test_data=str(test_npz),
        model=str(out_dir),
        num=n_train,
        batch=batch,
        hidden=hidden,
        epoch=epochs,
        step=steps,
        solver="euler",          # the reference hardcodes Euler (script1:75)
        larger_than=None,
        fused=fused,
        matmul_precision=precision,
        init_style=init_style,
        seed=seed,
        echo_logs=False,
    )
    tr = Trainer(cfg)
    t0 = time.time()
    params, model_path = tr.train()
    train_wall = time.time() - t0

    test_ds = tr.load_test_dataset()
    model, _, dims = tr.build_model(test_ds)
    res = tr._make_eval_apply(model, test_ds)(params, want_preds=True)(
        np.arange(len(test_ds))
    )
    pred = {"x": np.asarray(res["x_pred"])}
    if "i_pred" in res:
        pred["i"] = np.asarray(res["i_pred"])
    hist_npz = np.load(model_path / "train_and_eval.npz", allow_pickle=True)
    hist = [
        float(np.asarray(e[0], np.float64))
        + (float(np.asarray(e[1], np.float64)) if variant == "dae" else 0.0)
        for e in hist_npz["eval"]
    ]
    return pred, {"eval_history": hist, "train_wall_s": train_wall}


# -------------------------------------------------------------------- main

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=["ode", "dae"], required=True)
    ap.add_argument("--encode", action="store_true",
                    help="compare the direct-encode family (script2/script4)"
                         " instead of the no-encode one")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--steps", type=int, default=301)
    ap.add_argument("--n_train", type=int, default=320)
    ap.add_argument("--n_test", type=int, default=64)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no_fused", action="store_true",
                    help="run our leg on the XLA scan path instead of fused")
    ap.add_argument("--precision", default="default",
                    help="matmul_precision for our leg (default|highest|...)")
    ap.add_argument("--init", default="lecun",
                    help="init_style for our leg (lecun|torch)")
    ap.add_argument("--skip_torch", action="store_true")
    ap.add_argument("--dataset", choices=["default", "motor", "composite"],
                    default="default",
                    help="DAE data family: SMIB generator (default), the"
                         " induction-motor load class, or the composite"
                         " ZIP+motor load")
    ap.add_argument("--cpu", action="store_true",
                    help="run our leg on the JAX CPU backend (use with"
                         " --no_fused; Pallas on CPU is interpret-mode slow)")
    ap.add_argument("--tag", default="", help="suffix for the output json")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    sys.path.insert(0, str(REPO))
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from py_psnode_tpu.cli.common import enable_compile_cache

    enable_compile_cache()

    # Tag-suffixed workdir: tagged invocations (e.g. --tag _ti_s101) get a
    # fully private data/model tree. Sharing one tree across seeds is unsafe
    # twice over: data npz files are rewritten per seed (a concurrent reader
    # sees a truncated file) and the trainer's orbax auto-resume will silently
    # adopt a leftover epoch-N checkpoint from the previous seed's model dir.
    work = pathlib.Path(args.workdir
                        or (REPO / "benchmarks" / f"h2h_work{args.tag}"))
    ds_tag = "" if args.dataset == "default" else f"_{args.dataset}"
    data_dir = work / f"data_{args.variant}{ds_tag}"
    train_npz, test_npz = make_data(
        data_dir, args.variant, args.n_train, args.n_test, args.steps,
        args.seed, dataset=args.dataset,
    )
    print(f"[h2h] data written: {train_npz}", flush=True)

    fam = (f"{args.variant}_encode" if args.encode else args.variant) + ds_tag
    result = {
        "variant": args.variant,
        "family": fam,
        "ours_backend": (f"{'cpu' if args.cpu else 'tpu'}-"
                         f"{'xla' if args.no_fused else 'fused'}"),
        "protocol": {
            "epochs": args.epochs, "hidden": args.hidden,
            "steps": args.steps, "n_train": args.n_train,
            "n_test": args.n_test, "batch": args.batch,
            "solver": "euler", "lr": 5e-3, "sch_gamma": 0.7,
            "seed": args.seed, "dataset": args.dataset,
            # init of OUR leg; the torch leg always uses torch's default
            # nn.Linear init (the reference's). init="torch" matches the
            # distributions so convergence diffs can't hide in init.
            "init_style": args.init,
        },
    }

    pred_ours, meta_ours = run_ours(
        args.variant, train_npz, test_npz, work / f"ours_{fam}",
        epochs=args.epochs, hidden=args.hidden, batch=args.batch,
        n_train=args.n_train, steps=args.steps, seed=args.seed,
        fused=not args.no_fused, precision=args.precision,
        init_style=args.init, encode=args.encode,
    )
    result["ours"] = {**meta_ours, "final": score(pred_ours, test_npz,
                                                  args.variant)}
    print(f"[h2h] ours done: {result['ours']['final']}", flush=True)

    if not args.skip_torch:
        pred_t, meta_t = run_torch(
            args.variant, train_npz, test_npz, work / f"torch_{fam}",
            epochs=args.epochs, hidden=args.hidden, batch=args.batch,
            seed=args.seed, encode=args.encode,
        )
        result["torch_reference"] = {**meta_t,
                                     "final": score(pred_t, test_npz,
                                                    args.variant)}
        print(f"[h2h] torch done: {result['torch_reference']['final']}",
              flush=True)

    out = REPO / "benchmarks" / f"headtohead_{fam}{args.tag}.json"
    out.write_text(json.dumps(result, indent=2))
    print(f"[h2h] wrote {out}")

    # summary table
    rows = [("ours (py_psnode_tpu)", result["ours"])]
    if "torch_reference" in result:
        rows.append(("reference (torch)", result["torch_reference"]))
    print(f"\n== {fam.upper()} head-to-head "
          f"(epochs={args.epochs}, T={args.steps}, h={args.hidden}) ==")
    for name, r in rows:
        f = r["final"]
        extra = f" i_loss={f['i_loss']:.6f}" if "i_loss" in f else ""
        print(f"{name:24s} total={f['total_loss']:.6f} rmse={f['rmse']:.6f}"
              f" x_loss={f['x_loss']:.6f}{extra}"
              f"  wall={r['train_wall_s']:.1f}s")


if __name__ == "__main__":
    main()
