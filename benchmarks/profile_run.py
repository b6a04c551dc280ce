"""Capture a device profile of the training step.

Writes a Perfetto/TensorBoard-compatible trace directory:

    python benchmarks/profile_run.py [outdir=/tmp/psnode_trace]

Open with `tensorboard --logdir <outdir>` or ui.perfetto.dev. This is the
live replacement for the reference's commented-out profiler block
(neural_00_ODE_02_direct_encode.py:301-307).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/psnode_trace"
    import jax
    import jax.numpy as jnp
    import optax

    from py_psnode_tpu.cli.common import enable_compile_cache
    from py_psnode_tpu.models import DAEModel
    from py_psnode_tpu.ops import fused_dae_apply
    from py_psnode_tpu.train.losses import dae_no_encode_loss
    from py_psnode_tpu.train.optim import make_optimizer
    from py_psnode_tpu.utils.profiling import trace

    enable_compile_cache()
    rng = np.random.default_rng(0)
    f32 = np.float32
    B, T, h = 64, 1001, 128
    t = (np.cumsum(np.full((B, T, 1), 0.01, f32), axis=1) - 0.01).astype(f32)
    batch = {
        "t": t,
        "x": rng.normal(size=(B, T, 2)).astype(f32),
        "z": rng.normal(size=(B, T, 1)).astype(f32),
        "v": rng.normal(size=(B, T, 2)).astype(f32),
        "i": rng.normal(size=(B, T, 2)).astype(f32),
        "event_t": np.full((B, 2), -1.0, f32),
        "z_jump": rng.normal(size=(B, 2, 1)).astype(f32),
        "v_jump": rng.normal(size=(B, 2, 2)).astype(f32),
        "mask": np.ones((B, T, 1), f32),
    }
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    keys = ("t", "x", "z", "v", "i", "event_t", "z_jump", "v_jump")
    model = DAEModel(x_dim=2, z_dim=1, v_dim=2, i_dim=2, hidden_dim=h, solver="rk4")
    params = model.init(jax.random.PRNGKey(0), *(jb[k] for k in keys))
    tx = make_optimizer(5e-3, 1, 1)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt_state, b):
        def loss_of(p):
            return dae_no_encode_loss(
                fused_dae_apply(p, b, (2, 1, 2, 2), h, solver="rk4"), b
            )[0]

        loss, grads = jax.value_and_grad(loss_of)(params)
        u, o2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, u), o2, loss

    params, opt, loss = step(params, opt, jb)
    float(loss)  # compile + warm outside the trace
    with trace(outdir):
        for _ in range(5):
            params, opt, loss = step(params, opt, jb)
        float(loss)
    print(f"trace written to {outdir}")


if __name__ == "__main__":
    main()
