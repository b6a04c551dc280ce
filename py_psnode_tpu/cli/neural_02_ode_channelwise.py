"""CLI entry for the channel-wise ODE family (repaired
ref /root/reference/neural_dae/neural_base.py:68-133 — the reference ships
this family in its package exports but never gave it a driver)."""

from py_psnode_tpu.cli.common import main

if __name__ == "__main__":
    main("ode_channelwise")
