"""CLI entry for the channel-wise DAE family (repaired
ref /root/reference/neural_dae/neural_base.py:199-255 — ``DAE_Base`` is
broken in the reference; this is the runnable end-to-end equivalent)."""

from py_psnode_tpu.cli.common import main

if __name__ == "__main__":
    main("dae_channelwise")
