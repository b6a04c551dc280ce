"""CLI entry for the dae_no_encode variant (ref /root/reference/neural_01_DAE_01_no_encode.py)."""

from py_psnode_tpu.cli.common import main

if __name__ == "__main__":
    main("dae_no_encode")
