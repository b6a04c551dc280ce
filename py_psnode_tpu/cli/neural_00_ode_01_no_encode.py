"""CLI entry for the ode_no_encode variant (ref /root/reference/neural_00_ODE_01_no_encode.py)."""

from py_psnode_tpu.cli.common import main

if __name__ == "__main__":
    main("ode_no_encode")
