from py_psnode_tpu.cli.common import build_parser, main  # noqa: F401
