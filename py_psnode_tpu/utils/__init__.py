from py_psnode_tpu.utils.logging import Logger  # noqa: F401
from py_psnode_tpu.utils.replay_buffer import ReplayBuffer  # noqa: F401
