"""ctypes binding for the C++ inference runtime (native/psnode_infer.cpp).

This is the host-simulator embedding path: the TPU-native analogue of PSOPS
loading the reference's TorchScript exports (/root/reference/README.md:45).
Builds the shared library on demand with make/g++ if it isn't present.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import List

import numpy as np

NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
LIB_PATH = NATIVE_DIR / "libpsnode_infer.so"


def build_library(force: bool = False) -> pathlib.Path:
    if LIB_PATH.exists() and not force:
        return LIB_PATH
    subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True, capture_output=True)
    return LIB_PATH


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(build_library()))
        lib.psnode_load.restype = ctypes.c_void_p
        lib.psnode_load.argtypes = [ctypes.c_char_p]
        lib.psnode_free.argtypes = [ctypes.c_void_p]
        lib.psnode_num_nets.argtypes = [ctypes.c_void_p]
        lib.psnode_num_nets.restype = ctypes.c_int
        lib.psnode_net_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.psnode_net_name.restype = ctypes.c_char_p
        lib.psnode_net_in_dim.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.psnode_net_in_dim.restype = ctypes.c_int
        lib.psnode_net_out_dim.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.psnode_net_out_dim.restype = ctypes.c_int
        lib.psnode_forward.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.psnode_forward.restype = ctypes.c_int
        _lib = lib
    return _lib


class NativeModule:
    """A loaded ``<name>.weights.bin`` artifact evaluated by the C++ runtime."""

    def __init__(self, weights_bin_path):
        lib = _get_lib()
        self._lib = lib
        self._handle = lib.psnode_load(str(weights_bin_path).encode())
        if not self._handle:
            raise RuntimeError(f"failed to load {weights_bin_path}")

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.psnode_free(self._handle)
            self._handle = None

    @property
    def nets(self) -> List[str]:
        n = self._lib.psnode_num_nets(self._handle)
        return [
            self._lib.psnode_net_name(self._handle, k).decode() for k in range(n)
        ]

    def in_dim(self, net: str) -> int:
        return self._lib.psnode_net_in_dim(self._handle, net.encode())

    def out_dim(self, net: str) -> int:
        return self._lib.psnode_net_out_dim(self._handle, net.encode())

    def forward(self, net: str, x: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(x, dtype=np.float32)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None]
        B, d = x.shape
        din = self.in_dim(net)
        if din < 0:
            raise RuntimeError(f"unknown net {net!r}; have {self.nets}")
        if d != din:
            raise ValueError(f"{net}: expected input dim {din}, got {d}")
        y = np.empty((B, self.out_dim(net)), dtype=np.float32)
        rc = self._lib.psnode_forward(
            self._handle,
            net.encode(),
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            B,
        )
        if rc != 0:
            raise RuntimeError(f"unknown net {net!r}; have {self.nets}")
        return y[0] if squeeze else y
