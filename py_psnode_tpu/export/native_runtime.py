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
        fp = ctypes.POINTER(ctypes.c_float)
        lib.psnode_ode_rollout.argtypes = [
            ctypes.c_void_p, fp, fp, fp,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, fp,
        ]
        lib.psnode_ode_rollout.restype = ctypes.c_int
        lib.psnode_dae_rollout.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            fp, fp, fp, fp,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_char_p, fp, fp,
        ]
        lib.psnode_dae_rollout.restype = ctypes.c_int
        lib.psnode_ode_encode_rollout.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            fp, fp, fp,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, fp,
        ]
        lib.psnode_ode_encode_rollout.restype = ctypes.c_int
        lib.psnode_dae_encode_rollout.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p,
            fp, fp, fp, fp,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_char_p, fp, fp,
        ]
        lib.psnode_dae_encode_rollout.restype = ctypes.c_int
        lib.psnode_cw_ode_rollout.argtypes = [
            ctypes.c_void_p, fp, fp, fp,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, fp,
        ]
        lib.psnode_cw_ode_rollout.restype = ctypes.c_int
        lib.psnode_cw_dae_rollout.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, fp, fp, fp, fp,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_char_p, fp, fp,
        ]
        lib.psnode_cw_dae_rollout.restype = ctypes.c_int
        lib.psnode_stepper_create.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.psnode_stepper_create.restype = ctypes.c_void_p
        lib.psnode_stepper_free.argtypes = [ctypes.c_void_p]
        lib.psnode_stepper_init.argtypes = [
            ctypes.c_void_p, fp, fp, fp, fp, fp, fp,
        ]
        lib.psnode_stepper_init.restype = ctypes.c_int
        lib.psnode_stepper_step.argtypes = [
            ctypes.c_void_p, ctypes.c_float, fp, fp, fp, fp, fp, fp,
        ]
        lib.psnode_stepper_step.restype = ctypes.c_int
        _lib = lib
    return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


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


def ode_rollout(de: NativeModule, t, x0, z, solver="euler"):
    """Full neural-ODE rollout in the C++ runtime (the PSOPS-embedding time
    loop, ref my_solvers.py:52-80; events are the caller's concern — feed
    the post-event ``z`` stream).

    Args: ``t [T]``, ``x0 [B, xd]``, ``z [T, B, zd]`` (time-major).
    Returns ``x_solution [T, B, xd]``.
    """
    lib = _get_lib()
    t = np.ascontiguousarray(t, np.float32).reshape(-1)
    x0 = np.ascontiguousarray(x0, np.float32)
    z = np.ascontiguousarray(z, np.float32)
    T, (B, xd), zd = t.shape[0], x0.shape, z.shape[-1]
    out = np.empty((T, B, xd), np.float32)
    rc = lib.psnode_ode_rollout(
        de._handle, _fptr(t), _fptr(x0), _fptr(z),
        T, B, xd, zd, solver.encode(), _fptr(out),
    )
    if rc != 0:
        raise RuntimeError(f"psnode_ode_rollout failed rc={rc}")
    return out


def ode_encode_rollout(de: NativeModule, x_encoder: NativeModule,
                       x_decoder: NativeModule, z_encoder: NativeModule,
                       t, x0, z, solver="euler"):
    """Full direct-encode neural-ODE rollout in the C++ runtime
    (ref neural_00_ODE_02_direct_encode.py:60-89, no events): encode the
    initial state and the ``z`` stream, integrate the latent dynamics,
    decode every row.

    Args: ``t [T]``, ``x0 [B, xd]``, ``z [T, B, zd]`` (time-major).
    Returns ``x_pred [T, B, xd]``.
    """
    lib = _get_lib()
    t = np.ascontiguousarray(t, np.float32).reshape(-1)
    x0 = np.ascontiguousarray(x0, np.float32)
    z = np.ascontiguousarray(z, np.float32)
    T, (B, xd), zd = t.shape[0], x0.shape, z.shape[-1]
    out = np.empty((T, B, xd), np.float32)
    rc = lib.psnode_ode_encode_rollout(
        de._handle, x_encoder._handle, x_decoder._handle, z_encoder._handle,
        _fptr(t), _fptr(x0), _fptr(z),
        T, B, xd, zd, solver.encode(), _fptr(out),
    )
    if rc != 0:
        raise RuntimeError(f"psnode_ode_encode_rollout failed rc={rc}")
    return out


def dae_encode_rollout(de: NativeModule, ae: NativeModule, init: NativeModule,
                       x_encoder: NativeModule, x_decoder: NativeModule,
                       z_encoder, v_encoder: NativeModule,
                       i_encoder: NativeModule, i_decoder: NativeModule,
                       t, z, v, i0, solver="euler"):
    """Full direct-encode neural-DAE rollout in the C++ runtime
    (ref neural_01_DAE_02_direct_encode.py:103-153, no events): five codecs,
    raw learned init, latent lagged-``i`` integration, decoded outputs with
    the initial row forced to the raw Init output (ref :150).
    ``z_encoder`` may be ``None`` when ``z`` has width 0 (ref :107-109).

    Args: ``t [T]``, ``z [T, B, zd]``, ``v [T, B, vd]``, ``i0 [B, id]``.
    Returns ``(x_pred [T, B, xd], i_pred [T, B, id])``.
    """
    lib = _get_lib()
    t = np.ascontiguousarray(t, np.float32).reshape(-1)
    z = np.ascontiguousarray(z, np.float32)
    v = np.ascontiguousarray(v, np.float32)
    i0 = np.ascontiguousarray(i0, np.float32)
    T, B = t.shape[0], i0.shape[0]
    zd, vd, idim = z.shape[-1], v.shape[-1], i0.shape[-1]
    xd = init.out_dim("init_fun/")
    x_out = np.empty((T, B, xd), np.float32)
    i_out = np.empty((T, B, idim), np.float32)
    rc = lib.psnode_dae_encode_rollout(
        de._handle, ae._handle, init._handle,
        x_encoder._handle, x_decoder._handle,
        z_encoder._handle if z_encoder is not None else None,
        v_encoder._handle, i_encoder._handle, i_decoder._handle,
        _fptr(t), _fptr(z), _fptr(v), _fptr(i0),
        T, B, xd, zd, vd, idim, solver.encode(), _fptr(x_out), _fptr(i_out),
    )
    if rc != 0:
        raise RuntimeError(f"psnode_dae_encode_rollout failed rc={rc}")
    return x_out, i_out


def cw_ode_rollout(de: NativeModule, t, x0, z, solver="euler"):
    """Full channel-wise neural-ODE rollout in the C++ runtime
    (models/channelwise.ChannelWiseODEModel, no events): per-channel
    encoders, latent ``[B, xd, h]`` integration with the shared vertical
    net over the channel axis, per-channel decode.

    ``de`` is the channel-wise ``de_func`` export (per-channel-sliced bin).
    Args: ``t [T]``, ``x0 [B, xd]``, ``z [T, B, zd]``.
    Returns ``x_pred [T, B, xd]``.
    """
    lib = _get_lib()
    t = np.ascontiguousarray(t, np.float32).reshape(-1)
    x0 = np.ascontiguousarray(x0, np.float32)
    z = np.ascontiguousarray(z, np.float32)
    T, (B, xd), zd = t.shape[0], x0.shape, z.shape[-1]
    out = np.empty((T, B, xd), np.float32)
    rc = lib.psnode_cw_ode_rollout(
        de._handle, _fptr(t), _fptr(x0), _fptr(z),
        T, B, xd, zd, solver.encode(), _fptr(out),
    )
    if rc != 0:
        raise RuntimeError(f"psnode_cw_ode_rollout failed rc={rc}")
    return out


def cw_dae_rollout(de: NativeModule, ae: NativeModule, t, x0, z, v, i_dim,
                   solver="euler"):
    """Full channel-wise neural-DAE rollout in the C++ runtime
    (models/channelwise.ChannelWiseDAEModel, no events): the latent ODE of
    :func:`cw_ode_rollout` plus the decoupled channel-wise algebraic
    readout at every time point.

    Args: ``t [T]``, ``x0 [B, xd]``, ``z [T, B, zd]``, ``v [T, B, vd]``.
    Returns ``(x_pred [T, B, xd], i_pred [T, B, i_dim])``.
    """
    lib = _get_lib()
    t = np.ascontiguousarray(t, np.float32).reshape(-1)
    x0 = np.ascontiguousarray(x0, np.float32)
    z = np.ascontiguousarray(z, np.float32)
    v = np.ascontiguousarray(v, np.float32)
    T, (B, xd), zd, vd = t.shape[0], x0.shape, z.shape[-1], v.shape[-1]
    x_out = np.empty((T, B, xd), np.float32)
    i_out = np.empty((T, B, i_dim), np.float32)
    rc = lib.psnode_cw_dae_rollout(
        de._handle, ae._handle, _fptr(t), _fptr(x0), _fptr(z), _fptr(v),
        T, B, xd, zd, vd, i_dim, solver.encode(), _fptr(x_out), _fptr(i_out),
    )
    if rc != 0:
        raise RuntimeError(f"psnode_cw_dae_rollout failed rc={rc}")
    return x_out, i_out


def dae_rollout(de: NativeModule, ae: NativeModule, init: NativeModule,
                t, z, v, i0, solver="euler", x_dim=None):
    """Full semi-explicit neural-DAE rollout in the C++ runtime
    (ref my_solvers.py:82-131, no events): learned init, lagged-``i``
    steps, direct algebraic evaluation per time point.

    Args: ``t [T]``, ``z [T, B, zd]``, ``v [T, B, vd]``, ``i0 [B, id]``.
    Returns ``(x_solution [T, B, xd], i_solution [T, B, id])``.
    """
    lib = _get_lib()
    t = np.ascontiguousarray(t, np.float32).reshape(-1)
    z = np.ascontiguousarray(z, np.float32)
    v = np.ascontiguousarray(v, np.float32)
    i0 = np.ascontiguousarray(i0, np.float32)
    T, B = t.shape[0], i0.shape[0]
    zd, vd, idim = z.shape[-1], v.shape[-1], i0.shape[-1]
    xd = x_dim if x_dim is not None else init.out_dim("init_fun/")
    x_out = np.empty((T, B, xd), np.float32)
    i_out = np.empty((T, B, idim), np.float32)
    rc = lib.psnode_dae_rollout(
        de._handle, ae._handle, init._handle,
        _fptr(t), _fptr(z), _fptr(v), _fptr(i0),
        T, B, xd, zd, vd, idim, solver.encode(), _fptr(x_out), _fptr(i_out),
    )
    if rc != 0:
        raise RuntimeError(f"psnode_dae_rollout failed rc={rc}")
    return x_out, i_out


class NativeStepper:
    """Incremental per-step evaluation — the TRUE PSOPS co-simulation
    contract: the host simulator advances the surrogate one step per network
    solution step and feeds back the bus voltage it just solved (the role
    the reference's TorchScript exports play inside PSOPS,
    ``/root/reference/README.md:45``). The rollout helpers above need the
    whole input stream up front; this carries ``(all_initial, x_t, i_t)``
    across calls. Events are the host's concern: pass post-jump ``z``/``v``
    for the step starting at the event time.

    ``variant``: ``ode | dae | ode_encode | dae_encode | cw_ode | cw_dae``.
    ``modules``: the same NativeModule handles, in the same order, as the
    matching rollout helper (``dae_encode``'s z_encoder entry may be None
    when ``zd == 0``).
    """

    def __init__(self, variant: str, modules, *, batch: int, x_dim: int,
                 z_dim: int = 0, v_dim: int = 0, i_dim: int = 0,
                 solver: str = "euler"):
        lib = _get_lib()
        self._lib = lib
        self._modules = list(modules)  # keep handles alive
        arr = (ctypes.c_void_p * len(self._modules))(
            *[m._handle if m is not None else None for m in self._modules]
        )
        self.B, self.xd, self.zd = batch, x_dim, z_dim
        self.vd, self.id = v_dim, i_dim
        self._dae = variant in ("dae", "dae_encode", "cw_dae")
        self._handle = lib.psnode_stepper_create(
            variant.encode(), solver.encode(), arr, len(self._modules),
            batch, x_dim, z_dim, v_dim, i_dim,
        )
        if not self._handle:
            raise RuntimeError(
                f"psnode_stepper_create failed for variant={variant!r} "
                f"(check solver / module order / dims)"
            )

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.psnode_stepper_free(self._handle)
            self._handle = None

    def _row(self, a, d, name):
        # None passes through as a null pointer — the C side validates which
        # inputs each variant actually requires (e.g. DAE families take no
        # x0: the learned Init net produces it).
        if a is None:
            return None, None
        a = np.ascontiguousarray(a, np.float32)
        if a.shape != (self.B, d):
            raise ValueError(f"{name}: expected {(self.B, d)}, got {a.shape}")
        return a, _fptr(a)

    def init(self, *, x0=None, z0=None, v0=None, i0=None):
        """Initialize at t0; returns the surrogate's own initial outputs
        ``x0_out [B, xd]`` (ODE families: the given/encoded x0; DAE
        families: the learned Init output — DAE-encode keeps the ref's
        x_pred[0]=raw-Init overwrite, script4:150) and, for DAE families,
        ``i0_out [B, id]``."""
        _x, px = self._row(x0, self.xd, "x0")
        _z, pz = self._row(z0, self.zd, "z0")
        _v, pv = self._row(v0, self.vd, "v0")
        _i, pi = self._row(i0, self.id, "i0")
        x_out = np.empty((self.B, self.xd), np.float32)
        i_out = (np.empty((self.B, self.id), np.float32)
                 if self._dae else None)
        rc = self._lib.psnode_stepper_init(
            self._handle, px, pz, pv, pi, _fptr(x_out),
            _fptr(i_out) if i_out is not None else None,
        )
        if rc != 0:
            raise RuntimeError(f"psnode_stepper_init failed rc={rc}")
        return (x_out, i_out) if self._dae else x_out

    def step(self, dt, *, z_prev=None, v_prev=None, z_next=None, v_next=None):
        """Advance one step of ``dt``: drive inputs are held over the step
        (reference semantics, my_fixed_grid.py:20-32); the algebraic output
        is evaluated at t+dt with ``z_next``/``v_next``
        (ref my_solvers.py:121). Returns ``x [B, xd]`` (and ``i [B, id]``
        for DAE families)."""
        _zp, pzp = self._row(z_prev, self.zd, "z_prev")
        _vp, pvp = self._row(v_prev, self.vd, "v_prev")
        _zn, pzn = self._row(z_next, self.zd, "z_next")
        _vn, pvn = self._row(v_next, self.vd, "v_next")
        x_out = np.empty((self.B, self.xd), np.float32)
        i_out = (np.empty((self.B, self.id), np.float32)
                 if self._dae else None)
        rc = self._lib.psnode_stepper_step(
            self._handle, ctypes.c_float(dt), pzp, pvp, pzn, pvn,
            _fptr(x_out), _fptr(i_out) if i_out is not None else None,
        )
        if rc != 0:
            raise RuntimeError(f"psnode_stepper_step failed rc={rc}")
        return (x_out, i_out) if self._dae else x_out
