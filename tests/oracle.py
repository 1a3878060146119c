"""ctypes bindings to the compiled C reference (the golden oracle).

Builds /root/reference (read-only upstream) into a shared library under
build/ and exposes the exact exported entry points used for golden tests:
SPL primitives, the fixed-point FFT pair, the ring buffer, the delay
estimator, and the full AECM Create/Init/BufferFarend/Process API.

The reference sources are compiled, never copied: this module only links
against them as a test oracle (SURVEY.md §4 item 1).
"""
from __future__ import annotations

import ctypes as ct
import os
import subprocess
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REF = Path(os.environ.get("AECM_REFERENCE_DIR", "/root/reference"))
BUILD = REPO / "build"
LIB = BUILD / "libaecm_ref.so"

_C_SOURCES = ["complex_fft.c", "real_fft.c", "ring_buffer.c"]
_CC_SOURCES = [
    "aecm_core.cc",
    "aecm_core_c.cc",
    "echo_control_mobile.cc",
    "delay_estimator.cc",
    "delay_estimator_wrapper.cc",
    "signal_processing_library.cc",
]
_SHIM = Path(__file__).resolve().parent / "oracle_shim.cc"


def build_oracle(extra_defines=(), lib_path: Path = LIB) -> Path:
    BUILD.mkdir(exist_ok=True)
    srcs = [REF / "aecm" / s for s in _C_SOURCES + _CC_SOURCES] + [_SHIM]
    if lib_path.exists() and all(
            lib_path.stat().st_mtime > s.stat().st_mtime for s in srcs):
        return lib_path
    tag = lib_path.stem
    defines = ["-DNDEBUG"] + [f"-D{d}" for d in extra_defines]
    objs = []
    for s in _C_SOURCES:
        obj = BUILD / (tag + "." + s + ".o")
        subprocess.run(
            ["gcc", "-O2", "-fPIC", *defines, f"-I{REF}/aecm", "-c",
             str(REF / "aecm" / s), "-o", str(obj)],
            check=True)
        objs.append(str(obj))
    for s in _CC_SOURCES:
        obj = BUILD / (tag + "." + s + ".o")
        subprocess.run(
            ["g++", "-O2", "-fPIC", *defines, f"-I{REF}/aecm", "-c",
             str(REF / "aecm" / s), "-o", str(obj)],
            check=True)
        objs.append(str(obj))
    shim_obj = BUILD / (tag + ".oracle_shim.o")
    subprocess.run(
        ["g++", "-O2", "-fPIC", *defines, f"-I{REF}/aecm", "-c",
         str(_SHIM), "-o", str(shim_obj)], check=True)
    objs.append(str(shim_obj))
    subprocess.run(["g++", "-shared", "-o", str(lib_path)] + objs, check=True)
    return lib_path


class Oracle:
    def __init__(self, extra_defines=(), lib_path: Path = LIB):
        self.lib = ct.CDLL(str(build_oracle(extra_defines, lib_path)))
        lib = self.lib
        lib.WebRtcSpl_SqrtFloor.restype = ct.c_int32
        lib.WebRtcSpl_SqrtFloor.argtypes = [ct.c_int32]
        lib.WebRtcSpl_DivW32W16.restype = ct.c_int32
        lib.WebRtcSpl_DivW32W16.argtypes = [ct.c_int32, ct.c_int16]
        lib.WebRtcSpl_DivU32U16.restype = ct.c_uint32
        lib.WebRtcSpl_DivU32U16.argtypes = [ct.c_uint32, ct.c_uint16]
        lib.WebRtcSpl_RandU.restype = ct.c_int16
        lib.WebRtcSpl_RandU.argtypes = [ct.POINTER(ct.c_uint32)]
        lib.WebRtcSpl_ComplexFFT.restype = ct.c_int
        lib.WebRtcSpl_ComplexFFT.argtypes = [
            np.ctypeslib.ndpointer(np.int16, flags="C"), ct.c_int, ct.c_int]
        lib.WebRtcSpl_ComplexIFFT.restype = ct.c_int
        lib.WebRtcSpl_ComplexIFFT.argtypes = lib.WebRtcSpl_ComplexFFT.argtypes
        lib.WebRtcSpl_ComplexBitReverse.restype = None
        lib.WebRtcSpl_ComplexBitReverse.argtypes = [
            np.ctypeslib.ndpointer(np.int16, flags="C"), ct.c_int]
        lib.WebRtcSpl_CreateRealFFT.restype = ct.c_void_p
        lib.WebRtcSpl_CreateRealFFT.argtypes = [ct.c_int]
        lib.WebRtcSpl_RealForwardFFT.restype = ct.c_int
        lib.WebRtcSpl_RealForwardFFT.argtypes = [
            ct.c_void_p,
            np.ctypeslib.ndpointer(np.int16, flags="C"),
            np.ctypeslib.ndpointer(np.int16, flags="C")]
        lib.WebRtcSpl_RealInverseFFT.restype = ct.c_int
        lib.WebRtcSpl_RealInverseFFT.argtypes = lib.WebRtcSpl_RealForwardFFT.argtypes
        # Ring buffer
        lib.WebRtc_CreateBuffer.restype = ct.c_void_p
        lib.WebRtc_CreateBuffer.argtypes = [ct.c_size_t, ct.c_size_t]
        lib.WebRtc_InitBuffer.argtypes = [ct.c_void_p]
        lib.WebRtc_FreeBuffer.argtypes = [ct.c_void_p]
        lib.WebRtc_WriteBuffer.restype = ct.c_size_t
        lib.WebRtc_WriteBuffer.argtypes = [ct.c_void_p, ct.c_void_p, ct.c_size_t]
        lib.WebRtc_ReadBuffer.restype = ct.c_size_t
        lib.WebRtc_ReadBuffer.argtypes = [
            ct.c_void_p, ct.POINTER(ct.c_void_p), ct.c_void_p, ct.c_size_t]
        lib.WebRtc_MoveReadPtr.restype = ct.c_int
        lib.WebRtc_MoveReadPtr.argtypes = [ct.c_void_p, ct.c_int]
        lib.WebRtc_available_read.restype = ct.c_size_t
        lib.WebRtc_available_read.argtypes = [ct.c_void_p]
        lib.WebRtc_available_write.restype = ct.c_size_t
        lib.WebRtc_available_write.argtypes = [ct.c_void_p]
        # Delay estimator wrapper (via extern "C" shim, see oracle_shim.cc)
        lib.ref_CreateDelayEstimatorFarend.restype = ct.c_void_p
        lib.ref_CreateDelayEstimatorFarend.argtypes = [ct.c_int, ct.c_int]
        lib.ref_CreateDelayEstimator.restype = ct.c_void_p
        lib.ref_CreateDelayEstimator.argtypes = [ct.c_void_p, ct.c_int]
        lib.ref_InitDelayEstimatorFarend.argtypes = [ct.c_void_p]
        lib.ref_InitDelayEstimator.argtypes = [ct.c_void_p]
        lib.ref_enable_robust_validation.argtypes = [ct.c_void_p, ct.c_int]
        for name in ("ref_set_history_size", "ref_set_lookahead",
                     "ref_set_allowed_offset", "ref_SoftResetDelayEstimator"):
            fn = getattr(lib, name)
            fn.restype = ct.c_int
            fn.argtypes = [ct.c_void_p, ct.c_int]
        for name in ("ref_history_size", "ref_lookahead",
                     "ref_get_allowed_offset",
                     "ref_is_robust_validation_enabled"):
            fn = getattr(lib, name)
            fn.restype = ct.c_int
            fn.argtypes = [ct.c_void_p]
        lib.ref_SoftResetDelayEstimatorFarend.restype = None
        lib.ref_SoftResetDelayEstimatorFarend.argtypes = [ct.c_void_p,
                                                          ct.c_int]
        lib.ref_AddFarSpectrumFix.restype = ct.c_int
        lib.ref_AddFarSpectrumFix.argtypes = [
            ct.c_void_p, np.ctypeslib.ndpointer(np.uint16, flags="C"),
            ct.c_int, ct.c_int]
        lib.ref_DelayEstimatorProcessFix.restype = ct.c_int
        lib.ref_DelayEstimatorProcessFix.argtypes = [
            ct.c_void_p, np.ctypeslib.ndpointer(np.uint16, flags="C"),
            ct.c_int, ct.c_int]
        lib.ref_last_delay.restype = ct.c_int
        lib.ref_last_delay.argtypes = [ct.c_void_p]
        lib.ref_last_delay_quality.restype = ct.c_float
        lib.ref_last_delay_quality.argtypes = [ct.c_void_p]
        lib.ref_FreeDelayEstimator.restype = None
        lib.ref_FreeDelayEstimator.argtypes = [ct.c_void_p]
        lib.ref_FreeDelayEstimatorFarend.restype = None
        lib.ref_FreeDelayEstimatorFarend.argtypes = [ct.c_void_p]
        lib.ref_AddFarSpectrumFloat.restype = ct.c_int
        lib.ref_AddFarSpectrumFloat.argtypes = [
            ct.c_void_p, np.ctypeslib.ndpointer(np.float32, flags="C"),
            ct.c_int]
        lib.ref_DelayEstimatorProcessFloat.restype = ct.c_int
        lib.ref_DelayEstimatorProcessFloat.argtypes = [
            ct.c_void_p, np.ctypeslib.ndpointer(np.float32, flags="C"),
            ct.c_int]
        # Full AECM API
        lib.WebRtcAecm_Create.restype = ct.c_void_p
        lib.WebRtcAecm_Create.argtypes = []
        lib.WebRtcAecm_Free.argtypes = [ct.c_void_p]
        lib.WebRtcAecm_Init.restype = ct.c_int32
        lib.WebRtcAecm_Init.argtypes = [ct.c_void_p, ct.c_int32]
        lib.WebRtcAecm_BufferFarend.restype = ct.c_int32
        lib.WebRtcAecm_BufferFarend.argtypes = [
            ct.c_void_p, np.ctypeslib.ndpointer(np.int16, flags="C"),
            ct.c_size_t]
        lib.WebRtcAecm_Process.restype = ct.c_int32
        lib.WebRtcAecm_Process.argtypes = [
            ct.c_void_p,
            np.ctypeslib.ndpointer(np.int16, flags="C"),
            ct.c_void_p,  # nearendClean (nullable)
            np.ctypeslib.ndpointer(np.int16, flags="C"),
            ct.c_size_t, ct.c_int16]

        class AecmConfig(ct.Structure):
            _fields_ = [("cngMode", ct.c_int16), ("echoMode", ct.c_int16)]

        self.AecmConfig = AecmConfig
        lib.WebRtcAecm_set_config.restype = ct.c_int32
        lib.WebRtcAecm_set_config.argtypes = [ct.c_void_p, AecmConfig]
        lib.WebRtcAecm_GetEchoPath.restype = ct.c_int32
        lib.WebRtcAecm_GetEchoPath.argtypes = [
            ct.c_void_p, np.ctypeslib.ndpointer(np.int16, flags="C"),
            ct.c_size_t]
        lib.WebRtcAecm_InitEchoPath.restype = ct.c_int32
        lib.WebRtcAecm_InitEchoPath.argtypes = lib.WebRtcAecm_GetEchoPath.argtypes

    # -- convenience wrappers ------------------------------------------------
    def sqrt_floor(self, v):
        return self.lib.WebRtcSpl_SqrtFloor(int(v))

    def real_forward_fft(self, x128: np.ndarray, order: int = 7):
        n = 1 << order
        h = self.lib.WebRtcSpl_CreateRealFFT(order)
        out = np.zeros(n + 2, dtype=np.int16)
        res = self.lib.WebRtcSpl_RealForwardFFT(
            h, np.ascontiguousarray(x128, np.int16), out)
        return out.reshape(n // 2 + 1, 2), res

    def real_inverse_fft(self, ccs130: np.ndarray, order: int = 7):
        n = 1 << order
        h = self.lib.WebRtcSpl_CreateRealFFT(order)
        out = np.zeros(n, dtype=np.int16)
        scale = self.lib.WebRtcSpl_RealInverseFFT(
            h, np.ascontiguousarray(ccs130, np.int16), out)
        return out, scale

    def complex_fft(self, interleaved: np.ndarray, stages=7, mode=1,
                    bitreverse=True):
        buf = np.ascontiguousarray(interleaved, np.int16).copy()
        if bitreverse:
            self.lib.WebRtcSpl_ComplexBitReverse(buf, stages)
        self.lib.WebRtcSpl_ComplexFFT(buf, stages, mode)
        return buf

    def complex_ifft(self, interleaved: np.ndarray, stages=7, mode=1,
                     bitreverse=True):
        buf = np.ascontiguousarray(interleaved, np.int16).copy()
        if bitreverse:
            self.lib.WebRtcSpl_ComplexBitReverse(buf, stages)
        scale = self.lib.WebRtcSpl_ComplexIFFT(buf, stages, mode)
        return buf, scale


class RefAecm:
    """Stateful handle over the reference WebRtcAecm_* API."""

    def __init__(self, oracle: Oracle, fs: int, cng_mode=1, echo_mode=3):
        self.o = oracle
        self.inst = oracle.lib.WebRtcAecm_Create()
        assert self.inst
        assert oracle.lib.WebRtcAecm_Init(self.inst, fs) == 0
        cfg = oracle.AecmConfig(cng_mode, echo_mode)
        assert oracle.lib.WebRtcAecm_set_config(self.inst, cfg) == 0

    def buffer_farend(self, far: np.ndarray):
        return self.o.lib.WebRtcAecm_BufferFarend(
            self.inst, np.ascontiguousarray(far, np.int16), len(far))

    def process(self, near_noisy: np.ndarray, near_clean, ms_in_sndcard_buf):
        n = len(near_noisy)
        out = np.zeros(n, dtype=np.int16)
        if near_clean is None:
            clean_ptr = None
        else:
            clean_arr = np.ascontiguousarray(near_clean, np.int16)
            clean_ptr = clean_arr.ctypes.data_as(ct.c_void_p)
        ret = self.o.lib.WebRtcAecm_Process(
            self.inst, np.ascontiguousarray(near_noisy, np.int16),
            clean_ptr, out, n, ms_in_sndcard_buf)
        return out, ret

    def get_echo_path(self):
        out = np.zeros(65, dtype=np.int16)
        assert self.o.lib.WebRtcAecm_GetEchoPath(self.inst, out, 130) == 0
        return out

    def __del__(self):
        try:
            self.o.lib.WebRtcAecm_Free(self.inst)
        except Exception:
            pass


_ORACLE = None
_ORACLE_ABS_APPROX = None


def get_oracle() -> Oracle:
    global _ORACLE
    if _ORACLE is None:
        _ORACLE = Oracle()
    return _ORACLE


def get_oracle_abs_approx() -> Oracle:
    """Reference built with -DAECM_WITH_ABS_APPROX (aecm_core_c.cc:316-341)."""
    global _ORACLE_ABS_APPROX
    if _ORACLE_ABS_APPROX is None:
        _ORACLE_ABS_APPROX = Oracle(("AECM_WITH_ABS_APPROX",),
                                    BUILD / "libaecm_ref_absapprox.so")
    return _ORACLE_ABS_APPROX
