"""Public AECM API: the TPU-native equivalent of echo_control_mobile.h.

Two surfaces:

  * Functional (jit-friendly): `control.create/buffer_farend/process/...`
    re-exported here — state in, state out, everything traced.
  * `AecmInstance`: a stateful convenience handle mirroring the reference
    lifecycle Create/Init/BufferFarend/Process/set_config/GetEchoPath
    (reference: aecm/echo_control_mobile.h:46-202), with the same error
    codes for host-side argument validation.  Each instance owns a jitted
    step specialized on (sample_rate, frame size, clean presence).

Sample-domain convention: int16 PCM passed as numpy/JAX arrays; internally
everything is int32-held int16-range fixed point.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import control
from . import core as core_mod
from . import defines as D

# Error codes (echo_control_mobile.h:23-30)
AECM_UNSPECIFIED_ERROR = D.AECM_UNSPECIFIED_ERROR
AECM_UNSUPPORTED_FUNCTION_ERROR = D.AECM_UNSUPPORTED_FUNCTION_ERROR
AECM_UNINITIALIZED_ERROR = D.AECM_UNINITIALIZED_ERROR
AECM_NULL_POINTER_ERROR = D.AECM_NULL_POINTER_ERROR
AECM_BAD_PARAMETER_ERROR = D.AECM_BAD_PARAMETER_ERROR
AECM_BAD_PARAMETER_WARNING = D.AECM_BAD_PARAMETER_WARNING

create = control.create
buffer_farend = control.buffer_farend
process = control.process
set_config = control.set_config
get_echo_path = control.get_echo_path
init_echo_path = control.init_echo_path
AecmState = control.AecmState


def echo_path_size_bytes() -> int:
    """WebRtcAecm_echo_path_size_bytes (echo_control_mobile.cc:530-532)."""
    return D.PART_LEN1 * 2


class AecmError(RuntimeError):
    def __init__(self, code: int):
        super().__init__(f"AECM error {code}")
        self.code = code


class AecmInstance:
    """Stateful handle over the functional API (one echo-cancelled stream).

    Mirrors the reference lifecycle: construction = Create+Init, then
    `buffer_farend(far)` + `process(near_noisy, near_clean, ms)` per 10 ms.
    """

    def __init__(self, sample_rate: int = 8000, cng_mode: int = 1,
                 echo_mode: int = 3, abs_approx: bool = False,
                 robust_validation: bool = False):
        if sample_rate not in (8000, 16000):
            raise AecmError(AECM_BAD_PARAMETER_ERROR)
        self.sample_rate = sample_rate
        self.mult = sample_rate // 8000
        self.opts = core_mod.Options(abs_approx=abs_approx,
                                     robust_validation=robust_validation)
        self.state = control.create(sample_rate)
        if robust_validation:
            from . import delay_estimator as de
            de_near, _ = de.enable_robust_validation(
                self.state.core.de_near, 1)
            self.state = self.state._replace(
                core=self.state.core._replace(de_near=de_near))
        self.set_config(cng_mode, echo_mode)
        self._jitted = {}

    def set_control(self, delay: int = -1, nlp_flag: int = 1) -> None:
        """WebRtcAecm_Control (aecm_core.cc:477-482): fix the far/near
        delay (in 64-sample blocks; -1 re-enables the estimator) and
        toggle the NLP stage."""
        self.state = self.state._replace(
            core=core_mod.set_control(self.state.core, delay, nlp_flag))

    def delay_quality(self) -> float:
        """WebRtc_last_delay_quality (delay_estimator_wrapper.cc:513-517):
        reliability in [0, 1] of the current delay estimate."""
        from . import delay_estimator as de
        return float(de.last_delay_quality(self.state.core.de_near))

    # -- config ------------------------------------------------------------
    def set_config(self, cng_mode: int, echo_mode: int) -> None:
        """WebRtcAecm_set_config validation + apply."""
        if cng_mode not in (0, 1) or not (0 <= echo_mode <= 4):
            raise AecmError(AECM_BAD_PARAMETER_ERROR)
        self.state = control.set_config(self.state, cng_mode, echo_mode)

    def get_echo_path(self) -> np.ndarray:
        return np.asarray(control.get_echo_path(self.state), dtype=np.int16)

    def init_echo_path(self, echo_path) -> None:
        echo_path = np.asarray(echo_path)
        if echo_path.size != D.PART_LEN1:
            raise AecmError(AECM_BAD_PARAMETER_ERROR)
        self.state = control.init_echo_path(self.state,
                                            echo_path.astype(np.int32))

    # -- streaming ---------------------------------------------------------
    def _validate_len(self, n: int) -> None:
        if n not in (80, 160):
            raise AecmError(AECM_BAD_PARAMETER_ERROR)

    def get_buffer_farend_error(self, farend, n_samples: int = None) -> int:
        """WebRtcAecm_GetBufferFarendError (echo_control_mobile.cc:195-213):
        standalone validation, 0 when BufferFarend would accept the call.
        (The uninitialized case cannot arise here: construction = Create+Init,
        so the kInitCheck branch is structurally always satisfied.)"""
        if farend is None:
            return AECM_NULL_POINTER_ERROR
        if n_samples is None:
            n_samples = np.asarray(farend).shape[-1]
        if n_samples not in (80, 160):
            return AECM_BAD_PARAMETER_ERROR
        return 0

    def buffer_farend(self, farend) -> None:
        """WebRtcAecm_BufferFarend (+ GetBufferFarendError validation)."""
        err = self.get_buffer_farend_error(farend)
        if err != 0:
            raise AecmError(err)
        farend = np.asarray(farend)
        key = ("buf", farend.shape[-1])
        if key not in self._jitted:
            mult = self.mult
            self._jitted[key] = jax.jit(
                lambda s, f: control.buffer_farend(s, f, mult))
        self.state = self._jitted[key](self.state,
                                       jnp.asarray(farend, jnp.int32))

    def process(self, nearend_noisy, nearend_clean, ms_in_sndcard_buf: int,
                debug: bool = False):
        """WebRtcAecm_Process. Returns (out int16 ndarray, warning code);
        with debug=True also a dict of per-block debug taps (hnl, supGain,
        step size, delay, VAD, energies, delay quality)."""
        if nearend_noisy is None:
            raise AecmError(AECM_NULL_POINTER_ERROR)
        nearend_noisy = np.asarray(nearend_noisy)
        n = nearend_noisy.shape[-1]
        self._validate_len(n)
        has_clean = nearend_clean is not None
        key = ("proc", n, has_clean, debug)
        if key not in self._jitted:
            rate = self.sample_rate
            opts = self.opts._replace(debug=debug)

            def step(state, noisy, clean, ms):
                return control.process(state, noisy, clean, n, ms, rate,
                                       opts)

            if has_clean:
                self._jitted[key] = jax.jit(step)
            else:
                self._jitted[key] = jax.jit(
                    lambda state, noisy, ms: step(state, noisy, None, ms))
        if has_clean:
            res = self._jitted[key](
                self.state, jnp.asarray(nearend_noisy, jnp.int32),
                jnp.asarray(np.asarray(nearend_clean), jnp.int32),
                jnp.int32(ms_in_sndcard_buf))
        else:
            res = self._jitted[key](
                self.state, jnp.asarray(nearend_noisy, jnp.int32),
                jnp.int32(ms_in_sndcard_buf))
        self.state, out, warn = res[0], res[1], res[2]
        if debug:
            taps = jax.tree_util.tree_map(np.asarray, res[3])
            return np.asarray(out).astype(np.int16), int(warn), taps
        return np.asarray(out).astype(np.int16), int(warn)

    # -- bulk helper (the demo-CLI loop, main.cc:97-147) ---------------------
    def run_file_pair(self, far_pcm, near_pcm, ms_in_sndcard_buf: int = 40):
        """File-to-file processing: per 10 ms, BufferFarend then Process.

        Mirrors aecProcess (main.cc:97-147): frame size = min(160, fs/100),
        output overwrites the near signal in place.
        """
        far_pcm = np.asarray(far_pcm, dtype=np.int16)
        near_pcm = np.asarray(near_pcm, dtype=np.int16)
        samples = min(160, self.sample_rate // 100)
        n_chunks = len(near_pcm) // samples
        out = near_pcm.copy()
        for i in range(n_chunks):
            sl = slice(i * samples, (i + 1) * samples)
            self.buffer_farend(far_pcm[sl])
            o, _ = self.process(out[sl], None, ms_in_sndcard_buf)
            out[sl] = o
        return out
