"""webrtc_aecm_tpu: a TPU-native acoustic echo canceller (mobile) framework.

A from-scratch JAX/XLA rebuild of the WebRTC AECM capability
(reference: cpuimage/WebRTC_AECM): fixed-point frequency-domain echo
suppression over 10 ms frames at 8/16 kHz, bit-faithful to the C reference,
with batching via `vmap`, streaming via `lax.scan`, and multi-chip scaling
via `jax.sharding`.
"""
from . import api
from . import control
from . import core
from . import defines
from . import delay_estimator
from . import models
from . import parallel
from . import utils
from .api import AecmInstance, AecmState
from .models import AecmPipeline

__all__ = [
    "api", "control", "core", "defines", "delay_estimator",
    "models", "parallel", "utils",
    "AecmInstance", "AecmState", "AecmPipeline",
]
__version__ = "0.1.0"
