"""Model-level pipelines: ready-to-serve AECM configurations.

The reference's "model" is a single fixed pipeline (far jitter buffer →
delay estimator → NLMS channel → Wiener/NLP → CNG, aecm_core_c.cc:368-711).
Here that pipeline is packaged as `AecmPipeline`, the flagship serving
object: batched, jitted, optionally mesh-sharded, streaming in 10 ms steps
or whole files.
"""
from .pipeline import AecmPipeline

__all__ = ["AecmPipeline"]
