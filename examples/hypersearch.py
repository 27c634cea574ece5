"""Shim for the reference's `examples/hypersearch.py`; the implementation is
bayeformers_tpu/utils/hypersearch.py (HyperSearch, Score)."""
from bayeformers_tpu.utils.hypersearch import HyperSearch, Score  # noqa: F401
