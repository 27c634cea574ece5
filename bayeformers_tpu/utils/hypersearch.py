"""Random hyperparameter search (reference `examples/hypersearch.py`).

Same semantics: register ``name -> ((lo, hi), log_scale)`` ranges, sample
uniformly (linear or log10 space), call the train function N times, keep the
argmax score. Fixes the reference's fragile ``zip(parameters.items(), scales)``
ordering coupling (SURVEY.md C16) by storing the scale with its range, and —
unlike the reference, which lets one crash kill the whole search
(`hypersearch.py:45-57`) — isolates trial failures.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import numpy as np


@dataclasses.dataclass
class Score:
    """Best-so-far tracker; higher is better."""

    value: float = -np.inf
    hyperparameters: dict[str, float] = dataclasses.field(default_factory=dict)

    def update(self, value: float, hyperparameters: dict[str, float]) -> bool:
        if value > self.value:
            self.value = value
            self.hyperparameters = dict(hyperparameters)
            return True
        return False


class HyperSearch:
    """Usage (mirrors the reference driver, `examples/bert_glue.py:324-331`)::

        hs = HyperSearch(seed=42)
        hs["delta"] = (1e-2, 1e-1), HyperSearch.LOG_SCALE
        hs["weight_decay"] = (1e-3, 0.0), HyperSearch.LINEAR_SCALE
        best = hs.search(train_fn, iterations=10, **fixed_kwargs)
    """

    LINEAR_SCALE = 0
    LOG_SCALE = 1

    def __init__(self, seed: Optional[int] = None):
        self.parameters: dict[str, tuple[tuple[float, float], int]] = {}
        self.rng = np.random.default_rng(seed)

    def __setitem__(self, name: str, value: tuple[tuple[float, float], int]) -> None:
        rng_range, scale = value
        self.parameters[name] = (tuple(rng_range), scale)

    def _sample(self) -> dict[str, float]:
        out = {}
        for name, ((lo, hi), scale) in self.parameters.items():
            if scale == self.LOG_SCALE:
                out[name] = float(10 ** self.rng.uniform(np.log10(lo), np.log10(hi)))
            else:
                out[name] = float(self.rng.uniform(lo, hi))
        return out

    def search(
        self,
        train_fn: Callable[..., float],
        iterations: int = 10,
        *args: Any,
        on_error: str = "skip",
        **kwargs: Any,
    ) -> Score:
        """Run ``train_fn(*args, **sampled, **kwargs)`` N times, keep the max.

        ``on_error='skip'`` records a failed trial as -inf and continues;
        ``on_error='raise'`` propagates (the reference behavior).
        """
        score = Score()
        for i in range(iterations):
            sampled = self._sample()
            try:
                value = float(train_fn(*args, **sampled, **kwargs))
            except Exception:
                if on_error == "raise":
                    raise
                continue
            score.update(value, sampled)
        return score
