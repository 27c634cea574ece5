"""Metrics logging: Report accumulator + JSONL scalar writer.

Replaces the reference's tensorboardX ``SummaryWriter`` per-epoch scalars
(`examples/bert_glue.py:93,141-142,204-206`) and the plain-attribute
``Report`` accumulator (`examples/bert_glue.py:27-37`) with a dependency-free
JSONL event stream (one ``{"step", "tag", "value"}`` object per line) that
any dashboard can tail. Run naming mirrors the reference convention
``logs/<exp>.<qualifiers>`` (`examples/bert_glue.py:91-92`).
"""
from __future__ import annotations

import json
import os
import time



class Report:
    """Running-mean accumulator for scalar metrics.

    ``report.update(loss=..., acc=...)`` adds weighted values;
    ``report.means(n)`` divides by the given denominator. Matches the
    reference's usage where totals are divided by dataset size at epoch end.
    """

    def __init__(self, *names: str):
        self.totals = {name: 0.0 for name in names}

    def update(self, **values: float) -> None:
        for name, v in values.items():
            self.totals[name] = self.totals.get(name, 0.0) + float(v)

    def means(self, denom: float) -> dict[str, float]:
        return {name: total / denom for name, total in self.totals.items()}

    def reset(self) -> None:
        for name in self.totals:
            self.totals[name] = 0.0


class MetricsWriter:
    """Append-only JSONL scalar writer, one file per run."""

    def __init__(self, logdir: str, run_name: str):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, f"{run_name}.jsonl")
        self._fh = open(self.path, "a", buffering=1)
        self._t0 = time.time()

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._fh.write(
            json.dumps(
                {
                    "step": step,
                    "tag": tag,
                    "value": float(value),
                    "wall": round(time.time() - self._t0, 3),
                }
            )
            + "\n"
        )

    def scalars(self, prefix: str, values: dict[str, float], step: int) -> None:
        for tag, v in values.items():
            self.scalar(f"{prefix}/{tag}", v, step)

    def close(self) -> None:
        self._fh.close()


def run_name(exp: str, **qualifiers) -> str:
    """``exp.KEY_value`` naming (reference `bert_glue.py:91-92`)."""
    parts = [exp] + [f"{k.upper()}_{v}" for k, v in qualifiers.items()]
    return ".".join(parts)
