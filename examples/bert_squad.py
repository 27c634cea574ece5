"""Thin shim preserving the reference's `python -m examples.bert_squad` layout
(`/root/reference/examples/bert_squad.py`); the implementation lives in
bayeformers_tpu/workloads/bert_squad.py."""
from bayeformers_tpu.workloads.bert_squad import main

if __name__ == "__main__":
    main()
