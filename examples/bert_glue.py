"""Thin shim preserving the reference's `python -m examples.bert_glue` layout
(`/root/reference/examples/bert_glue.py`); the implementation lives in
bayeformers_tpu/workloads/bert_glue.py."""
from bayeformers_tpu.workloads.bert_glue import main

if __name__ == "__main__":
    main()
