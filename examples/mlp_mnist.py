"""Thin shim preserving the reference's `python -m examples.mlp_mnist` layout
(`/root/reference/examples/mlp_mnist.py`); the implementation lives in
bayeformers_tpu/workloads/mlp_mnist.py."""
from bayeformers_tpu.workloads.mlp_mnist import main

if __name__ == "__main__":
    main()
