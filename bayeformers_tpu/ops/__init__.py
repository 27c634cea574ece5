from bayeformers_tpu.ops.fused_linear import bayes_linear  # noqa: F401
from bayeformers_tpu.ops.logprob import sampled_logprobs  # noqa: F401
from bayeformers_tpu.ops.sampled_linear import (  # noqa: F401
    regenerate_weights,
    sampled_dense,
    use_pallas,
)
