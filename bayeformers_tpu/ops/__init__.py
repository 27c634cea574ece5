from bayeformers_tpu.ops.fused_linear import (  # noqa: F401
    bayes_linear,
    regenerate_weights,
    sampled_weights,
)
from bayeformers_tpu.ops.logprob import sampled_logprobs  # noqa: F401
from bayeformers_tpu.ops.sampled_linear import (  # noqa: F401
    sampled_dense,
    use_pallas,
)
