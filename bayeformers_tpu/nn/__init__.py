from bayeformers_tpu.nn.surgery import (  # noqa: F401
    BayesianModel,
    BayesParams,
    ConversionRule,
    ConversionSpec,
    CONV_RULE,
    DEFAULT_RULES,
    EMBEDDING_RULE,
    LINEAR_RULE,
    find_convertible_paths,
    to_bayesian,
)
from bayeformers_tpu.nn.layers import (  # noqa: F401
    BayesLinear,
    bayes_apply,
    collect_kl,
)
