from bayeformers_tpu.core import distributions, init, prior  # noqa: F401
