from . import fm  # noqa: F401  (sets jax x64 + compile-cache config)
