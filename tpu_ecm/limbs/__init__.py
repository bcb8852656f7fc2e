from . import layout, jnp_ops  # noqa: F401
