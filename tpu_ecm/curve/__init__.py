from . import ops, prac, suyama, oracle  # noqa: F401
