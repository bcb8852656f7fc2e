from .mesh import Sharder  # noqa: F401
