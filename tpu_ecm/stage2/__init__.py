from . import plan, exec as exec_  # noqa: F401
