from . import calc, savefile  # noqa: F401
