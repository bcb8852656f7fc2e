from .mesh import Sharder  # noqa: F401
from . import coordination  # noqa: F401
from . import distributed  # noqa: F401
