from .queries import QUERIES  # noqa: F401
from .oracles import ORACLES  # noqa: F401
