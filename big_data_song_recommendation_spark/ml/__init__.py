from . import features, recommend, registry  # noqa: F401
