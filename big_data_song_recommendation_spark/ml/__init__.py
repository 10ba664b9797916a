from . import evaluation, features, recommend, registry  # noqa: F401
