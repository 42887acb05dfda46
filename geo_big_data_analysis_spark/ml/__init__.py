from . import features, pipeline  # noqa: F401
