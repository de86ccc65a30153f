from . import classifier, text, vectors  # noqa: F401
