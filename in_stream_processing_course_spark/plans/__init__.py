from .registry import ORACLES, QUERIES  # noqa: F401
