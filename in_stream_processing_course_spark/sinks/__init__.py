from . import upsert  # noqa: F401
