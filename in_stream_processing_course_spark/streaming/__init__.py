from . import pipeline, runner, state  # noqa: F401
