"""graft — Spark Connect Python client for the graft graph engine.

``graft.wire`` (the proto3 codec) is dependency-free; ``GraphFrame``
needs pyspark >= 4 with Connect extras and is imported lazily so the
codec stays usable without it.
"""

__version__ = "0.5.0"

__all__ = ["GraphFrame", "Pipeline", "wire"]

from . import wire  # noqa: F401  (dependency-free)


def __getattr__(name):
    if name == "GraphFrame":
        from .client import GraphFrame
        return GraphFrame
    if name == "Pipeline":
        from .client import Pipeline
        return Pipeline
    raise AttributeError(f"module 'graft' has no attribute {name!r}")
