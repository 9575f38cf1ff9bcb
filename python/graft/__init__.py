"""graft — Python clients for the graft graph engine.

Two transports over one server-side method table:

- ``graft.GraphFrame`` / ``graft.Pipeline`` — Spark CONNECT client
  (needs pyspark >= 4 with Connect extras; imported lazily);
- ``graft.classic.GraphFrame`` / ``graft.classic.Pipeline`` — CLASSIC
  py4j client for a plain pyspark session with the graft classes on the
  driver classpath.

``graft.wire`` (the proto3 codec) is dependency-free.
"""

__version__ = "0.6.0"

__all__ = ["GraphFrame", "Pipeline", "classic", "wire"]

from . import wire  # noqa: F401  (dependency-free)


def __getattr__(name):
    if name == "GraphFrame":
        from .client import GraphFrame
        return GraphFrame
    if name == "Pipeline":
        from .client import Pipeline
        return Pipeline
    raise AttributeError(f"module 'graft' has no attribute {name!r}")
