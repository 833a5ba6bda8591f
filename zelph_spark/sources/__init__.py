from . import dump, sinks

__all__ = ["dump", "sinks"]
