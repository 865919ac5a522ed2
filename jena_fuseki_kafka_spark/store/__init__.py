from .quadstore import QuadStore

__all__ = ["QuadStore"]
