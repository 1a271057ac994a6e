from . import hashing, vectors

__all__ = ["hashing", "vectors"]
