from .bm25 import SearchEngine  # noqa: F401
