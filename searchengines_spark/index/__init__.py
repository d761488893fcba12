from . import codec  # noqa: F401
from .build import IndexReader, build_index  # noqa: F401
