from . import codec  # noqa: F401
from .build import IndexReader, build_index  # noqa: F401
from .snapshots import (  # noqa: F401
    commit_snapshot,
    expire_snapshots,
    list_snapshots,
    snapshot_dir,
)
