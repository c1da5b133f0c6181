"""Fingerprint-keyed scratch-parquet fixture cache.

Shared publish contract for derived test fixtures (the nested-chunk
fixture in plans/relational.py and the date-partitioned report warehouse
in sources/report_warehouse.py): synthesize once per source fingerprint,
write to a unique temp dir, atomically rename into place. Concurrent
callers see a complete directory or none; a regenerated source file
(mtime/size change) invalidates the cache instead of serving stale rows.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid
from typing import Callable


def cached_parquet_dir(
    cache_name: str,
    src_file: str,
    write: Callable[[str], None],
) -> str:
    """Return a scratch directory holding ``write``'s output, creating it
    on first use. ``write(path)`` must produce a parquet directory at
    ``path``; it runs only on cache miss. The cache key fingerprints
    ``src_file`` (mtime + size)."""
    st = os.stat(src_file)
    key = hashlib.md5(
        f"{cache_name}|{src_file}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_{cache_name}_{key}")
    if not os.path.isdir(path):
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        try:
            write(tmp)
        except BaseException:
            # A failed Spark write leaves a partial directory; reap it so
            # retries don't accumulate orphaned .tmp-* trees in tempdir.
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            # Only a concurrent publish makes the rename failure benign;
            # anything else (permissions, stray same-named file) must
            # surface here, not as a confusing read error downstream.
            if not os.path.isdir(path):
                raise
    return path
