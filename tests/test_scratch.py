"""Scratch-cache publish contract (sources/scratch.py)."""

from __future__ import annotations

import glob
import os
import tempfile

import pytest

from admob_data_pipeline_spark.sources.scratch import cached_parquet_dir


def _tmp_orphans(cache_name: str) -> list[str]:
    pat = os.path.join(tempfile.gettempdir(), f"spark_graft_{cache_name}_*.tmp-*")
    return glob.glob(pat)


def test_failed_write_reaps_partial_tmp_dir(tmp_path):
    src = tmp_path / "src.txt"
    src.write_text("x")

    def bad_write(path: str) -> None:
        os.makedirs(path)  # simulate a partial Spark write...
        (tmp_path / "marker").write_text(path)
        raise RuntimeError("job failed")  # ...then the job dies

    with pytest.raises(RuntimeError):
        cached_parquet_dir("reaptest", str(src), bad_write)
    partial = (tmp_path / "marker").read_text()
    assert not os.path.exists(partial), "partial tmp dir leaked"
    assert not _tmp_orphans("reaptest")


def test_retry_after_failure_publishes(tmp_path):
    src = tmp_path / "src.txt"
    src.write_text("x")
    calls = {"n": 0}

    def flaky_write(path: str) -> None:
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("first try fails")
        os.makedirs(path)
        with open(os.path.join(path, "part-0.parquet"), "w") as f:
            f.write("data")

    with pytest.raises(RuntimeError):
        cached_parquet_dir("retrytest", str(src), flaky_write)
    out = cached_parquet_dir("retrytest", str(src), flaky_write)
    assert os.path.isdir(out)
    # third call is a cache hit — write not invoked again
    assert cached_parquet_dir("retrytest", str(src), flaky_write) == out
    assert calls["n"] == 2
