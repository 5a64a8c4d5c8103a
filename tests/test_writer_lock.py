"""Enforced single-writer protocol: the _WRITER_LOCK file turns a
second concurrent writer into a clean error (the documented hazard was
two writers allocating the same delta ord), steals same-host locks of
dead writers automatically, and is always released — including when
the mutation itself crashes mid-flight."""

import json
import os

import pandas as pd
import pytest

from xml_to_es_spark.config import IndexConfig
from xml_to_es_spark.operators.index_build import WRITER_LOCK, IndexBuilder

CFG = IndexConfig(n_groups=1)


def _docs(spark, n=20, tag=""):
    return spark.createDataFrame(
        pd.DataFrame({
            "doc_id": range(n),
            "text": [f"alpha{tag} beta w{i}" for i in range(n)],
        })
    )


@pytest.fixture()
def idx(spark, tmp_path):
    out = str(tmp_path / "idx")
    IndexBuilder(spark, CFG).build(_docs(spark), out)
    return out


def _dead_pid():
    pid = os.fork()
    if pid == 0:
        os._exit(0)
    os.waitpid(pid, 0)
    return pid


def test_concurrent_writer_raises(spark, idx):
    import socket

    lock = os.path.join(idx, WRITER_LOCK)
    with open(lock, "w") as f:
        json.dump({"pid": os.getpid(), "host": socket.gethostname()}, f)
    b = IndexBuilder(spark, CFG)
    with pytest.raises(ValueError, match="another writer"):
        b.upsert(_docs(spark, tag="x"), idx)
    with pytest.raises(ValueError, match="another writer"):
        b.delete_docs([1], idx)
    with pytest.raises(ValueError, match="another writer"):
        b.compact(idx, idx + "_c")
    os.unlink(lock)
    # with the lock gone the same mutations succeed
    assert b.delete_docs([1], idx)["n_deleted"] == 1
    assert not os.path.exists(lock)  # released after the mutation


def test_stale_same_host_lock_is_stolen(spark, idx):
    import socket

    lock = os.path.join(idx, WRITER_LOCK)
    with open(lock, "w") as f:
        json.dump({"pid": _dead_pid(), "host": socket.gethostname()}, f)
    res = IndexBuilder(spark, CFG).upsert(_docs(spark, 25, tag="y"), idx)
    assert res["mode"] == "delta"
    assert not os.path.exists(lock)


def test_foreign_host_lock_needs_break_lock(spark, idx):
    lock = os.path.join(idx, WRITER_LOCK)
    with open(lock, "w") as f:
        json.dump({"pid": 1, "host": "some-other-executor-host"}, f)
    b = IndexBuilder(spark, CFG)
    with pytest.raises(ValueError, match="break_lock"):
        b.delete_docs([2], idx)
    assert IndexBuilder.break_lock(idx) is True
    assert b.delete_docs([2], idx)["n_deleted"] == 1


def test_crashed_mutation_releases_lock(spark, idx):
    b = IndexBuilder(spark, CFG)
    b._fail_before_commit = True
    with pytest.raises(RuntimeError, match="injected"):
        b.upsert(_docs(spark, 25, tag="z"), idx)
    assert not os.path.exists(os.path.join(idx, WRITER_LOCK))
    b2 = IndexBuilder(spark, CFG)
    assert b2.upsert(_docs(spark, 25, tag="z"), idx)["mode"] == "delta"
