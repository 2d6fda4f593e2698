"""Reference-style storage data-provider matrix: the same search suite
over each storage backend (reference runs its integration suite over
File/Dbal/Redis storages, tests/Integration/SearchEngineTest.php:199-224;
here: MemoryStorage, ParquetSnapshotStorage, DuckDBStorage (the
DbalStorage analogue) and KVStorage (the RedisStorage analogue over a
stdlib dbm store — no Redis server exists in this sandbox, the key
protocol is the same) — IcebergStorage needs a catalog jar absent from
this environment and fails fast, see STATUS.md).
"""

import pytest

from phphinder_spark.engine import SparkSearchEngine
from phphinder_spark.index.storage import (
    DuckDBStorage,
    KVStorage,
    MemoryStorage,
    ParquetSnapshotStorage,
)
from phphinder_spark.schema import test_schema as make_test_schema

BACKENDS = ["memory", "parquet_snapshot", "duckdb", "kv"]


def _make_engine(spark, tmp_path, backend):
    if backend == "memory":
        storage = MemoryStorage(spark)
    elif backend == "duckdb":
        storage = DuckDBStorage(spark, str(tmp_path / "idx.duckdb"))
    elif backend == "kv":
        storage = KVStorage(spark, str(tmp_path / "idx_kv"))
    else:
        storage = ParquetSnapshotStorage(spark, str(tmp_path / f"idx_{backend}"))
    eng = SparkSearchEngine(spark, make_test_schema(), storage=storage)
    eng.add_document(
        {"_id": 1, "title": "Cat animal", "text": "Meow world! This is a PHP search engine."}
    ).add_document(
        {"_id": 2, "title": "Dog", "text": "Bark Bark! PHPhinder makes search development fun to the world."}
    ).add_document(
        {"_id": 3, "title": "Snake", "text": "szee szee! This is the minimal PHP search engine for the animal world."}
    )
    eng.flush()
    return eng


@pytest.mark.parametrize("backend", BACKENDS)
def test_search_suite_per_backend(spark, tmp_path, backend):
    eng = _make_engine(spark, tmp_path, backend)
    assert {r.doc_id for r in eng.search("search engine")} == {1, 3}
    assert {r.doc_id for r in eng.search("search OR engine")} == {1, 2, 3}
    assert {r.doc_id for r in eng.search("world NOT(animal)")} == {2}
    assert {r.doc_id for r in eng.search("sea*")} == {1, 2, 3}
    # upsert replaces by unique key on every backend
    eng.add_document({"_id": 2, "title": "Dog2", "text": "Quiet now."})
    eng.flush()
    assert {r.doc_id for r in eng.search("bark")} == set()
    assert {r.doc_id for r in eng.search("quiet")} == {2}


@pytest.mark.parametrize("backend", BACKENDS)
def test_truncate_per_backend(spark, tmp_path, backend):
    eng = _make_engine(spark, tmp_path, backend)
    eng.truncate()
    assert eng.search("world") == []


@pytest.mark.parametrize("backend", ["parquet_snapshot", "duckdb", "kv"])
def test_persistent_backends_survive_reopen(spark, tmp_path, backend):
    """A new engine over the same storage location sees the committed
    index (the reference's DbalStorage persistence property)."""
    _make_engine(spark, tmp_path, backend)
    if backend == "duckdb":
        storage = DuckDBStorage(spark, str(tmp_path / "idx.duckdb"))
    elif backend == "kv":
        storage = KVStorage(spark, str(tmp_path / "idx_kv"))
    else:
        storage = ParquetSnapshotStorage(spark, str(tmp_path / f"idx_{backend}"))
    eng2 = SparkSearchEngine(spark, make_test_schema(), storage=storage)
    assert {r.doc_id for r in eng2.search("search engine")} == {1, 3}
    # and keeps accepting transactional upserts
    eng2.add_document({"_id": 1, "title": "Cat2", "text": "Purr only."})
    eng2.flush()
    assert {r.doc_id for r in eng2.search("meow")} == set()
    assert {r.doc_id for r in eng2.search("purr")} == {1}
