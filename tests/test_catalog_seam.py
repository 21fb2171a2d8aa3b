"""Catalog adapter seam: scheme dispatch, protocol conformance of the
default IcebergLite binding, fake-adapter registration, and the
import-gated REST stub."""

from __future__ import annotations

import pytest

from pyreshaper_spark.sources.catalog import (
    TableCatalog,
    get_catalog,
    register_catalog,
)
from pyreshaper_spark.sources.iceberglite import IcebergLite


def test_plain_path_binds_iceberglite(tmp_path):
    cat = get_catalog(str(tmp_path))
    assert isinstance(cat, IcebergLite)
    # protocol conformance: the default binding satisfies the seam
    assert isinstance(cat, TableCatalog)


def test_file_scheme_strips_prefix(tmp_path):
    cat = get_catalog(f"file://{tmp_path}")
    assert isinstance(cat, IcebergLite)
    assert cat.root == str(tmp_path)


def test_rest_stub_raises_without_client():
    # pyiceberg is not installed in this container: the stub must fail
    # AT BINDING TIME with instructions, not deep inside a job
    with pytest.raises(NotImplementedError, match="pyiceberg"):
        get_catalog("rest://catalog.example/warehouse")


def test_unknown_scheme_rejected():
    with pytest.raises(ValueError, match="no catalog binding"):
        get_catalog("s3catalog://bucket/warehouse")


def test_registered_fake_adapter_dispatches(tmp_path):
    class FakeCatalog:
        def __init__(self, root):
            self.root = root
            self.appends = []

        def exists(self, name):
            return False

        def create_table(self, name, schema_json):
            return 0

        def read(self, name, *a, **k):
            raise KeyError(name)

        def append(self, name, df, **k):
            self.appends.append(name)
            return 1

        def append_once(self, name, df, once_key, **k):
            return 1

        def overwrite(self, name, df, **k):
            return 1

        def snapshots(self, name):
            return []

        def current_snapshot_id(self, name):
            return 0

        def read_changes(self, name, *a, **k):
            raise KeyError(name)

    register_catalog("faketest", FakeCatalog)
    try:
        cat = get_catalog("faketest://anywhere")
        assert isinstance(cat, FakeCatalog)
        assert isinstance(cat, TableCatalog)
        assert cat.root == "faketest://anywhere"
    finally:
        from pyreshaper_spark.sources import catalog as _c

        _c._REGISTRY.pop("faketest", None)


def test_pipeline_runs_through_the_seam(spark, tmp_path):
    # the pipeline's own tests exercise IcebergLite end-to-end; here we
    # only prove the resolution point the pipeline calls is the seam
    from pyreshaper_spark.plans import pipeline as pl

    assert pl.get_catalog is get_catalog
