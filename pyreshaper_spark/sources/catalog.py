"""Catalog adapter seam — bind the pipeline to any table catalog.

The write/read/maintenance paths in ``plans/`` and ``streaming/``
consume only the minimal :class:`TableCatalog` protocol below. The
default binding is the offline :class:`~pyreshaper_spark.sources.
iceberglite.IcebergLite` implementation (full Iceberg semantics on a
local/posix root — snapshots, time travel, CDC, MOR deletes,
compaction); a REAL catalog service binds behind the same protocol by
registering a factory for its root-URI scheme — the import-gated
registry pattern ``operators/multimodal.py`` uses for media decoders,
so the sandbox never imports (or needs) the external client lib.

Scheme dispatch on the table root:

    /data/warehouse            → IcebergLite (default: plain path)
    file:///data/warehouse     → IcebergLite
    rest://host/prefix         → Iceberg REST catalog binding (stub —
                                 raises until a real client factory is
                                 registered / the client lib exists)
    <scheme>://...             → whatever ``register_catalog`` bound

A deployment with a real Iceberg REST/HMS catalog registers its
adapter once at startup::

    from pyreshaper_spark.sources.catalog import register_catalog
    register_catalog("rest", lambda root: MyRestAdapter(root))

and every pipeline/CLI entry point picks it up through
:func:`get_catalog` with zero changes to job code.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any, Protocol, runtime_checkable

from pyspark.sql import DataFrame


@runtime_checkable
class TableCatalog(Protocol):
    """Minimal catalog surface the engine's jobs consume.

    Matches the IcebergLite call signatures exactly (it is the
    reference binding); any adapter must preserve these semantics:
    ``append_once`` is idempotent on ``once_key`` (exactly-once
    ingest), ``overwrite`` replaces the whole table in one atomic
    snapshot, ``read`` returns an empty TYPED frame for an empty
    table when ``allow_empty`` (schema from the table log), and
    ``read_changes`` yields the CDC changelog between snapshots.
    """

    def exists(self, name: str) -> bool: ...

    def create_table(self, name: str, schema_json: str) -> int: ...

    def read(self, name: str, *args: Any, **kwargs: Any) -> DataFrame: ...

    def append(self, name: str, df: DataFrame, **kwargs: Any) -> int: ...

    def append_once(
        self, name: str, df: DataFrame, once_key: str, **kwargs: Any
    ) -> int: ...

    def overwrite(self, name: str, df: DataFrame, **kwargs: Any) -> int: ...

    def snapshots(self, name: str) -> list[dict]: ...

    def current_snapshot_id(self, name: str) -> int: ...

    def read_changes(
        self, name: str, *args: Any, **kwargs: Any
    ) -> DataFrame: ...


class RestCatalogStub:
    """Placeholder binding for an Apache Iceberg REST catalog.

    Import-gated like the media decoders: constructing it without a
    registered real adapter (or the ``pyiceberg`` client lib, absent
    in this container) raises immediately with instructions, instead
    of failing deep inside a job. The Spark-side contract it would
    implement is exactly :class:`TableCatalog`.
    """

    def __init__(self, root: str):
        try:
            import pyiceberg  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "Iceberg REST catalog binding requires the `pyiceberg` "
                "client (not installed in this environment). Register a "
                "real adapter with register_catalog('rest', factory) or "
                "use a plain path root for the offline IcebergLite "
                f"binding. (root={root!r})"
            ) from exc
        raise NotImplementedError(
            "pyiceberg is importable but no REST adapter is registered; "
            "register_catalog('rest', factory) with your binding."
        )


def _default_factory(root: str) -> TableCatalog:
    from pyreshaper_spark.sources.iceberglite import IcebergLite

    if root.startswith("file://"):
        root = root[len("file://"):]
    return IcebergLite(root)


_REGISTRY: dict[str, Callable[[str], TableCatalog]] = {
    "file": _default_factory,
    "rest": RestCatalogStub,
}


def register_catalog(
    scheme: str, factory: Callable[[str], TableCatalog]
) -> None:
    """Bind ``factory`` (root-URI → adapter) to a scheme prefix."""
    _REGISTRY[scheme] = factory


def get_catalog(root: str) -> TableCatalog:
    """Resolve the catalog binding for a table root.

    ``<scheme>://...`` dispatches through the registry; a plain path
    (no scheme) is the offline IcebergLite warehouse."""
    scheme = "file"
    if "://" in root:
        scheme = root.split("://", 1)[0]
    factory = _REGISTRY.get(scheme)
    if factory is None:
        raise ValueError(
            f"no catalog binding registered for scheme {scheme!r} "
            f"(root={root!r}); register_catalog({scheme!r}, factory)"
        )
    return factory(root)
