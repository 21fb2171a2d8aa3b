"""Run configuration — the analog of the reference's ``Specifier``.

The reference pickles a ``Specifier`` (input file list, netcdf format,
compression level, output prefix/suffix, time-variant metadata list) to
a ``.s2s`` file and validates it with ``validate_types`` /
``validate_values`` [U: source/pyreshaper/specification.py ::
Specifier — citation status per SURVEY.md §0]. Here the job spec is a
frozen dataclass serialized to JSON; validation mirrors the reference's
two-phase (types, then values) check.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field, replace

#: Default retention-tier cascade: raw → 1 minute → 10 minutes → 1 hour
#: → 1 day. Each tier's bucket width must divide the next tier's width
#: exactly so cascading re-aggregation (sum of sums, min of mins, …)
#: is exact — the analog of the reference's lossless time concatenation.
DEFAULT_TIERS: tuple[tuple[str, int], ...] = (
    ("1m", 60),
    ("10m", 600),
    ("1h", 3600),
    ("1d", 86400),
)

#: Epoch origin for derived event time: 2024-01-01T00:00:00Z.
EPOCH0 = 1_704_067_200
#: Event-time horizon: one week of seconds.
HORIZON_S = 7 * 24 * 3600

_ALLOWED_TABLE_FORMATS = ("parquet", "iceberg-lite")
_ALLOWED_WRITE_MODES = ("skip", "overwrite", "append")


@dataclass(frozen=True)
class TierSpec:
    """One retention tier (analog of one output time-series file class)."""

    name: str
    width_s: int  # bucket width in seconds
    retention_buckets: int | None = None  # None = keep everything


@dataclass(frozen=True)
class RunConfig:
    """Job specification (``Specifier`` analog).

    Field mapping to the reference:
    * ``input_path``        ← Specifier.input_file_list
    * ``table_format``      ← Specifier.netcdf_format (netcdf/netcdf4/netcdf4c)
    * ``compression_level`` ← Specifier.compression_level (0..9)
    * ``output_path``       ← output_file_prefix/suffix
    * ``meta_once``         ← create_reshaper(once=...) once-file mode
    * ``write_mode``        ← s2srun skip/overwrite/append flags
    * ``tiers``             ← (new) retention cascade, the graft's output classes
    * ``nsalt``             ← (new) skew salting, analog of WeightBalanced
                              (0 = auto-size from the hottest source)
    """

    input_path: str
    output_path: str
    #: wire format of the input drop (sources.readers dispatch):
    #: parquet | orc | json | csv
    input_format: str = "parquet"
    table_format: str = "parquet"
    compression_level: int = 3  # parquet zstd level for table sinks
    tiers: tuple[TierSpec, ...] = field(
        default_factory=lambda: tuple(TierSpec(n, w) for n, w in DEFAULT_TIERS)
    )
    nsalt: int = 8
    num_series_partitions: int = 32
    write_mode: str = "skip"
    meta_once: bool = False
    time_variant_metadata: tuple[str, ...] = ("event_ts", "bucket_s")
    epoch0: int = EPOCH0
    horizon_s: int = HORIZON_S
    #: cap on the number of source series processed (the reference's
    #: ``convert(output_limit=N)`` smoke-run knob); None = all
    source_limit: int | None = None
    #: run the decode-and-compare fidelity gate as a pipeline step
    verify_fidelity: bool = False
    #: overlap the (independent) encode step with the tier cascade as
    #: concurrent Spark jobs from two driver threads — the tier chain's
    #: small commits hide behind the encode stage's executor work.
    #: Ignored (sequential) when a ``stop_after`` test hook is set.
    overlap: bool = False
    #: extra continuous-aggregate families materialized per tier next to
    #: the count/sum/min/max tables (names from
    #: operators.rollup.ANALYTIC_FAMILIES: ohlc, m4, ndv_sketch, hist50);
    #: each cascades and append-merges exactly like the main tiers
    analytics: tuple[str, ...] = ()
    #: calendar tiers (operators.rollup.CALENDAR_UNITS: week, month,
    #: quarter, year) materialized as ``cal_<unit>`` tables. Irregular
    #: widths can't ride the fixed-seconds cascade, so each cycle
    #: REBUILDS cal_<unit> from the coarsest day-aligned tier (86400 %
    #: width == 0) — exact by boundary nesting, O(that tier's rows).
    #: That source tier must carry NO retention policy (a pruned source
    #: would silently truncate calendar history — validated below).
    calendar: tuple[str, ...] = ()

    # ---- validation (mirrors Specifier.validate: types then values) ----

    def validate_types(self) -> None:
        checks = [
            ("input_path", self.input_path, str),
            ("output_path", self.output_path, str),
            ("input_format", self.input_format, str),
            ("table_format", self.table_format, str),
            ("compression_level", self.compression_level, int),
            ("nsalt", self.nsalt, int),
            ("num_series_partitions", self.num_series_partitions, int),
            ("write_mode", self.write_mode, str),
            ("meta_once", self.meta_once, bool),
            ("overlap", self.overlap, bool),
            ("epoch0", self.epoch0, int),
            ("horizon_s", self.horizon_s, int),
        ]
        for name, value, typ in checks:
            if not isinstance(value, typ):
                raise TypeError(f"RunConfig.{name}: expected {typ.__name__}, "
                                f"got {type(value).__name__}")
        for t in self.tiers:
            if not isinstance(t, TierSpec):
                raise TypeError("RunConfig.tiers items must be TierSpec")

    def validate_values(self) -> None:
        from pyreshaper_spark.sources.readers import READERS

        if self.input_format not in READERS:
            raise ValueError(
                f"input_format must be one of {sorted(READERS)}, "
                f"got {self.input_format!r}"
            )
        if self.table_format not in _ALLOWED_TABLE_FORMATS:
            raise ValueError(f"table_format must be one of "
                             f"{_ALLOWED_TABLE_FORMATS}, got {self.table_format!r}")
        if not 0 <= self.compression_level <= 9:
            raise ValueError("compression_level must be in 0..9")
        if self.write_mode not in _ALLOWED_WRITE_MODES:
            raise ValueError(f"write_mode must be one of {_ALLOWED_WRITE_MODES}")
        if self.nsalt < 0:
            raise ValueError("nsalt must be >= 1, or 0 for size-aware auto")
        if self.num_series_partitions < 1:
            raise ValueError("num_series_partitions must be >= 1")
        if self.source_limit is not None and self.source_limit < 1:
            raise ValueError("source_limit must be >= 1 or None")
        if not self.tiers:
            raise ValueError("at least one retention tier is required")
        widths = [t.width_s for t in self.tiers]
        if any(w <= 0 for w in widths):
            raise ValueError("tier widths must be positive")
        if sorted(widths) != widths or len(set(widths)) != len(widths):
            raise ValueError("tier widths must be strictly increasing")
        for a, b in zip(widths, widths[1:]):
            if b % a != 0:
                raise ValueError(
                    f"tier width {b} is not a multiple of {a}: cascade "
                    "re-aggregation would be inexact")
        names = [t.name for t in self.tiers]
        if len(set(names)) != len(names):
            raise ValueError("tier names must be unique")
        if self.analytics:
            from pyreshaper_spark.operators.rollup import ANALYTIC_FAMILIES

            bad = [a for a in self.analytics if a not in ANALYTIC_FAMILIES]
            if bad:
                raise ValueError(
                    f"unknown analytics families {bad}; allowed: "
                    f"{sorted(ANALYTIC_FAMILIES)}"
                )
        if self.calendar:
            from pyreshaper_spark.operators.rollup import CALENDAR_UNITS

            bad = [u for u in self.calendar if u not in CALENDAR_UNITS]
            if bad:
                raise ValueError(
                    f"unknown calendar units {bad}; allowed: "
                    f"{list(CALENDAR_UNITS)}"
                )
            src = self.calendar_source_tier()
            if src is None:
                raise ValueError(
                    "calendar tiers need a day-aligned source tier "
                    "(some tier width dividing 86400)"
                )
            if src.retention_buckets is not None:
                raise ValueError(
                    f"calendar source tier {src.name!r} must not carry "
                    "a retention policy: calendar tables rebuild from "
                    "it each cycle, and a pruned source would silently "
                    "truncate calendar history"
                )

    def calendar_source_tier(self):
        """The coarsest day-aligned tier — the cheapest exact source
        for calendar re-aggregation (calendar boundaries nest on UTC
        day boundaries, which nest on any width dividing 86400)."""
        best = None
        for t in self.tiers:
            if 86400 % t.width_s == 0:
                best = t  # widths strictly increase: last hit = coarsest
        return best

    def validate(self) -> "RunConfig":
        self.validate_types()
        self.validate_values()
        return self

    # ---- JSON round-trip (``Specifier.write`` / pickle analog) ----

    def to_json(self) -> str:
        d = asdict(self)
        d["tiers"] = [asdict(t) for t in self.tiers]
        return json.dumps(d, indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "RunConfig":
        d = json.loads(s)
        d["tiers"] = tuple(TierSpec(**t) for t in d.get("tiers", ()))
        d["time_variant_metadata"] = tuple(d.get("time_variant_metadata", ()))
        d["analytics"] = tuple(d.get("analytics", ()))
        d["calendar"] = tuple(d.get("calendar", ()))
        return cls(**d).validate()

    def write(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            f.write(self.to_json())

    @classmethod
    def read(cls, path: str) -> "RunConfig":
        with open(path, encoding="utf-8") as f:
            return cls.from_json(f.read())

    def with_(self, **kw) -> "RunConfig":
        return replace(self, **kw).validate()
