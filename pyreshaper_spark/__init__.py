"""pyreshaper_spark — a from-scratch PySpark-native time-series
reorganization + rollup engine.

Reimagines the reference (dchandan/PyReshaper, a fork of NCAR
PyReshaper: an MPI-parallel NetCDF slice→series transpose tool) as a
tiered downsample / retention / continuous-aggregate pipeline over a
table of pre-tokenized training sequences:

    sequences(doc_id: string, tokens: array<int>, n_tok: int, source: string)

Capability map (reference → here; see SURVEY.md §2):

* slice→series transpose          → ``operators.transpose`` (salted
  ``repartition`` on the group key + ``sortWithinPartitions``)
* per-variable output files       → per-``source`` series partitions
* continuous aggregates           → ``operators.rollup`` (tier-0 agg +
  exact cascading re-aggregation)
* gap-fill + LOCF                 → ``operators.gapfill``
  (``sequence()+explode`` spine, ``last(..., ignorenulls=True)`` window)
* netcdf4c deflate compression    → ``functions.gorilla`` (Gorilla XOR +
  delta-of-delta codec, vectorized numpy inside ``applyInPandas``)
* Specifier / .s2s job spec       → ``config.RunConfig`` (JSON round-trip)
* write modes / restart           → ``plans.pipeline`` checkpoint +
  anti-join resume over the lineage table
* TimeKeeper / byte counters      → per-partition lineage rows in the
  ``metrics`` table
* MPI WeightBalanced partitioner  → salt column + range partitioning +
  AQE

Everything is DataFrame-native; all per-series computation is
vectorized (``applyInPandas`` / ``mapInArrow``) — no per-row Python
UDFs anywhere.
"""

__version__ = "0.1.0"

from pyreshaper_spark.config import RunConfig, TierSpec  # noqa: F401
