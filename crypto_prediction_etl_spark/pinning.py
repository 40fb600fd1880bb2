"""Pin strategy for materialized intermediate frames.

The repo's convention for a derived frame consumed by several branches
of one job DAG ("q141's law": self-join sides, agg + join-back) is an
eager ``localCheckpoint`` — on a cluster the equivalent is writing the
narrow intermediate table once and joining it back.  ``localCheckpoint``
is the fastest in-session form (compact materialized-scan plans, no
cache-substitution misses), but it is a NON-RELIABLE checkpoint:
lineage is truncated and blocks live on executor LOCAL storage, so an
executor loss mid-job fails the job instead of recomputing.

``pin_frame`` makes that tradeoff a deployment knob instead of a
hard-coded choice.  ``SPARK_GRAFT_PIN_MODE``:

- ``localCheckpoint`` (default): current behavior — fastest, fails
  hard on executor loss; right for this repo's single-app bench/gate
  sessions and any job cheap to re-run.
- ``persist``: ``persist(StorageLevel.MEMORY_AND_DISK)`` + (for eager
  pins) a materializing ``count()``.  Lineage is KEPT, so a lost
  executor's partitions recompute and the job survives — the
  fault-tolerant posture for long multi-tenant cluster runs, at the
  cost of full-lineage re-analysis in every consumer plan and the
  (rare) cache-substitution miss.  tools/hostile_replay.py
  ``--persist-pins`` replays the catalog in this mode to prove results
  are pin-strategy-independent.

Two pin classes deliberately do NOT route through here and stay
``localCheckpoint`` regardless of mode:

- iterative lineage-bounding pins (label propagation, k-core peeling,
  BFS frontiers, absorbing-chain powers): persist would keep the whole
  loop's lineage and grow the logical plan geometrically per round;
- nondeterminism freezes (operators/globalrank's
  ``spark_partition_id`` pin): persist RECOMPUTES on loss, and a
  recomputed range-partitioning may re-sample different boundaries —
  the pid must be a fact of the data, so failing hard is the correct
  semantics.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame

PIN_MODE_ENV = "SPARK_GRAFT_PIN_MODE"
_VALID = ("localCheckpoint", "persist")


def pin_mode() -> str:
    mode = os.environ.get(PIN_MODE_ENV, "localCheckpoint")
    if mode not in _VALID:
        raise ValueError(
            f"{PIN_MODE_ENV}={mode!r}: expected one of {_VALID}"
        )
    return mode


def pin_frame(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize a shared derived frame once; see module docstring.

    ``eager=False`` defers materialization to first use (the lazy
    Generate-pitfall pins) — in persist mode that is a plain lazy
    persist, in localCheckpoint mode a lazy localCheckpoint.
    """
    if pin_mode() == "persist":
        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        if eager:
            out.count()
        return out
    return df.localCheckpoint(eager=eager)


def pin_frame_lazy(df: DataFrame) -> DataFrame:
    """``pin_frame(df, eager=False)`` in ``DataFrame.transform`` position."""
    return pin_frame(df, eager=False)


def pin_loop(df: DataFrame) -> DataFrame:
    """Iterative lineage-bounding pin: ALWAYS an eager localCheckpoint.

    For pins INSIDE an iteration (label propagation rounds, BPE merge
    rounds, BFS frontiers) the point is to TRUNCATE lineage each round
    so the logical plan stays bounded; ``persist`` keeps lineage and
    the plan grows geometrically per round, defeating the purpose.  So
    this class ignores ``SPARK_GRAFT_PIN_MODE`` by policy (see module
    docstring) — fault tolerance for iterative jobs comes from
    re-running the loop, not from recomputing a round mid-flight.
    """
    return df.localCheckpoint(eager=True)
