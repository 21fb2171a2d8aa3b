"""Driver checkpoint — the `.s2s` Specifier + write-mode analog.

A small JSON file recording, per run: the pinned input snapshot id,
which pipeline steps committed, and which (source, salt) series chunks
finished encoding. Saved with write-tmp-then-``os.replace`` (atomic)
and ALWAYS after the corresponding data commit (write-ahead ordering,
SURVEY.md §3.2) — so a crash between data commit and checkpoint save
re-runs an idempotent step, never skips one.

Reference analog: `Specifier.write` → `.s2s` pickle plus the
skip-existing / overwrite output checks [U: specification.py ::
Specifier.write; scripts/s2srun write-mode flags].
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class Checkpoint:
    #: pinned IcebergLite snapshot id of the input table (0 = raw parquet)
    input_snapshot: int = 0
    #: committed pipeline steps, e.g. "tier:60", "series", "encode"
    steps_done: list[str] = field(default_factory=list)
    #: finished (source, salt) encode chunks
    chunks_done: list[list] = field(default_factory=list)
    #: monotonically increasing attempt counter (lineage run id)
    attempt: int = 0
    #: nsalt resolved on the first encode run (0 = not yet resolved).
    #: Pinned so a resume with changed input or cfg.nsalt=0 (auto) keeps
    #: the (source, salt) chunk identities of already-committed chunks.
    nsalt: int = 0
    #: in-flight append-cycle pins: {"bases": {table: snapshot_id},
    #: "pending": [input files]} — established once per append cycle;
    #: every incremental table update is a deterministic function of
    #: these immutable pins, so replay after a crash at ANY step
    #: re-commits identical content. Cleared when the cycle completes.
    cycle: dict | None = None

    def step_done(self, step: str) -> bool:
        return step in self.steps_done

    def mark_step(self, step: str) -> None:
        if step not in self.steps_done:
            self.steps_done.append(step)

    def chunk_set(self) -> set[tuple[str, int]]:
        return {(s, int(x)) for s, x in self.chunks_done}

    def mark_chunks(self, chunks: list[tuple[str, int]]) -> None:
        seen = self.chunk_set()
        for s, x in chunks:
            if (s, int(x)) not in seen:
                self.chunks_done.append([s, int(x)])

    # -- persistence -----------------------------------------------------
    @classmethod
    def load(cls, path: str) -> "Checkpoint":
        if not os.path.exists(path):
            return cls()
        with open(path) as f:
            return cls(**json.load(f))

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(self), f)
        os.replace(tmp, path)
