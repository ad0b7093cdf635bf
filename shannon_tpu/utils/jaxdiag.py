"""Compile-shape-churn diagnostics.

The axon runtime pays ~tens of seconds of per-program bring-up per
process even with a warm persistent compile cache, so the number of
DISTINCT compiled programs a pipeline touches is a first-class cold
-start metric (SCALE_r03: 49 programs -> 13x cold/steady ratio at 1M
reads).  This counter rides the jax._src.compiler debug log, which
emits one 'PERSISTENT COMPILATION CACHE HIT/MISS ... key <key>' line
per program per process.
"""
from __future__ import annotations

import logging


class ProgramCounter(logging.Handler):
    """Counts distinct compiled programs via persistent-cache key log
    lines.  Attach early (before any jit call) via count_programs()."""

    def __init__(self) -> None:
        super().__init__(level=logging.DEBUG)
        self.keys: set[str] = set()

    def emit(self, record: logging.LogRecord) -> None:
        msg = record.getMessage()
        if "PERSISTENT COMPILATION CACHE" in msg:
            self.keys.add(msg.rsplit("'", 2)[-2])


def count_programs() -> ProgramCounter:
    """Attach a ProgramCounter to the jax compiler logger and return
    it; read `.keys` after the workload to get the distinct count."""
    counter = ProgramCounter()
    lg = logging.getLogger("jax._src.compiler")
    lg.addHandler(counter)
    if lg.level == logging.NOTSET or lg.level > logging.DEBUG:
        lg.setLevel(logging.DEBUG)
    return counter
