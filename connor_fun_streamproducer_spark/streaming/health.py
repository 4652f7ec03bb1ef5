"""Stream health monitoring & restart policy.

The reference *wanted* this: its monitor loop prints per-region counts and
contains a stub — "Stop current channel, restart stream" on a zero-count
window (/root/reference/regionSpout.go:113-115, empty body), plus
StallWarnings requested from the source but silently dropped by the
late-installed demux handler (regionSpout.go:135,144-147).

Engine form, made real:

- ``StreamHealthMonitor`` — a StreamingQueryListener that records
  per-trigger input rates (the 30 s printout, structured) and flags a
  stall after N consecutive zero-input triggers.
- ``restart_query`` — the restart policy: stop the stalled query and
  relaunch it from its checkpoint; Structured Streaming replays from the
  WAL, upgrading the reference's at-most-once fire-and-forget to
  at-least-once.
"""

from __future__ import annotations

import threading
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener
from pyspark.sql.streaming.listener import QueryProgressEvent


@dataclass
class HealthState:
    progress_count: int = 0
    consecutive_zero: int = 0
    stalled: bool = False
    total_rows: int = 0
    last_batch_rows: dict = field(default_factory=dict)


class StreamHealthMonitor(StreamingQueryListener):
    """Flag queries whose input has been zero for ``stall_after`` triggers.

    The callback fires once per transition into the stalled state — the
    hook where a supervisor calls restart_query (regionSpout.go:113-115's
    intended behavior).
    """

    def __init__(self, stall_after: int = 3, on_stall: Callable[[str], None] | None = None):
        self.stall_after = stall_after
        self.on_stall = on_stall
        self._lock = threading.Lock()
        self.state: dict[str, HealthState] = {}

    def onQueryStarted(self, event) -> None:
        with self._lock:
            self.state.setdefault(str(event.id), HealthState())

    def onQueryProgress(self, event: QueryProgressEvent) -> None:
        p = event.progress
        qid = str(p.id)
        with self._lock:
            st = self.state.setdefault(qid, HealthState())
            st.progress_count += 1
            rows = int(p.numInputRows or 0)
            st.total_rows += rows
            st.last_batch_rows[p.batchId] = rows
            if rows == 0:
                st.consecutive_zero += 1
                if st.consecutive_zero >= self.stall_after and not st.stalled:
                    st.stalled = True
                    if self.on_stall is not None:
                        self.on_stall(qid)
            else:
                st.consecutive_zero = 0
                st.stalled = False

    def onQueryTerminated(self, event) -> None:  # noqa: D102 — required override
        pass

    def onQueryIdle(self, event) -> None:
        """Since Spark 3.4 an idle source emits idle events instead of
        zero-row progress — both mean "no input", the reference's stall
        condition, so both advance the stall counter."""
        qid = str(event.id)
        with self._lock:
            st = self.state.setdefault(qid, HealthState())
            st.consecutive_zero += 1
            if st.consecutive_zero >= self.stall_after and not st.stalled:
                st.stalled = True
                if self.on_stall is not None:
                    self.on_stall(qid)


def restart_query(query, start_fn: Callable[[], "object"]):
    """Stop a (stalled) query and relaunch via its checkpointed start_fn.

    ``start_fn`` must recreate the query with the same checkpointLocation;
    Spark resumes from the committed offsets — the real version of the
    reference's empty restart stub.
    """
    query.stop()
    query.awaitTermination()
    return start_fn()
