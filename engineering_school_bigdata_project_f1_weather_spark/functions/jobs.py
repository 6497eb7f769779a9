"""Driver-side overlap of independent Spark jobs (guide §2.6).

Spark's scheduler happily runs several jobs at once inside one
application; the composed index entries (curation, ER) were only
sequential because their driver code called each sub-index's actions
sequentially — at local bench scale that serialism is 6-8 legs × job
latency, and on a cluster it leaves executors idle through every leg's
task tail.  Submitting independent legs from a small thread pool lets
the next leg's tasks back-fill executors freed by the current leg's
stragglers, with FIFO scheduling giving exactly the back-fill behaviour
the guide describes.

Only INDEPENDENT legs may overlap: callers keep every ordering the
commit/retry contracts need (e.g. a pair delta that must read a
sub-index's COMMITTED state runs inside the same thunk, after that
sub-index's update).  Each sub-index self-commits into its own
directory, so concurrent legs never race on files; the caller's
top-level snapshot commit stays strictly after every leg.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

# 2-3 jobs in flight is plenty (guide §2.6): enough to fill each leg's
# task tail, not so many that they fight for executors.
MAX_OVERLAP = 3


def run_overlapped(*thunks):
    """Run independent driver thunks — each submitting its own Spark
    jobs — concurrently; return their results in call order.  The first
    failure re-raises in the caller (remaining legs run to completion
    inside the pool's shutdown join, keeping the session's job state
    coherent).  A single thunk runs inline: no pool, no thread."""
    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=min(MAX_OVERLAP, len(thunks))) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]
