"""Concurrency-safe write-once fixture guard (ADVICE r10).

Several catalog queries materialize a derived table under a shared tmp
path exactly once per (sf_dir, testdata generation): bucketed copies,
bloom-indexed copies, schema-evolution histories, range-file layouts,
persisted LSH indexes. The original pattern — check an mtime-stamped
marker, rewrite if stale, write the marker last — was check-then-write
with no mutual exclusion: two parallel sessions that both observed a
stale marker could interleave a rewrite, and a third could read a
half-written overwrite.

:func:`fixture_once` closes the race with an ``O_CREAT|O_EXCL`` lock
file around the build:

- fast path (no syscall beyond one read): marker content equals the
  stamp → the fixture is complete and current, return immediately.
  Completeness is implied because the marker is written (atomically,
  via ``os.replace`` of a temp file) only AFTER the build returns.
- slow path: take ``<path>.lock`` with O_EXCL. The winner re-checks
  freshness (the previous holder may have finished the same build),
  deletes the stale marker BEFORE rebuilding (a crash mid-build leaves
  an unambiguously-incomplete fixture, never a fresh-looking one),
  builds, then atomically publishes the marker. Losers poll the lock at
  200 ms, returning as soon as the marker goes fresh; a lock whose
  mtime is older than ``timeout`` is presumed abandoned (owner killed)
  and broken.

Residual (documented, accepted): a session that CACHED the fixture path
earlier and lazily re-scans it while another session rebuilds can still
observe the overwrite — that requires the backing testdata to be
regenerated mid-flight, which invalidates every derived artifact anyway.
"""

from __future__ import annotations

import os
import time
from typing import Callable

MARKER = "_dbkit_fixture_done"


def source_stamp(sf_dir: str, table: str) -> str:
    """The invalidation stamp: mtime of the driver-generated source
    file, so a regenerated /root/testdata rebuilds the fixture instead
    of silently serving stale rows (the q144 fixture discipline)."""
    return str(os.path.getmtime(os.path.join(sf_dir, f"{table}.parquet")))


def fixture_once(
    path: str,
    stamp: str,
    build: Callable[[], None],
    timeout: float = 600.0,
) -> str:
    """Run ``build()`` at most once per (path, stamp) across concurrent
    sessions; return ``path`` once the fixture is complete and current.

    ``build`` must (re)create the fixture's data under/at ``path`` (the
    marker directory is created here if the builder did not)."""
    done = os.path.join(path, MARKER)

    def fresh() -> bool:
        try:
            with open(done) as fh:
                return fh.read() == stamp
        except OSError:
            return False

    if fresh():
        return path

    lock = path + ".lock"
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            # another session holds the build; wait for its marker
            try:
                stale = (time.time() - os.path.getmtime(lock)) > timeout
            except OSError:
                continue  # lock vanished between open and stat: retry
            if stale:
                try:
                    os.unlink(lock)  # abandoned (owner died mid-build)
                except OSError:
                    pass
                continue
            if time.monotonic() > deadline:
                raise TimeoutError(f"fixture lock never cleared: {lock}")
            time.sleep(0.2)
            if fresh():
                return path
            continue
        try:
            os.write(fd, f"{os.getpid()}".encode())
        finally:
            os.close(fd)
        try:
            if not fresh():  # the prior holder may have built this stamp
                try:
                    os.unlink(done)
                except OSError:
                    pass
                build()
                os.makedirs(path, exist_ok=True)
                tmp = done + f".tmp.{os.getpid()}"
                with open(tmp, "w") as fh:
                    fh.write(stamp)
                os.replace(tmp, done)
            return path
        finally:
            try:
                os.unlink(lock)
            except OSError:
                pass
