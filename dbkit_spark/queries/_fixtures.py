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

Stale-lock breaking and release are identity-safe (ADVICE r11): the
owner writes a unique token (pid + monotonic nonce) into the lock at
creation and, on release, unlinks only after verifying the lock still
holds ITS token — a lock wrongly broken out from under a live owner is
never collaterally removed a second time. Breaking is by atomic
``os.rename`` to a breaker-unique name, so of two waiters that both
observe the same abandoned lock exactly ONE wins the rename (the loser
gets ENOENT and re-loops); the winner then re-stats the renamed file
and, if it turns out it stole a FRESH lock (the owner replaced the
abandoned one in the observe→rename window), restores it via
``os.link`` (refuses to clobber a newer lock) before re-waiting.

Residuals (documented, accepted): (1) a session that CACHED the fixture
path earlier and lazily re-scans it while another session rebuilds can
still observe the overwrite — that requires the backing testdata to be
regenerated mid-flight, which invalidates every derived artifact anyway;
(2) any timeout-based breaker can, by definition, break a LIVE owner
that stalls past ``timeout`` (600 s vs sub-minute builds) — the
identity-checked unlink confines the damage to a possible duplicate
build, never to removing a third session's lock.
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
    token = f"{os.getpid()}.{time.monotonic_ns()}"
    deadline = time.monotonic() + timeout

    def break_stale() -> None:
        """Atomically steal an apparently-abandoned lock; restore it if
        the steal turns out to have grabbed a FRESH replacement."""
        grabbed = f"{lock}.breaking.{token}"
        try:
            os.rename(lock, grabbed)  # atomic: exactly one breaker wins
        except OSError:
            return  # lost the race (or lock vanished) — re-loop
        try:
            still_stale = (time.time() - os.path.getmtime(grabbed)) > timeout
        except OSError:
            still_stale = True
        if not still_stale:
            # We stole a live owner's fresh lock (replaced in our
            # observe→rename window). Put it back without clobbering any
            # newer lock: link() fails on an existing target.
            try:
                os.link(grabbed, lock)
            except OSError:
                pass  # a newer lock exists; the live owner's unlink is
                # identity-checked, so nothing else gets removed
        try:
            os.unlink(grabbed)
        except OSError:
            pass

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
                break_stale()  # abandoned (owner died mid-build)
                continue
            if time.monotonic() > deadline:
                raise TimeoutError(f"fixture lock never cleared: {lock}")
            time.sleep(0.2)
            if fresh():
                return path
            continue
        try:
            os.write(fd, token.encode())
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
            # release only a lock we still own (identity check): a
            # breaker that wrongly stole ours must not trick us into
            # removing a THIRD session's lock at the same path
            try:
                with open(lock) as fh:
                    if fh.read() == token:
                        os.unlink(lock)
            except OSError:
                pass
