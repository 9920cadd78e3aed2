"""Round-11 tests: the concurrency-safe fixture guard (ADVICE r10) and
round-11 operator additions."""

from __future__ import annotations

import os
import threading
import time

import pytest


def test_fixture_once_builds_once_under_race(tmp_path):
    """N racing threads, one stale fixture: exactly ONE build runs, all
    callers return only after the marker is published, and the marker
    carries the stamp."""
    from dbkit_spark.queries._fixtures import MARKER, fixture_once

    path = str(tmp_path / "fx")
    builds = []

    def build():
        builds.append(threading.get_ident())
        time.sleep(0.3)  # widen the window a racer would interleave into
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "data"), "w") as fh:
            fh.write("payload")

    results = []

    def call():
        results.append(fixture_once(path, "s1", build))

    threads = [threading.Thread(target=call) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(builds) == 1
    assert results == [path] * 8
    with open(os.path.join(path, MARKER)) as fh:
        assert fh.read() == "s1"
    # fresh fast path: no rebuild
    fixture_once(path, "s1", build)
    assert len(builds) == 1
    # stamp change (regenerated testdata): rebuild exactly once more
    fixture_once(path, "s2", build)
    assert len(builds) == 2


def test_fixture_once_crash_leaves_no_fresh_marker(tmp_path):
    """A builder that dies mid-build must leave the fixture
    unambiguously incomplete: the stale marker is deleted BEFORE the
    build and the new one written only after it returns — a crash can
    never produce a fresh-looking half-written fixture. The lock left
    behind by the dead builder is broken by the next caller once its
    mtime exceeds the timeout."""
    from dbkit_spark.queries._fixtures import MARKER, fixture_once

    path = str(tmp_path / "fx")
    os.makedirs(path)
    with open(os.path.join(path, MARKER), "w") as fh:
        fh.write("old")

    with pytest.raises(RuntimeError, match="boom"):
        fixture_once(path, "new", lambda: (_ for _ in ()).throw(RuntimeError("boom")))
    assert not os.path.exists(os.path.join(path, MARKER))

    # abandoned-lock recovery: a stale lock (owner died) is broken
    with open(path + ".lock", "w") as fh:
        fh.write("999999")
    old = time.time() - 9999
    os.utime(path + ".lock", (old, old))
    done = []
    fixture_once(path, "new", lambda: done.append(1), timeout=1.0)
    assert done == [1]
    assert not os.path.exists(path + ".lock")
