"""Wall-clock metering of session-fixture builds (VERDICT r13 item 1).

bench.py reports best-of-RUNS per query, so a session fixture's
one-time build — paid inside run 1 of whichever query touches it
first — appears in NO reported number. Every `cached_*` builder wraps
its cold-build branch in `metered_build(name, sf_dir)`; bench.py
drains the log after the timing loop and emits one `fixture:<name>`
row per build into the reported `queries` map (and the headline
total), so one-time work is line-itemed instead of hidden.

The meter records CUMULATIVE seconds per (name, sf_dir): a fixture
evicted on an sf_dir switch and rebuilt later charges both builds.
This is measurement plumbing only — no query semantics pass through
here.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

# (fixture name, sf_dir) -> cumulative build seconds in this process.
BUILD_SECONDS: dict[tuple[str, str], float] = {}

# Alias so builder modules need no separate `time` import.
build_t0 = time.perf_counter


@contextmanager
def metered_build(name: str, sf_dir: str):
    """Time a fixture's cold-build branch; accumulate into the log."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        record_build(name, sf_dir, t0)


def record_build(name: str, sf_dir: str, t0: float) -> None:
    """Accumulate `perf_counter() - t0` against (name, sf_dir).

    Builders with dependency fixtures call THEIR builders before
    taking t0, so nested builds are charged once, to their own name.
    """
    key = (name, sf_dir)
    BUILD_SECONDS[key] = BUILD_SECONDS.get(key, 0.0) + (
        time.perf_counter() - t0
    )


def builds_for(sf_dir: str) -> dict[str, float]:
    """All fixture builds recorded against `sf_dir`, by fixture name."""
    return {
        name: secs for (name, fdir), secs in BUILD_SECONDS.items() if fdir == sf_dir
    }
