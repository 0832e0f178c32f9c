"""Session-scoped tracking for persisted intermediates.

Some operators persist a shared intermediate (e.g. the shingle set in
``dedup.jaccard_pairs``) because several branches of the returned lazy
plan consume it. The persist cannot be released inside the operator —
the cache is only useful once the *caller* materializes the returned
DataFrame — so Spark's ``CacheManager`` would otherwise hold every such
intermediate for the whole session (VERDICT r3 #3 / ADVICE r3: a
memory-pressure leak in multi-query driver runs, not a correctness one).

``tracked_persist`` registers the DataFrame; ``release_tracked`` drops
every registration. The query registry calls ``release_tracked`` on
entry to each registered query, so at most one query's intermediates are
ever live; ``bench.py`` additionally clears between timed runs. At
100 TB the same intermediates become materialized tables with explicit
lifecycle (see SCALE.md) — tracking is the single-session analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK by default) and register it for
    release at the next registered-query entry / explicit release."""
    out = df.persist() if storage_level is None else df.persist(storage_level)
    _TRACKED.append(out)
    return out


def release_tracked() -> int:
    """Unpersist every tracked DataFrame; returns how many were released.

    Safe to call at any time: unpersisting only drops cached blocks — any
    still-lazy plan that referenced the cache simply recomputes.
    """
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            # session already stopped — nothing left to release
            pass
    return n
