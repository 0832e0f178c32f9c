"""Per-session memo for UDF-group registration (guide §4.5 applied to
the registration path itself).

Every ``register_*_functions(spark)`` loops ``spark.udf.register`` over
its function dict; each registration is a driver py4j round trip, so a
group of a few dozen pandas UDFs costs ~0.1-0.4 s. The operator modules
call their ``_ensure_udfs`` on EVERY query invocation (that is correct:
a vanilla caller-supplied session needs them), which re-paid that cost
per query per run even though registration is session-level state that
never changes after the first call.

``once_per_session`` memoizes "this group is registered" ON THE SESSION
OBJECT (``spark.__dict__``), so:

- the first call on any session registers normally;
- repeat calls on the same session return immediately;
- a NEW session (vanilla test sessions, a fresh driver harness) gets a
  fresh memo and registers from scratch — nothing is cached across
  sessions or processes;
- the memo is recorded only after the wrapped call SUCCEEDS, so a
  failed registration retries on the next call.

This memoizes registration side effects, never data or results.
"""

from __future__ import annotations

import functools

_ATTR = "_graft_registered_udf_groups"


def once_per_session(fn):
    """Decorator for ``register_X_functions(spark)``: run the body once
    per SparkSession object, then no-op for that session."""
    key = f"{fn.__module__}.{fn.__qualname__}"

    @functools.wraps(fn)
    def wrapper(spark, *args, **kwargs):
        groups = spark.__dict__.setdefault(_ATTR, set())
        if key in groups:
            return None
        out = fn(spark, *args, **kwargs)
        groups.add(key)
        return out

    return wrapper
