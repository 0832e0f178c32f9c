"""Driver row for the Count-Min Sketch (VERDICT r6 item 1).

``sketches.py`` holds the DataFrame-native CMS (xxhash64+pmod bucket
rows, partially aggregated); this module registers the oracle-gated
query. The oracle is the EXACT per-key count: with the default 4×1024
geometry and the events table's low-cardinality ``event_type`` key, no
key pair collides in all four seed rows (xxhash64 is deterministic, so
this is a fixed property of the key set, not a probabilistic one — it
holds at every SF because the key set is the same), making the CMS
min-over-seeds estimate exactly the true count.

The query also exercises ``cms_merge``: the sketch is built as the
MERGE of two half-sketches (even/odd user_id) rather than one pass —
merge is a grouped sum, so a wrong merge (dropped rows, double unions)
shifts every estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

_Q135_ORACLE = """
    SELECT event_type AS item, CAST(count(*) AS BIGINT) AS est
    FROM events
    GROUP BY event_type
"""


@query("q135_cms_heavy_hitters", oracle=_Q135_ORACLE)
def q135_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS build → merge → estimate, oracle-exact at low cardinality:
    two half-sketches over even/odd user_id rows are merged (grouped
    sum) and probed for every distinct event_type; shuffle volume is
    bounded by depth·width per partition regardless of event count
    (sketches.py module docstring)."""
    from .sketches import cms_build, cms_estimate, cms_merge

    e = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    sk_even = cms_build(e.filter(F.col("user_id") % 2 == 0), "event_type")
    sk_odd = cms_build(e.filter(F.col("user_id") % 2 != 0), "event_type")
    sketch = cms_merge(sk_even, sk_odd)
    items = e.select("event_type").distinct()
    return cms_estimate(sketch, items, "event_type")
