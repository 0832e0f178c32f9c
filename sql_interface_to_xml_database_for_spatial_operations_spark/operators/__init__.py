"""Operator implementations backing ``__spark_entry__.queries()``.

Each module registers named queries (Spark callable + DuckDB oracle SQL)
into :mod:`.registry`, covering SURVEY.md §2's inventory plus the
LLM-data-pipeline extensions (dedup, similarity, text, multimodal).
"""

from . import registry  # noqa: F401


def load_all() -> None:
    """Import every query-defining module (registration side effects)."""
    from . import relational  # noqa: F401
    from . import spatial_ops  # noqa: F401
    from . import text_ops  # noqa: F401
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
    from . import events_ops  # noqa: F401
    from . import temporal  # noqa: F401
    from . import pipeline  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import ingest  # noqa: F401
    from . import relations_ops  # noqa: F401
    from . import streaming_ops  # noqa: F401
    from . import union_agg  # noqa: F401
    from . import text_extract  # noqa: F401
    from . import geo_fn_ops  # noqa: F401
    from . import media_ops  # noqa: F401
    from . import rollup_ops  # noqa: F401
    from . import sketch_ops  # noqa: F401
    from . import overlay_ops  # noqa: F401
    from . import codec_ops  # noqa: F401
    from . import boilerplate  # noqa: F401
    from . import cluster_ops  # noqa: F401
    from . import filter_ops  # noqa: F401
    from . import index_ops  # noqa: F401
    from . import affine_ops  # noqa: F401
    from . import linework_ops  # noqa: F401
    from . import accessor_ops  # noqa: F401
    from . import linearref_ops  # noqa: F401
    from . import editor_ops  # noqa: F401
    from . import constructor_ops  # noqa: F401
    from . import buffer_ops  # noqa: F401
    from . import relate_ops  # noqa: F401
    from . import measure_ops  # noqa: F401
    from . import bounding_ops  # noqa: F401
    from . import cluster_dbscan  # noqa: F401
    from . import collect_ops  # noqa: F401
    from . import subdivide_ops  # noqa: F401
    from . import jpeg_ops  # noqa: F401
    from . import noding_ops  # noqa: F401
    from . import tessellate_ops  # noqa: F401
    from . import split_ops  # noqa: F401
    from . import video_ops  # noqa: F401
    from . import grid_ops  # noqa: F401
    from . import lm_ops  # noqa: F401
    from . import tokenize_ops  # noqa: F401
    from . import y4m_ops  # noqa: F401
    from . import zcoord_ops  # noqa: F401
    from . import mvt_tile_ops  # noqa: F401
    from . import bpe_train_ops  # noqa: F401
    from . import surface3d_ops  # noqa: F401
    from . import substr_dedup_ops  # noqa: F401
    from . import editors_x_ops  # noqa: F401
    from . import fuzzy_ops  # noqa: F401
    from . import shapefile_ops  # noqa: F401
    from . import gpx_ops  # noqa: F401
    from . import spatial_store_ops  # noqa: F401
    from . import inspect_ops  # noqa: F401
