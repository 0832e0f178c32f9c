"""PySpark-native spatial SQL analytics engine.

Re-implements, Spark-first, the query surface of the reference mediator
``bintangpananjung/SQL-interface-to-XML-database-for-spatial-operations``
(see SURVEY.md): SQL over document-shaped data with PostGIS-style spatial
functions, nested-data flattening, joins, aggregation and GeoJSON output —
plus LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) and Structured Streaming, all designed for 100 TB scale.

Short alias: ``import sql_interface_to_xml_database_for_spatial_operations_spark as sx``
"""

from .session import get_spark
from .sources.tables import TABLES, load_tables, register_views
from .functions.spatial import register_spatial_functions
from .functions.bpe import register_bpe_functions

__all__ = [
    "get_spark",
    "TABLES",
    "load_tables",
    "register_views",
    "register_spatial_functions",
    "register_bpe_functions",
]

__version__ = "0.1.0"
