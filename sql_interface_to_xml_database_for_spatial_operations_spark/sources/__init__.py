"""Sources & sinks: parquet fixture tables, GeoJSON, XML (GML/KML), GeoJSON
FeatureCollection output. Mirrors SURVEY.md §2.1 (S1-S11) Spark-first."""
