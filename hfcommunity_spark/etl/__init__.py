"""The reference's ETL (extractor/databaseImport.py) re-expressed as
set-oriented Spark transforms: normalize (pure column logic), fetch
(source adapters), incremental (watermark semantics)."""
