"""File-based source adapters for the ETL feeds (SURVEY §2.1 S1-S3 at
scale: read the Hub listing as JSONL dumps instead of paging the live
API; same schema, partition-parallel scan)."""
