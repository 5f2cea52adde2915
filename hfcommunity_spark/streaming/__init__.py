"""Structured Streaming layer (SURVEY §2.10 X1-X7) over the events
table.  The reference is strictly batch (monthly watermark
incrementality, databaseImport.py:858-868); this layer is the
north-star extension: event-time watermarks, windowed/session
aggregation, stateful dedup, stream-static enrichment."""
