"""Structured Streaming ingest variant of the KG pipeline."""
