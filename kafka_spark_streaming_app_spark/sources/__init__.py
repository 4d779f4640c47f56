"""Sources: batch parquet tables, streaming file/rate sources, Kafka."""
