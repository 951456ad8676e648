"""Sources: Parquet table readers and the synthetic tokenized-sequence corpus."""
