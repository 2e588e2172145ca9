"""Sources & sinks: synthetic pages generator, parquet/lakehouse IO,
multimodal binary-column plumbing."""
