"""Sources: synthetic corpus generation + parquet readers."""
