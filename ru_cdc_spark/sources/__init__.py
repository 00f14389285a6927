"""Sources: parquet/json table readers and the deterministic CDC
change-stream derivation used for correctness tests."""
