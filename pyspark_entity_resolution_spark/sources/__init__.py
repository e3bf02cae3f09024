"""Sources & sinks: AMiner tagged-text codec, Parquet/CSV IO."""
