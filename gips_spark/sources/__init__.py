"""Sources & sinks: deterministic fixture synthesis + catalog IO."""
