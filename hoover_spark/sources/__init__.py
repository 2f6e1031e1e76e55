"""Sources & sinks: repos table generator, edge extraction, fixtures, IO."""
