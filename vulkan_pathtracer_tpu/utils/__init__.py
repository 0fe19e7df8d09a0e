"""Host utilities: CLI, config, timing, stats, image IO."""
