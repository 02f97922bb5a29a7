"""Image and checkpoint IO."""
