"""Command-line entry points mirroring the reference ``scripts/`` (SURVEY.md
§2.3), with dataclass presets instead of comment-toggled literals."""
