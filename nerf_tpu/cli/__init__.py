"""Command-line entry points (the framework's client layer)."""
