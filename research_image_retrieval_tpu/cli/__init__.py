"""Command-line entry points: train, evaluate, search."""
