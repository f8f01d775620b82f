"""Offline tooling: dataset conversion, flow visualization, log parsing."""
