"""Shared utilities: units, dates, run naming, logging, plotting."""
