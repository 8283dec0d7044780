"""Sample generation, metrics and evaluation artifacts."""
