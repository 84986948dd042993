"""Demonstration applications built on the engine (spectral methods)."""
