"""Diagnostics: visualization, profiling, logging."""
