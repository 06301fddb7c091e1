"""Misc utilities: synthetic worlds, profiling, timers."""
