"""Utilities: .mat output contract, checkpointing, profiling, plotting."""
