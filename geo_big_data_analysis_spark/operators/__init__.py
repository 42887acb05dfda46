"""Engine operators beyond plain DataFrame calls.

Each module is a thin, tested, scale-aware composition of DataFrame
primitives; custom physical strategies (grid spatial join, LSH dedup,
iterative label propagation) live here.
"""
